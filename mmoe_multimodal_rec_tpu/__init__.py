"""mmoe_multimodal_rec_tpu — TPU-native multimodal MMoE recommendation framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
`JingxiangQU/mmoe-multimodal-rec` (reference mounted at /root/reference):

- feature engineering (causal per-user features, time-split, negative sampling,
  image patchification, WebDataset-compatible tar shards)        -> `data/`
- six-expert multimodal MMoE (LoRA BGE text experts with sentence-level
  chunk packing, ViT image expert operating natively on patch rows,
  sentence cross-attention + cross-modal fusion experts, dense-gated
  two-task head) and the HoME hierarchical-expert variant          -> `models/`
- Pallas TPU kernels for the hot attention paths                  -> `ops/`
- SPMD data/tensor parallelism over a `jax.sharding.Mesh` (ICI
  collectives instead of the reference's NCCL DDP)                -> `parallel/`
- jit train/eval steps with `lax.scan` gradient accumulation,
  freeze->warmup LoRA schedules, orbax checkpoint/RESUME          -> `train/`
- streaming AUC eval + BatchNorm recalibration                    -> `eval/`
"""

__version__ = "0.1.0"
