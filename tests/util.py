"""Shared test helpers: tiny configs + synthetic packed batches."""
import numpy as np

from mmoe_multimodal_rec_tpu.config import Config
from mmoe_multimodal_rec_tpu.data.packer import TextPacker
from mmoe_multimodal_rec_tpu.data.sentence import split_sentences
from mmoe_multimodal_rec_tpu.data.synthetic import synthetic_raw_batch
from mmoe_multimodal_rec_tpu.data.wordpiece import HashTokenizer
from mmoe_multimodal_rec_tpu.data.loader import assemble_batch


def tiny_config(variant: str = "baseline", batch_size: int = 4,
                accum: int = 2) -> Config:
    cfg = Config()
    m = cfg.model
    m.variant = variant
    m.d = 32
    m.compute_dtype = "float32"
    m.use_flash_attention = False
    m.cross_heads = 4
    m.fuse_heads = 4
    m.tower_hidden = 16
    m.home_tower_hidden = 16
    m.home_expert_hidden = 24
    t = m.text
    t.vocab_size = 201          # 200 base + <SENT>
    t.hidden_size = 32
    t.num_layers = 2
    t.num_heads = 4
    t.intermediate_size = 64
    t.max_position_embeddings = 48
    t.lora_rank = 2
    i = m.image
    i.hidden_size = 32
    i.num_layers = 2
    i.num_heads = 4
    i.intermediate_size = 64
    i.num_patches = 196
    i.patch_dim = 768
    p = m.packer
    p.max_tok = 24
    p.max_chunks_per_sample = 2
    p.fixed_sent_count = 6
    tr = cfg.train
    tr.batch_size = batch_size
    tr.optim.grad_accum = accum
    tr.optim.freeze_steps = 2
    tr.optim.unfreeze_steps = 2
    tr.optim.home_freeze_steps = 2
    tr.optim.home_unfreeze_steps = 2
    tr.mesh.model_parallel = 1
    tr.mesh.data_parallel = 2
    return cfg


def tiny_tokenizer(cfg: Config) -> HashTokenizer:
    return HashTokenizer(vocab_size=cfg.model.text.vocab_size - 1)


def packed_batch(cfg: Config, seed: int = 0, batch_size: int = None):
    rng = np.random.default_rng(seed)
    b = batch_size or cfg.train.batch_size
    samples = synthetic_raw_batch(rng, b)
    packer = TextPacker(tiny_tokenizer(cfg), cfg.model.packer,
                        splitter=split_sentences)
    batch = assemble_batch(samples, packer)
    return batch


def stacked_batch(cfg: Config, seed: int = 0):
    from mmoe_multimodal_rec_tpu.train.loop import stack_micro_batches
    accum = cfg.train.optim.grad_accum
    micros = [packed_batch(cfg, seed=seed * 100 + i) for i in range(accum)]
    return stack_micro_batches(micros)
