"""Mesh + sharding rule tests on the 8-virtual-device CPU backend."""
import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from mmoe_multimodal_rec_tpu.config import MeshConfig, tiny_config
from mmoe_multimodal_rec_tpu.parallel.mesh import (batch_shardings, make_mesh,
                                                   param_shardings)


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    mesh = make_mesh(MeshConfig())  # all devices on data
    assert mesh.devices.shape == (8, 1)
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data_parallel=5, model_parallel=2))


def test_param_sharding_rules():
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    params = {
        ("user_expert", "encoder", "layer_0", "attention", "query", "base",
         "kernel"): np.zeros((8, 8)),
        ("user_expert", "encoder", "layer_0", "attention", "out",
         "kernel"): np.zeros((8, 8)),
        ("user_expert", "encoder", "layer_0", "mlp", "fc1",
         "kernel"): np.zeros((8, 16)),
        ("user_expert", "encoder", "layer_0", "mlp", "fc2",
         "kernel"): np.zeros((16, 8)),
        ("user_expert", "encoder", "layer_0", "mlp", "fc1",
         "bias"): np.zeros((16,)),
        ("head", "tower_good", "fc1", "kernel"): np.zeros((8, 4)),
        ("user_expert", "encoder", "word_embeddings",
         "embedding"): np.zeros((32, 8)),
    }
    sh = param_shardings(params, mesh)

    def spec(key):
        return sh[key].spec

    assert spec(("user_expert", "encoder", "layer_0", "attention", "query",
                 "base", "kernel")) == P(None, "model")    # column parallel
    # row parallel; trailing Nones are normalized away (cache-key hygiene,
    # parallel/mesh._normalize_spec)
    assert spec(("user_expert", "encoder", "layer_0", "attention", "out",
                 "kernel")) == P("model")
    assert spec(("user_expert", "encoder", "layer_0", "mlp", "fc1",
                 "kernel")) == P(None, "model")
    assert spec(("user_expert", "encoder", "layer_0", "mlp", "fc2",
                 "kernel")) == P("model")
    assert spec(("user_expert", "encoder", "layer_0", "mlp", "fc1",
                 "bias")) == P("model")
    assert spec(("head", "tower_good", "fc1", "kernel")) == P()  # replicated
    assert spec(("user_expert", "encoder", "word_embeddings",
                 "embedding")) == P()


def test_batch_shardings_accum_layout():
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    batch = {"user_tokens": np.zeros((2, 16, 8), np.int32),
             "label_good": np.zeros((2, 8), np.float32)}
    sh = batch_shardings(batch, mesh, accum_dim=True)
    assert sh["user_tokens"].spec == P(None, "data", None)
    assert sh["label_good"].spec == P(None, "data")


def test_hlo_collective_parser():
    """Unit-pin the dryrun's HLO parser on every format XLA emits (the
    round-3 parser silently misparsed two of these: tuple-parameter
    computation headers and combined tuple-shaped all-reduces)."""
    from __graft_entry__ import _parse_hlo_collectives

    hlo = "\n".join([
        "HloModule jit_train_step",
        "",
        "%region_1.1_spmd (arg_tuple.1: (s32[], f32[4,8])) -> (s32[], "
        "f32[4,8]) {",
        "  %ar.1 = f32[4,8]{1,0} all-reduce(%x), channel_id=1, "
        "replica_groups=[4,2]<=[8], to_apply=%add",
        "  %ar.2 = (f32[16]{0}, f32[32,16]{1,0}) all-reduce(%a, %b), "
        "channel_id=2, replica_groups=[2,4]<=[4,2]T(1,0), to_apply=%add",
        "}",
        "",
        "ENTRY %main.9_spmd (param.1: f32[4,8]) -> f32[4,8] {",
        "  %w = (s32[], f32[4,8]) while(%tuple.1), condition=%cond, "
        "body=%region_1.1_spmd",
        "  %ar.3 = f32[2,2,32]{2,1,0} all-reduce(%y), channel_id=3, "
        "replica_groups={{0,1},{2,3},{4,5},{6,7}}, to_apply=%add",
        "  %ag.1 = f32[64,8]{1,0} all-gather(%z), channel_id=4, "
        "replica_groups=[1,8]<=[8], dimensions={1}",
        "}",
    ])
    comps, while_bodies = _parse_hlo_collectives(hlo)
    assert while_bodies == {"region_1.1_spmd"}
    # tuple-param computation header attributed correctly, tuple all-reduce
    # element count sums ALL shapes, iota group size = second dim
    assert comps["region_1.1_spmd"] == [("all-reduce", 32, 2),
                                        ("all-reduce", 16 + 512, 4)]
    assert comps["main.9_spmd"] == [("all-reduce", 128, 2),
                                    ("all-gather", 512, 8)]


def test_pure_dp_grad_collectives_combined_and_bounded():
    """The honest DDP no_sync analogue (ref train.py:266-277): under pure
    data parallelism each grad-accum iteration ends with ONE combined
    data-axis all-reduce of that micro's gradients (XLA reduces eagerly into
    the replicated scan carry; see docs/DESIGN.md "Gradient collectives
    under grad accumulation").  The gate bounds the per-iteration reduce
    volume to ~one gradient's worth and the instruction count to a handful
    of combined ops — the regressions that would actually hurt (duplicated
    reductions, per-param all-reduce explosion) fail it.  Uses the same
    helper the driver's dryrun uses, so a regression fails in both."""
    from __graft_entry__ import _assert_collective_structure
    from mmoe_multimodal_rec_tpu.train.loop import Trainer
    from util import stacked_batch

    cfg = tiny_config("baseline", batch_size=8, accum=2, data_parallel=8,
                      model_parallel=1)
    trainer = Trainer(cfg)
    batch = stacked_batch(cfg, seed=0)
    staged = jax.device_put(batch, trainer._batch_sharding)
    sub = jax.random.fold_in(trainer._dropout_rng, 0)
    hlo = trainer.train_step.lower(trainer.state, staged, sub) \
        .compile().as_text()
    n_trainable = sum(int(np.size(x))
                      for x in jax.tree.leaves(trainer.state.trainable))
    _assert_collective_structure(hlo, mp=1, n_trainable=n_trainable)


def test_tp_mesh_numerically_matches_dp_only():
    """Same tiny model, same batch: a 2x2 DPxTP mesh must produce the same
    loss as a 4x1 pure-DP mesh (XLA collectives are numerically exact here
    on fp32 CPU)."""
    from mmoe_multimodal_rec_tpu.train.loop import Trainer
    from util import stacked_batch

    cfg_dp = tiny_config("baseline", batch_size=4, data_parallel=4,
                         model_parallel=1)
    cfg_tp = tiny_config("baseline", batch_size=4, data_parallel=2,
                         model_parallel=2)
    batch = stacked_batch(cfg_dp, seed=0)

    t_dp = Trainer(cfg_dp)
    t_tp = Trainer(cfg_tp, init_rng=jax.random.PRNGKey(cfg_dp.train.seed))
    m_dp = t_dp.run_step(batch)
    m_tp = t_tp.run_step(batch)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m_dp["grad_norm"]),
                               float(m_tp["grad_norm"]), rtol=2e-4)
