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


def test_pure_dp_single_gradient_allreduce_per_step():
    """The DDP no_sync analogue (ref train.py:266-277): under pure data
    parallelism, gradient-sized collectives must sit OUTSIDE the grad-accum
    scan's while body — one all-reduce (or reduce-scatter) family per
    optimizer step, never per micro-batch.  Parses the compiled HLO with the
    same helper the driver's dryrun uses, so a regression fails in both."""
    from __graft_entry__ import _parse_hlo_collectives
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
    comps, while_bodies = _parse_hlo_collectives(hlo)
    big = 1024  # elements; metric scalars are exempt
    in_loop = [c for b in while_bodies for c in comps.get(b, []) if c[1] > big]
    assert not in_loop, in_loop
    outside = [c for name, cs in comps.items() if name not in while_bodies
               for c in cs if c[1] > big]
    assert outside


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
