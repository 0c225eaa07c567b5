"""Sharding tests: mesh placement, sharded-vs-single-device numerics, and
the M2 scaling path (per-device work divides with the mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sde_sampler_lrds_tpu.parallel import get_mesh, replicate, shard_batch
from sde_sampler_lrds_tpu.parallel.mesh import batch_sharding


def test_mesh_and_placement():
    mesh = get_mesh(8)
    assert mesh.devices.size == 8
    x = jnp.arange(64.0).reshape(64, 1)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data")
    p = replicate({"w": jnp.ones((3,))}, mesh)
    assert p["w"].sharding.spec == P()


def test_sharded_loss_matches_unsharded():
    """The sharded trajectory loss must equal the single-device value
    bit-for-comparable: same keys, same math, XLA inserts the psum."""
    from sde_sampler_lrds_tpu.losses import EIReferenceSDELoss
    from sde_sampler_lrds_tpu.sde import VP, get_timesteps

    sde = VP()
    mu = jnp.asarray([0.4, -0.2])
    var = jnp.asarray([0.7, 1.1])
    ref_ctrl = lambda t, x: sde.marginal_score(t, x, mu, var_init=var)
    ref_lp = lambda x: sde.marginal_log_prob(jnp.asarray(0.0), x, mu, var_init=var)
    loss = EIReferenceSDELoss(sde=sde, method="kl", reference_ctrl=ref_ctrl)
    ts = get_timesteps(0.0, 1.0, steps=8)
    ctrl = lambda t, x: 0.3 * jnp.tanh(x)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    loc, v = sde.marginal_params(ts[-1], mu, var_init=var)
    x0 = loc + jnp.sqrt(v) * jax.random.normal(k1, (64, 2))

    def run(x):
        _, rnd, _ = loss.simulate(k2, ts, x, ctrl, ref_lp, ref_lp)
        return rnd

    rnd_plain = jax.jit(run)(x0)
    mesh = get_mesh(8)
    x_sharded = jax.device_put(x0, batch_sharding(mesh))
    rnd_sharded = jax.jit(run)(x_sharded)
    np.testing.assert_allclose(np.asarray(rnd_plain), np.asarray(rnd_sharded),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_train_step_mesh_sizes():
    """The full train step runs on 1, 4 and 8-device meshes with identical
    configs (the dryrun_multichip contract)."""
    from sde_sampler_lrds_tpu.losses import EMReferenceSDELoss
    from sde_sampler_lrds_tpu.models import ClippedCtrl, FourierMLP
    from sde_sampler_lrds_tpu.sde import VP, get_timesteps
    from sde_sampler_lrds_tpu.solvers import RDS
    from sde_sampler_lrds_tpu.solvers.base import TrainConfig
    from sde_sampler_lrds_tpu.targets import Gauss, IsotropicGauss

    losses = {}
    for n_dev in (1, 4, 8):
        mesh = get_mesh(n_dev)
        target = Gauss(dim=2, loc=0.5, scale=1.2, n_reference_samples=1000)
        cfg = TrainConfig(train_steps=4, train_batch_size=32, eval_batch_size=64)
        solver = RDS(target, IsotropicGauss(dim=2), VP(),
                     ClippedCtrl(base_model=FourierMLP(dim=2, channels=16,
                                                       zero_init=True),
                                 clip_model=1e4),
                     EMReferenceSDELoss, {"method": "kl"},
                     train_ts=get_timesteps(0.0, 1.0, steps=4), cfg=cfg, mesh=mesh)
        solver.setup()
        m = solver.step(jax.random.PRNGKey(0))
        losses[n_dev] = float(m["train/loss"])
        assert np.isfinite(losses[n_dev])
    # same seed, same math — mesh size must not change the loss value
    np.testing.assert_allclose(losses[1], losses[8], rtol=1e-4)


def test_constrain_batch_splits_under_jit():
    """constrain_batch inside jit really distributes the particle axis (the
    train-path M2 fix: a batch born from a replicated key would otherwise be
    replicated, every device redundantly simulating everything)."""
    from sde_sampler_lrds_tpu.parallel import constrain_batch

    mesh = get_mesh(8)
    f = jax.jit(lambda key: constrain_batch(
        jax.random.normal(key, (64, 2)), mesh))
    out = f(jax.random.PRNGKey(0))
    assert len(out.sharding.device_set) == 8
    assert out.sharding.shard_shape(out.shape) == (8, 2)
    # non-divisible batch: silently unconstrained, not an error
    g = jax.jit(lambda key: constrain_batch(
        jax.random.normal(key, (63, 2)), mesh))
    assert g(jax.random.PRNGKey(0)).shape == (63, 2)


@pytest.mark.slow
def test_evaluate_output_sharded_over_mesh():
    """An RDS eval pass on an 8-device mesh returns particle-sharded samples
    (sharding propagates through the trajectory scan)."""
    from sde_sampler_lrds_tpu.losses import EMReferenceSDELoss
    from sde_sampler_lrds_tpu.models import ClippedCtrl, FourierMLP
    from sde_sampler_lrds_tpu.sde import VP, get_timesteps
    from sde_sampler_lrds_tpu.solvers import RDS
    from sde_sampler_lrds_tpu.solvers.base import TrainConfig
    from sde_sampler_lrds_tpu.targets import Gauss, IsotropicGauss

    mesh = get_mesh(8)
    target = Gauss(dim=2, loc=0.5, scale=1.2, n_reference_samples=1000)
    cfg = TrainConfig(train_steps=2, train_batch_size=32, eval_batch_size=64)
    solver = RDS(target, IsotropicGauss(dim=2), VP(),
                 ClippedCtrl(base_model=FourierMLP(dim=2, channels=16,
                                                   zero_init=True),
                             clip_model=1e4),
                 EMReferenceSDELoss, {"method": "kl"},
                 train_ts=get_timesteps(0.0, 1.0, steps=4), cfg=cfg, mesh=mesh)
    solver.setup()
    res = solver.evaluate(jax.random.PRNGKey(0), return_traj=False)
    assert len(res.samples.sharding.device_set) == 8


@pytest.mark.slow
def test_bench_multichip_harness(tmp_path):
    """bench_multichip.py produces the scaling JSON line on a virtual mesh
    (VERDICT #6: the artifact must be ready to fire on real chips)."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).parents[1]
    proc = subprocess.run(
        [sys.executable, str(repo / "bench_multichip.py"), "--virtual", "8",
         "--per-device-batch", "64", "--n-calls", "2", "--reps", "1",
         "--train-steps", "2"],
        capture_output=True, text=True, timeout=900,
        env={k: v for k, v in __import__("os").environ.items()
             if k not in ("XLA_FLAGS",)})
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["n_devices"] == 8
    assert rec["value"] > 0 and rec["single_device"] > 0
    assert 0 < rec["scaling_efficiency"] <= 1.5
