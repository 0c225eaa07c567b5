"""Solver-layer tests: short end-to-end training runs for each algorithm
(PIS / DDS / Bridge / CMCD / RDS) on tiny problems, checkpoint round-trip,
and the multi-device sharded train step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.losses import (
    ControlledLangevinSDELoss,
    DiscreteTimeReversalLossEI,
    EIReferenceSDELoss,
    EMReferenceSDELoss,
    ExponentialIntegratorSDELoss,
    TimeReversalLoss,
)
from sde_sampler_lrds_tpu.models import ClippedCtrl, FourierMLP
from sde_sampler_lrds_tpu.sde import VP, ScaledBM, PinnedBM, get_timesteps
from sde_sampler_lrds_tpu.solvers import CMCD, DDS, PIS, RDS, Bridge, LangevinSolver
from sde_sampler_lrds_tpu.solvers.base import TrainConfig
from sde_sampler_lrds_tpu.targets import Delta, Gauss, IsotropicGauss, TwoModes

CFG = TrainConfig(train_steps=40, train_batch_size=128, eval_batch_size=512,
                  lr=2e-3, eval_interval=1000, log_interval=20)


def make_ctrl(dim=2):
    return ClippedCtrl(base_model=FourierMLP(dim=dim, channels=32, zero_init=True),
                       clip_model=1e4)


def run_short(solver, n=30):
    solver.setup()
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(n):
        key, sub = jax.random.split(key)
        m = solver.step(sub)
        losses.append(float(m["train/loss"]))
    assert np.isfinite(losses).all()
    res = solver.evaluate(jax.random.PRNGKey(3))
    assert res.samples.shape == (CFG.eval_batch_size, solver.target.dim)
    assert np.isfinite(res.metrics["eval/elbo"])
    return losses, res


@pytest.mark.slow
def test_rds_em_end_to_end(tmp_path):
    target = Gauss(dim=2, loc=0.5, scale=1.2, n_reference_samples=10_000)
    prior = IsotropicGauss(dim=2)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    ts = get_timesteps(0.0, 1.0, steps=16)
    solver = RDS(target, prior, sde, make_ctrl(), EMReferenceSDELoss,
                 {"method": "kl"}, train_ts=ts, cfg=CFG, out_dir=tmp_path)
    losses, res = run_short(solver)
    # training reduces the KL loss on an easy Gaussian target
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # checkpoint round-trip
    p = solver.store_checkpoint()
    state_before = jax.tree.map(np.asarray, solver.state.params)
    solver.step(jax.random.PRNGKey(9))
    assert solver.load_checkpoint(p)
    state_after = jax.tree.map(np.asarray, solver.state.params)
    jax.tree.map(np.testing.assert_array_equal, state_before, state_after)


@pytest.mark.slow
def test_rds_reference_switch():
    target = TwoModes(dim=2, n_reference_samples=10_000)
    prior = IsotropicGauss(dim=2)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    ts = get_timesteps(0.0, 1.0, steps=16)
    solver = RDS(target, prior, sde, make_ctrl(), EIReferenceSDELoss,
                 {"method": "lv", "max_rnd": 1e8}, train_ts=ts, cfg=CFG)
    # fitted-Gaussian reference
    solver.change_reference_type("gaussian", mean=jnp.zeros(2), var=jnp.ones(2))
    assert solver.ref_type == "gaussian"
    # fitted-GMM reference (the LRDS flagship path)
    solver.change_reference_type(
        "gmm", means=target.loc, variances=target.scale**2,
        weights=target.mixture_weights)
    assert solver.ref_type == "gmm"
    run_short(solver, n=20)


@pytest.mark.slow
def test_pis_end_to_end():
    # PIS pairs the Dirac prior with plain Brownian motion (conf/sde/bm_pis);
    # PinnedBM's marginal at exactly t=T degenerates (0·inf) by design.
    target = Gauss(dim=2, loc=0.3, scale=1.0, n_reference_samples=10_000)
    prior = Delta(dim=2, loc=0.0)
    sde = ScaledBM(diff_coeff=1.0, terminal_t=5.0)
    ts = get_timesteps(0.0, 5.0, steps=16)
    solver = PIS(target, prior, sde, make_ctrl(), EMReferenceSDELoss,
                 {"method": "lv", "max_rnd": 1e8}, train_ts=ts, cfg=CFG)
    run_short(solver, n=20)


@pytest.mark.slow
def test_dds_end_to_end():
    target = Gauss(dim=2, loc=0.3, scale=1.0, n_reference_samples=10_000)
    prior = IsotropicGauss(dim=2, scale=1.0)
    ts = get_timesteps(0.0, 6.4, steps=16, rescale_t="cosine")
    solver = DDS(target, prior, None, make_ctrl(), ExponentialIntegratorSDELoss,
                 {"method": "lv", "alpha": 1.0, "sigma": 1.0, "max_rnd": 1e8},
                 train_ts=ts, cfg=CFG)
    run_short(solver, n=20)


@pytest.mark.slow
def test_bridge_dis_end_to_end():
    target = Gauss(dim=2, loc=0.3, scale=1.0, n_reference_samples=10_000)
    prior = IsotropicGauss(dim=2, scale=1.0)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    ts = get_timesteps(0.0, 1.0, steps=16)
    solver = Bridge(target, prior, sde, make_ctrl(), DiscreteTimeReversalLossEI,
                    {"method": "lv", "max_rnd": 1e8}, train_ts=ts, cfg=CFG)
    run_short(solver, n=20)


@pytest.mark.slow
def test_bridge_gbs_learned_inference_ctrl():
    target = Gauss(dim=2, loc=0.3, scale=1.0, n_reference_samples=10_000)
    prior = IsotropicGauss(dim=2, scale=1.0)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    ts = get_timesteps(0.0, 1.0, steps=8)
    solver = Bridge(target, prior, sde, make_ctrl(), TimeReversalLoss,
                    {"method": "kl", "div_estimator": "rademacher"},
                    train_ts=ts, cfg=CFG, inference_ctrl=make_ctrl())
    run_short(solver, n=10)


@pytest.mark.slow
def test_cmcd_end_to_end():
    target = TwoModes(dim=2, n_reference_samples=10_000)
    prior = Gauss(dim=2, loc=0.0, scale=2.0)
    solver = CMCD(target, prior, None, make_ctrl(), ControlledLangevinSDELoss,
                  {"method": "lv", "max_rnd": 1e8},
                  train_ts=get_timesteps(0.0, 1.0, steps=16), cfg=CFG)
    run_short(solver, n=20)
    # prior refit (solver/oc.py:291)
    solver.update_prior(jnp.asarray([0.1, 0.1]), jnp.asarray([1.5, 1.5]))
    solver.setup()
    run_short(solver, n=5)


@pytest.mark.slow
def test_cmcd_update_prior_invalidates_cached_eval():
    """update_prior swaps loss/sde/prior in place; the cached eval jits
    (and the jitted train step) close over the old ones and must be
    dropped, or post-refit evals silently run the pre-refit annealing
    path."""
    target = Gauss(dim=2, loc=0.4, scale=1.1)
    prior = Gauss(dim=2, loc=0.0, scale=2.0)
    solver = CMCD(target, prior, None, make_ctrl(), ControlledLangevinSDELoss,
                  {"method": "lv", "max_rnd": 1e8},
                  train_ts=get_timesteps(0.0, 1.0, steps=8), cfg=CFG)
    solver.setup()
    res_before = solver.evaluate(jax.random.PRNGKey(3))
    assert solver._eval_jit_cache
    old_step = solver._train_step
    solver.update_prior(jnp.asarray([0.4, 0.4]), jnp.asarray([1.2, 1.2]))
    assert not solver._eval_jit_cache
    assert solver._train_step is not old_step
    res_after = solver.evaluate(jax.random.PRNGKey(3))
    # same key, different prior/annealing path -> different estimate
    assert (res_after.metrics["eval/elbo"]
            != res_before.metrics["eval/elbo"])
    m = solver.step(jax.random.PRNGKey(4))
    assert np.isfinite(float(m["train/loss"]))


def test_langevin_solver():
    target = Gauss(dim=2, loc=0.5, scale=1.0, n_reference_samples=10_000)
    prior = IsotropicGauss(dim=2, scale=2.0)
    ts = get_timesteps(0.0, 5.0, steps=200)
    solver = LangevinSolver(target, prior, eval_ts=ts, eval_batch_size=2048,
                            burn_steps=100)
    solver.setup(jax.random.PRNGKey(0))
    res = solver.run(jax.random.PRNGKey(1))
    # ULA on a Gaussian converges: E[sum x] = 1.0 (loose: finite chain + bias)
    assert abs(res.expectation_preds["sum"] - 1.0) < 0.3
    assert res.xs.shape == (201, 2048, 2)


@pytest.mark.slow
def test_sharded_train_step_multi_device():
    """The same jitted step runs with the batch sharded over all 8 virtual
    devices (data-parallel particles; psum inserted by XLA)."""
    assert jax.device_count() >= 8
    from sde_sampler_lrds_tpu.parallel import get_mesh

    mesh = get_mesh(8)
    target = Gauss(dim=2, loc=0.5, scale=1.2, n_reference_samples=10_000)
    prior = IsotropicGauss(dim=2)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    ts = get_timesteps(0.0, 1.0, steps=8)
    solver = RDS(target, prior, sde, make_ctrl(), EMReferenceSDELoss,
                 {"method": "kl"}, train_ts=ts, cfg=CFG, mesh=mesh)
    solver.setup()
    m = solver.step(jax.random.PRNGKey(0))
    assert np.isfinite(float(m["train/loss"]))


@pytest.mark.slow
def test_rds_reference_checkpoint_roundtrip(tmp_path):
    """RDS persists the fitted reference in checkpoints: a fresh solver that
    loads the checkpoint must evaluate the IDENTICAL reference_log_prob
    (reference solver/oc.py:634-666)."""
    target = TwoModes(dim=2, n_reference_samples=10_000)
    prior = IsotropicGauss(dim=2)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    ts = get_timesteps(0.0, 1.0, steps=8)

    def fresh(out_dir):
        return RDS(target, prior, sde, make_ctrl(), EIReferenceSDELoss,
                   {"method": "lv", "max_rnd": 1e8}, train_ts=ts,
                   cfg=CFG, out_dir=out_dir)

    x_probe = jax.random.normal(jax.random.PRNGKey(0), (64, 2)) * 2.0

    # gmm reference
    solver = fresh(tmp_path / "gmm")
    solver.setup()
    solver.change_reference_type(
        "gmm", means=target.loc, variances=target.scale**2,
        weights=target.mixture_weights)
    solver.step(jax.random.PRNGKey(1))
    want = np.asarray(solver.reference_log_prob(x_probe))
    p = solver.store_checkpoint()
    restored = fresh(tmp_path / "gmm")
    restored.setup()
    assert restored.ref_type == "default"
    assert restored.load_checkpoint(p)
    assert restored.ref_type == "gmm"
    np.testing.assert_allclose(
        np.asarray(restored.reference_log_prob(x_probe)), want, rtol=1e-6)

    # gaussian reference
    solver = fresh(tmp_path / "gauss")
    solver.setup()
    solver.change_reference_type(
        "gaussian", mean=jnp.asarray([0.3, -0.2]), var=jnp.asarray([1.5, 0.7]))
    want = np.asarray(solver.reference_log_prob(x_probe))
    p = solver.store_checkpoint()
    restored = fresh(tmp_path / "gauss")
    restored.setup()
    assert restored.load_checkpoint(p)
    assert restored.ref_type == "gaussian"
    np.testing.assert_allclose(
        np.asarray(restored.reference_log_prob(x_probe)), want, rtol=1e-6)


@pytest.mark.slow
def test_rds_nn_reference_checkpoint_roundtrip(tmp_path):
    """The (score_apply, log_prob_apply, params) nn form serializes the EBM
    params; a fresh solver with the same architecture restores them."""
    from sde_sampler_lrds_tpu.models import GaussTiltedPotential

    target = TwoModes(dim=2, n_reference_samples=10_000)
    prior = IsotropicGauss(dim=2)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    ts = get_timesteps(1e-4, 1.0, steps=8)
    pot = GaussTiltedPotential.from_gaussian(
        base_model=FourierMLP(dim=2, channels=16, zero_init=False),
        sde=sde, mean=jnp.zeros(2), variance=jnp.ones(2))
    params = pot.init(jax.random.PRNGKey(0), jnp.full((2,), 0.1), jnp.zeros((2, 2)))
    score_apply = lambda p, t, x: pot.apply(p, t, x)
    lp_apply = lambda p, t, x: pot.apply(p, t, x, method="unnorm_log_prob")

    def fresh(out_dir):
        return RDS(target, prior, sde, make_ctrl(), EIReferenceSDELoss,
                   {"method": "lv", "max_rnd": 1e8}, train_ts=ts,
                   cfg=CFG, out_dir=out_dir)

    x_probe = jax.random.normal(jax.random.PRNGKey(5), (32, 2))
    solver = fresh(tmp_path)
    solver.setup()
    solver.change_reference_type("nn", net=(score_apply, lp_apply, params),
                                 eps=float(ts[0]))
    want_lp = np.asarray(solver.reference_log_prob(x_probe))
    want_score = np.asarray(solver.reference_score_t(0.3, x_probe))
    p = solver.store_checkpoint()

    restored = fresh(tmp_path)
    restored.setup()
    # install the architecture (fresh params), then load the trained ones
    p_init = pot.init(jax.random.PRNGKey(7), jnp.full((2,), 0.1), jnp.zeros((2, 2)))
    restored.change_reference_type("nn", net=(score_apply, lp_apply, p_init),
                                   eps=float(ts[0]))
    assert restored.load_checkpoint(p)
    assert restored.ref_type == "nn"
    np.testing.assert_allclose(
        np.asarray(restored.reference_log_prob(x_probe)), want_lp, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored.reference_score_t(0.3, x_probe)), want_score, rtol=1e-6)


@pytest.mark.slow
def test_evaluate_uses_cached_jit():
    """Repeated evaluate() calls must reuse one compiled executable — the
    eval path used to re-trace the full trajectory scan on every call
    (minutes per eval for the MNIST UNet)."""
    from sde_sampler_lrds_tpu.api import make_model, make_target_details

    m = make_model("vp-ref", "default", "lv", "ei", "base_zero_init", "snr",
                   solver_details={"sigma": 1.0},
                   target_details=make_target_details("two_modes", dim=2),
                   training_details={"train_steps": 4, "train_batch_size": 32,
                                     "eval_batch_size": 64},
                   n_steps=8, compute_samples_based_metrics=False)
    m.setup()
    # Count traces directly: the jitted wrapper closes over this function,
    # so its body runs once per trace and never on a cache-hit dispatch.
    # (Asserting on fn._cache_size() instead is flaky under a long suite:
    # JAX's global executable cache is a bounded LRU, so entries from
    # *this* test can be evicted by unrelated compilations.)
    traces = []
    orig_sim = m._eval_sim

    def counting_sim(params, key, compute_weights, return_traj):
        traces.append(1)
        return orig_sim(params, key, compute_weights, return_traj)

    m._eval_sim = counting_sim
    r1 = m.evaluate(jax.random.PRNGKey(0))
    r2 = m.evaluate(jax.random.PRNGKey(1))
    assert np.isfinite(r1.metrics["eval/elbo"])
    assert isinstance(r2.metrics["eval/elbo"], float)
    cache = m._eval_jit_cache
    assert len(cache) == 1
    assert len(traces) == 1  # one trace served both calls
    # rebuilding the loss (reference switch) must drop the stale jit
    m.change_reference_type("default")
    assert m._eval_jit_cache == {}


def test_rds_reference_switch_after_training_retraces():
    """change_reference_type after training started must rebuild the jitted
    train step AND drop the cached eval jits — both close over the old
    reference tables, so training/eval would silently keep the pre-switch
    reference."""
    target = Gauss(dim=2, loc=0.4, scale=1.1)
    prior = IsotropicGauss(dim=2)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    solver = RDS(target, prior, sde, make_ctrl(), EIReferenceSDELoss,
                 {"method": "lv", "max_rnd": 1e8},
                 train_ts=get_timesteps(0.0, 1.0, steps=8), cfg=CFG)
    solver.setup()
    m0 = solver.step(jax.random.PRNGKey(0))
    solver.evaluate(jax.random.PRNGKey(1))
    old_step = solver._train_step
    solver.change_reference_type("gaussian", mean=0.4 * jnp.ones(2),
                                 var=1.2 * jnp.ones(2))
    assert solver._train_step is not old_step
    assert not solver._eval_jit_cache
    m1 = solver.step(jax.random.PRNGKey(2))
    assert np.isfinite(float(m1["train/loss"]))
    solver.evaluate(jax.random.PRNGKey(3))


def test_compute_eubo_rejects_ddpm_integrator():
    from sde_sampler_lrds_tpu.losses import DDPMLikeReferenceSDELoss

    target = Gauss(dim=2, loc=0.4, scale=1.1)
    solver = RDS(target, IsotropicGauss(dim=2),
                 VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0),
                 make_ctrl(), DDPMLikeReferenceSDELoss,
                 {"method": "lv", "max_rnd": 1e8},
                 train_ts=get_timesteps(0.0, 1.0, steps=8), cfg=CFG)
    solver.setup()
    with pytest.raises(NotImplementedError, match="EUBO"):
        solver.compute_eubo(jax.random.PRNGKey(0), jnp.zeros((4, 2)))
