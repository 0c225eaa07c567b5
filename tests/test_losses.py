"""Loss-layer oracle tests — the core correctness surface (SURVEY.md §7.4).

Key identities used as oracles:
  1. target ≡ reference and zero control  ->  rnd ≡ 0 exactly (RDS losses).
  2. target ≡ reference (normalized) and ANY control  ->  E[e^-rnd] = 1
     exactly in discrete time, so log_norm_const_is ≈ 0 up to MC error.
     This pins down the ω/Itô bookkeeping: any wrong weight biases it.
     (Caveat learned the hard way: the prior key and the simulation key must
     be independent — key reuse correlates x₀ with the first Brownian draw
     and masquerades as a systematic bias.)
  3. Same identity for CMCD (exact discrete density ratio vs the backward
     annealed-Langevin chain) and original-DDS.
  4. EUBO reverse pass with zero control and target ≡ reference  ->  rnd ≡ 0.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.losses import (
    ControlledLangevinSDELoss,
    DDPMLikeReferenceSDELoss,
    DiscreteTimeReversalLossEI,
    EIReferenceSDELoss,
    EMReferenceSDELoss,
    ExponentialIntegratorSDELoss,
    TimeReversalLoss,
)
from sde_sampler_lrds_tpu.sde import VP, PinnedBM, ControlledLangevinSDE, get_timesteps
from sde_sampler_lrds_tpu.targets import Gauss, GMM

MU = jnp.asarray([0.5, -0.3])
VAR = jnp.asarray([0.6, 1.1])

ZERO_CTRL = lambda t, x: jnp.zeros_like(x)
SMALL_CTRL = lambda t, x: 0.3 * jnp.tanh(x)


def make_rds(loss_cls, sde, method="kl", **kwargs):
    ref_ctrl = lambda t, x: sde.marginal_score(t, x, MU, var_init=VAR)
    ref_log_prob = lambda x: sde.marginal_log_prob(jnp.asarray(0.0), x, MU, var_init=VAR)
    loss = loss_cls(sde=sde, method=method, reference_ctrl=ref_ctrl, **kwargs)
    return loss, ref_log_prob


def sample_rds_prior(sde, key, n, ts):
    """x₀ ~ noised reference marginal at the grid's initial noising time."""
    loc, v = sde.marginal_params(ts[-1] - ts[0], MU, var_init=VAR)
    return loc + jnp.sqrt(v) * jax.random.normal(key, (n, MU.shape[0]))


def rds_grid(sde_name, loss_name, sde, steps=24):
    """PBM needs t > 0 (EI kernel divides by t_k); the DDPM ω diverges at the
    exact terminal gridpoint, so DDPM grids stop at T − ε (as the reference's
    configs do implicitly)."""
    start = 0.01 if sde_name == "pbm" else 0.0
    end = sde.terminal_t - (0.01 if loss_name == "ddpm" else 0.0)
    return get_timesteps(start, end, steps=steps)


RDS_LOSSES = [
    ("em", EMReferenceSDELoss),
    ("ei", EIReferenceSDELoss),
    ("ddpm", DDPMLikeReferenceSDELoss),
]
SDE_FACTORIES = [
    ("vp", lambda: VP()),
    ("pbm", lambda: PinnedBM(diff_coeff=2.0)),
]


def is_log_z(rnd):
    return float(jax.scipy.special.logsumexp(-rnd) - jnp.log(rnd.shape[0]))


@pytest.mark.parametrize("sde_name,make_sde", SDE_FACTORIES, ids=[s[0] for s in SDE_FACTORIES])
@pytest.mark.parametrize("loss_name,loss_cls", RDS_LOSSES, ids=[l[0] for l in RDS_LOSSES])
def test_rds_zero_ctrl_zero_rnd(loss_name, loss_cls, sde_name, make_sde):
    """target == reference, u == 0  =>  rnd == 0 exactly."""
    sde = make_sde()
    loss, ref_lp = make_rds(loss_cls, sde)
    ts = rds_grid(sde_name, loss_name, sde, steps=16)
    k_prior, k_sim = jax.random.split(jax.random.PRNGKey(0))
    x0 = sample_rds_prior(sde, k_prior, 256, ts)
    _, rnd, _ = loss.simulate(k_sim, ts, x0, ZERO_CTRL, ref_lp, ref_lp)
    np.testing.assert_allclose(np.asarray(rnd), 0.0, atol=2e-4)


@pytest.mark.parametrize("sde_name,make_sde", SDE_FACTORIES, ids=[s[0] for s in SDE_FACTORIES])
@pytest.mark.parametrize("loss_name,loss_cls", RDS_LOSSES, ids=[l[0] for l in RDS_LOSSES])
def test_rds_is_estimator_unbiased_any_ctrl(loss_name, loss_cls, sde_name, make_sde):
    """target == reference, arbitrary control  =>  E[e^-rnd] = 1 exactly."""
    sde = make_sde()
    loss, ref_lp = make_rds(loss_cls, sde)
    ts = rds_grid(sde_name, loss_name, sde, steps=24)
    k_prior, k_sim = jax.random.split(jax.random.PRNGKey(1))
    x0 = sample_rds_prior(sde, k_prior, 1 << 16, ts)
    _, rnd, _ = jax.jit(
        lambda k, x: loss.simulate(k, ts, x, SMALL_CTRL, ref_lp, ref_lp)
    )(k_sim, x0)
    log_z = is_log_z(rnd)
    assert abs(log_z) < 0.02, f"log Z bias {log_z}"


def test_rds_em_terminal_cost_gauss_target():
    """Gaussian target ≠ reference, zero control, fine grid: log-Z error is
    only discretization bias and must be small."""
    sde = VP()
    target = Gauss(dim=2, loc=0.2, scale=1.3)
    loss, ref_lp = make_rds(EMReferenceSDELoss, sde)
    ts = get_timesteps(0.0, 1.0, steps=256)
    k_prior, k_sim = jax.random.split(jax.random.PRNGKey(2))
    x0 = sample_rds_prior(sde, k_prior, 1 << 15, ts)
    _, rnd, _ = jax.jit(
        lambda k, x: loss.simulate(k, ts, x, ZERO_CTRL, target.log_prob, ref_lp)
    )(k_sim, x0)
    log_z = is_log_z(rnd)
    assert abs(log_z) < 0.1, f"log Z err {log_z}"


def test_cmcd_logz_unbiased():
    """CMCD's rnd is an exact discrete density ratio against the backward
    annealed-Langevin chain: E[e^-rnd] = Z for any control at any K."""
    prior = Gauss(dim=2, loc=0.0, scale=2.0)
    target = GMM(dim=2, loc=jnp.asarray([[-1.5, 0.0], [1.5, 0.5]]),
                 scale=0.5 * jnp.ones((2, 2)), mixture_weights=jnp.asarray([2.0, 1.0]))
    sde = ControlledLangevinSDE(target_score=target.score, prior_score=prior.score,
                                diff_coeff=1.0, terminal_t=1.0)
    loss = ControlledLangevinSDELoss(sde=sde, method="kl")
    ts = get_timesteps(0.0, 1.0, steps=128)
    k_prior, k_sim = jax.random.split(jax.random.PRNGKey(3))
    x0 = prior.sample(k_prior, (1 << 16,))
    _, rnd, _ = jax.jit(
        lambda k, x: loss.simulate(k, ts, x, SMALL_CTRL, target.log_prob,
                                   initial_log_prob=prior.log_prob, train=False)
    )(k_sim, x0)
    log_z = is_log_z(rnd)
    assert abs(log_z) < 0.05, f"log Z bias {log_z}"


@pytest.mark.slow
def test_dis_losses_structural():
    """DIS variants: exact numerical parity with the torch reference is
    covered in test_torch_parity.py (an absolute log-Z oracle is meaningless
    with an untrained control — the IS weights are fat-tailed). Here: shapes,
    finiteness, and train-vs-eval initial-cost semantics."""
    sde = VP()
    prior = Gauss(dim=2, loc=0.0, scale=1.0)
    target = Gauss(dim=2, loc=0.3, scale=0.9)
    k_prior, k_sim = jax.random.split(jax.random.PRNGKey(4))
    x0 = prior.sample(k_prior, (64,))
    ts = get_timesteps(0.0, 1.0, steps=16)
    for loss in (DiscreteTimeReversalLossEI(sde=sde, method="kl"),
                 TimeReversalLoss(sde=sde, method="kl")):
        xt, rnd_eval, xs = loss.simulate(
            k_sim, ts, x0, SMALL_CTRL, target.log_prob,
            initial_log_prob=prior.log_prob, train=False, return_traj=True)
        assert xt.shape == x0.shape and rnd_eval.shape == (64,)
        assert xs.shape == (17, 64, 2)
        assert bool(jnp.all(jnp.isfinite(rnd_eval)))
        _, rnd_train, _ = loss.simulate(
            k_sim, ts, x0, SMALL_CTRL, target.log_prob,
            initial_log_prob=prior.log_prob, train=True)
        # train mode (kl) drops the initial log-prob term
        assert not np.allclose(np.asarray(rnd_eval), np.asarray(rnd_train))


def test_orig_dis_inference_ctrl_divergence():
    """Bridge/GBS path: learned inference control contributes its divergence
    (exact vs Hutchinson agree in expectation; exact path is deterministic)."""
    sde = VP()
    prior = Gauss(dim=2, loc=0.0, scale=1.0)
    target = Gauss(dim=2, loc=0.3, scale=0.9)
    inf_ctrl = lambda t, x: 0.1 * x  # divergence = 0.2 per sample
    loss = TimeReversalLoss(sde=sde, method="kl", inference_ctrl=inf_ctrl)
    k_prior, k_sim = jax.random.split(jax.random.PRNGKey(5))
    x0 = prior.sample(k_prior, (32,))
    ts = get_timesteps(0.0, 1.0, steps=8)
    _, rnd, _ = loss.simulate(k_sim, ts, x0, SMALL_CTRL, target.log_prob,
                              initial_log_prob=prior.log_prob, train=True,
                              compute_ito_int=True)
    assert bool(jnp.all(jnp.isfinite(rnd)))


def test_orig_dds_unbiased_any_ctrl():
    """Original DDS: zero-control chain preserves N(0, σ²); with target ==
    reference the IS estimate is exactly unbiased for any control."""
    sigma = 1.2
    prior = Gauss(dim=2, loc=0.0, scale=sigma)
    loss = ExponentialIntegratorSDELoss(sde=None, method="kl", alpha=1.0, sigma=sigma)
    ts = get_timesteps(0.0, 6.4, steps=64, rescale_t="cosine")
    k_prior, k_sim = jax.random.split(jax.random.PRNGKey(6))
    x0 = prior.sample(k_prior, (1 << 16,))
    _, rnd, _ = jax.jit(
        lambda k, x: loss.simulate(k, ts, x, SMALL_CTRL, prior.log_prob,
                                   prior.log_prob, compute_ito_int=True)
    )(k_sim, x0)
    log_z = is_log_z(rnd)
    assert abs(log_z) < 0.02, f"log Z bias {log_z}"


@pytest.mark.parametrize("loss_name,loss_cls", RDS_LOSSES[:2], ids=["em", "ei"])
def test_rds_eubo_zero_ctrl(loss_name, loss_cls):
    """EUBO reverse pass: target == reference, zero control -> rnd == 0."""
    sde = VP()
    loss, ref_lp = make_rds(loss_cls, sde)
    ts = get_timesteps(0.0, 1.0, steps=16)
    k_data, k_sim = jax.random.split(jax.random.PRNGKey(7))
    x = MU + jnp.sqrt(VAR) * jax.random.normal(k_data, (128, 2))
    rnd = loss.compute_eubo(k_sim, ts, x, ZERO_CTRL, ref_lp, ref_lp)
    np.testing.assert_allclose(np.asarray(rnd), 0.0, atol=2e-4)


@pytest.mark.slow
def test_lv_loss_reduction_and_grad_path():
    """LV loss: 0 at the optimum (target == reference, u == 0) and finite
    gradients through the attached control."""
    sde = VP()
    loss, ref_lp = make_rds(EIReferenceSDELoss, sde, method="lv")
    ts = get_timesteps(0.0, 1.0, steps=8)
    k_prior, k_sim = jax.random.split(jax.random.PRNGKey(8))
    x0 = sample_rds_prior(sde, k_prior, 512, ts)

    def loss_fn(scale):
        ctrl = lambda t, x: scale * jnp.tanh(x)
        val, _ = loss(k_sim, ts, x0, ctrl, ref_lp, ref_lp)
        return val

    g = jax.grad(loss_fn)(0.5)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(loss_fn(0.0)), 0.0, atol=1e-6)


def test_max_rnd_filtering():
    sde = VP()
    loss, _ = make_rds(EMReferenceSDELoss, sde, method="kl", max_rnd=1e8)
    rnd = jnp.asarray([0.5, jnp.inf, 1.5, 2e8])
    val, metrics = loss.reduce(rnd)
    np.testing.assert_allclose(float(val), 1.0, rtol=1e-6)
    assert int(metrics["train/n_filtered"]) == 2


def test_traj_per_sample_lv_traj():
    sde = VP()
    loss, ref_lp = make_rds(EIReferenceSDELoss, sde, method="lv_traj", traj_per_sample=4)
    ts = get_timesteps(0.0, 1.0, steps=8)
    k_prior, k_sim = jax.random.split(jax.random.PRNGKey(9))
    x0 = sample_rds_prior(sde, k_prior, 64, ts)
    val, _ = loss(k_sim, ts, x0, SMALL_CTRL, ref_lp, ref_lp)
    assert np.isfinite(float(val)) and float(val) >= 0


def test_filtered_elbo_diagnostic():
    """compute_results reports eval/elbo_filtered alongside the
    reference-faithful unfiltered bound when max_rnd is set: diverged
    trajectories (rnd >= max_rnd or non-finite) are excluded from the
    filtered diagnostic only."""
    from sde_sampler_lrds_tpu.losses.base import compute_results

    rnd = jnp.array([1.0, 2.0, jnp.nan, 1e12])
    res = compute_results(rnd, compute_weights=True, max_rnd=1e8)
    assert not np.isfinite(res.metrics["eval/elbo"])  # reference-faithful
    np.testing.assert_allclose(res.metrics["eval/elbo_filtered"], -1.5)
    np.testing.assert_allclose(res.metrics["eval/filtered_frac"], 0.5)
    lse = np.log(0.5 * (np.exp(-1.0) + np.exp(-2.0)))
    np.testing.assert_allclose(
        res.metrics["eval/log_norm_const_is_filtered"], lse, rtol=1e-6)
    # no max_rnd -> no filtered keys (losses without a filter stay lean)
    res2 = compute_results(rnd, compute_weights=True)
    assert "eval/elbo_filtered" not in res2.metrics


def test_filtered_elbo_all_filtered_is_nan():
    """When every trajectory is filtered the diagnostic must be NaN, not a
    plausible-looking 0.0 a sweep could select as best."""
    from sde_sampler_lrds_tpu.losses.base import compute_results

    rnd = jnp.array([jnp.nan, 1e12, jnp.inf])
    res = compute_results(rnd, compute_weights=True, max_rnd=1e8)
    assert np.isnan(res.metrics["eval/elbo_filtered"])
    np.testing.assert_allclose(res.metrics["eval/filtered_frac"], 1.0)
