"""MCMC / SMC / replica-exchange tests.

Oracles: chains started in the target stay in the target (invariance of the
MH kernels); SMC along a geometric tempering path recovers the target's
moments and mode weights; RE swaps are accepted and mix levels; resampling
index distributions match the weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.mcmc import (
    MCMCState,
    heuristics_step_size,
    mala_step,
    re_sampler,
    rwmh_step,
    smc_sampler,
    ula_step,
)
from sde_sampler_lrds_tpu.mcmc.kernels import run_chain
from sde_sampler_lrds_tpu.ops import multinomial_resample, systematic_resample
from sde_sampler_lrds_tpu.targets import Gauss, TwoModes


def gauss_lpg(mu, var):
    def f(x):
        lp = -0.5 * jnp.sum((x - mu) ** 2 / var, axis=-1)
        return lp, -(x - mu) / var
    return f


def test_mala_invariance():
    """MALA initialized at the target keeps its moments (detailed balance)."""
    mu, var = jnp.asarray([1.0, -1.0]), jnp.asarray([0.5, 2.0])
    lpg = gauss_lpg(mu, var)
    key = jax.random.PRNGKey(0)
    k_init, k_run = jax.random.split(key)
    x0 = mu + jnp.sqrt(var) * jax.random.normal(k_init, (4096, 2))
    state = MCMCState.init(x0, lpg, step_size=0.1)
    final, samples = jax.jit(
        lambda k, s: run_chain(k, s, lpg, 200, kernel="mala"))(k_run, state)
    pooled = samples[100:].reshape(-1, 2)
    np.testing.assert_allclose(np.asarray(pooled.mean(0)), np.asarray(mu), atol=0.05)
    np.testing.assert_allclose(np.asarray(pooled.var(0)), np.asarray(var), rtol=0.08)


def test_mala_converges_from_offset():
    mu, var = jnp.asarray([2.0]), jnp.asarray([0.3])
    lpg = gauss_lpg(mu, var)
    x0 = jnp.zeros((2048, 1)) - 3.0
    state = MCMCState.init(x0, lpg, step_size=0.05)
    final, _ = jax.jit(
        lambda k, s: run_chain(k, s, lpg, 500, kernel="mala"))(jax.random.PRNGKey(1), state)
    np.testing.assert_allclose(float(final.x.mean()), 2.0, atol=0.08)
    np.testing.assert_allclose(float(final.x.var()), 0.3, rtol=0.15)


def test_rwmh_invariance():
    mu, var = jnp.asarray([0.5]), jnp.asarray([1.0])
    lpg = gauss_lpg(mu, var)
    x0 = mu + jax.random.normal(jax.random.PRNGKey(2), (4096, 1))
    state = MCMCState.init(x0, lpg, step_size=0.5)
    final, samples = jax.jit(
        lambda k, s: run_chain(k, s, lpg, 300, kernel="rwmh"))(jax.random.PRNGKey(3), state)
    pooled = samples[150:].reshape(-1)
    np.testing.assert_allclose(float(pooled.mean()), 0.5, atol=0.05)
    np.testing.assert_allclose(float(pooled.var()), 1.0, rtol=0.1)


def test_precond_mala_matches_identity():
    """Preconditioning with the identity matrix must reproduce plain MALA
    statistics (same invariant distribution)."""
    mu, var = jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 4.0])
    lpg = gauss_lpg(mu, var)
    x0 = mu + jnp.sqrt(var) * jax.random.normal(jax.random.PRNGKey(4), (4096, 2))
    eye = jnp.broadcast_to(jnp.eye(2), (4096, 2, 2))
    state = MCMCState.init(x0, lpg, step_size=0.1, precond_matrix=eye)
    final, samples = jax.jit(lambda k, s: run_chain(
        k, s, lpg, 200, kernel="mala", precond_matrix=eye,
        precond_matrix_chol=eye))(jax.random.PRNGKey(5), state)
    pooled = samples[100:].reshape(-1, 2)
    np.testing.assert_allclose(np.asarray(pooled.var(0)), np.asarray(var), rtol=0.1)


def test_step_size_adaptation():
    ss = jnp.full((8, 1), 0.1)
    grown = heuristics_step_size(ss, jnp.zeros(8))           # acc=1 > target
    shrunk = heuristics_step_size(ss, jnp.full(8, -10.0))    # acc~0 < target
    assert bool(jnp.all(grown > ss))
    assert bool(jnp.all(shrunk < ss))


@pytest.mark.parametrize("fn", [systematic_resample, multinomial_resample],
                         ids=["systematic", "multinomial"])
def test_resampling_matches_weights(fn):
    n = 1024
    logw = jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32))
    keys = jax.random.split(jax.random.PRNGKey(6), 50)
    counts = jnp.zeros(n)
    for k in keys:
        idx = fn(k, logw)
        counts = counts + jnp.bincount(idx, length=n)
    freq = counts / counts.sum()
    w = jax.nn.softmax(logw)
    # aggregate over the top half (individual bins are noisy)
    np.testing.assert_allclose(float(freq[n // 2:].sum()), float(w[n // 2:].sum()),
                               rtol=0.02)


def test_systematic_pallas_interpret_matches_xla():
    n = 512
    logw = jax.random.normal(jax.random.PRNGKey(7), (n,))
    k = jax.random.PRNGKey(8)
    idx_xla = systematic_resample(k, logw, use_pallas=False)
    idx_pallas = systematic_resample(k, logw, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(idx_xla), np.asarray(idx_pallas))


def _tempering_lpg(target, prior):
    """Geometric path: log p_t = (1-t)·log ρ + t·log p0, t∈[0,1]."""
    def f(t, x):
        t = jnp.reshape(t, (-1,) if jnp.ndim(t) > 0 else ())
        lp_t, g_t = target.unnorm_log_prob(x), target.score(x)
        lp_0, g_0 = prior.log_prob(x), prior.score(x)
        tt = t if jnp.ndim(t) > 0 else jnp.full((x.shape[0],), t)
        tcol = tt[:, None] if jnp.ndim(tt) > 0 else tt
        return (1 - tt) * lp_t + tt * lp_0, (1 - tcol) * g_t + tcol * g_0
    return f


@pytest.mark.slow
def test_smc_sampler_two_modes():
    target = TwoModes(dim=2, n_reference_samples=10_000)
    prior = Gauss(dim=2, loc=0.0, scale=2.0)
    lpg = _tempering_lpg(target, prior)
    L, B = 32, 512
    times = jnp.linspace(0.0, 1.0, L)
    key = jax.random.PRNGKey(9)
    k_init, k_run = jax.random.split(key)
    x0 = prior.sample(k_init, (B,))
    samples, ss, diags = jax.jit(lambda k, x: smc_sampler(
        k, x, times, lpg, n_warmup_mcmc_steps=10, n_mcmc_steps=8,
        step_sizes_per_noise=jnp.full((L, B, 1), 0.05),
        reweight_threshold=0.8))(k_run, x0)
    assert samples.shape == (L, 8, B, 2)
    final = samples[0].reshape(-1, 2)
    mw = float(target.compute_mode_weight(final))
    assert abs(mw - 100 * 2 / 3) < 12.0, f"mode weight {mw}"
    assert bool(jnp.all(diags["ess"] > 0))
    assert float(diags["local_acc"].mean()) > 0.3


def test_smc_pdds_mode():
    """PDDS: reverse-kernel transitions under a VP SDE with noised-target
    annealed densities."""
    from sde_sampler_lrds_tpu.sde import VP

    sde = VP()
    mu, var = jnp.asarray([0.8, -0.4]), jnp.asarray([0.5, 0.7])

    def lpg(t, x):
        lp = sde.marginal_log_prob(t, x, mu, var_init=var)
        g = sde.marginal_score(t, x, mu, var_init=var)
        return lp, g

    L, B = 16, 512
    times = jnp.linspace(0.01, 0.99, L)
    key = jax.random.PRNGKey(10)
    k_init, k_run = jax.random.split(key)
    loc, v = sde.marginal_params(times[-1], mu, var_init=var)
    x0 = loc + jnp.sqrt(v) * jax.random.normal(k_init, (B, 2))
    samples, _, diags = jax.jit(lambda k, x: smc_sampler(
        k, x, times, lpg, n_warmup_mcmc_steps=5, n_mcmc_steps=5,
        step_sizes_per_noise=jnp.full((L, B, 1), 0.05),
        reweight_threshold=0.8, use_pdds_weights=True, sde=sde))(k_run, x0)
    final = samples[0].reshape(-1, 2)
    loc0, v0 = sde.marginal_params(times[0], mu, var_init=var)
    np.testing.assert_allclose(np.asarray(final.mean(0)), np.asarray(loc0), atol=0.1)


@pytest.mark.slow
def test_re_sampler_two_modes():
    target = TwoModes(dim=2, n_reference_samples=10_000)
    prior = Gauss(dim=2, loc=0.0, scale=2.0)
    base = _tempering_lpg(target, prior)
    lpg = lambda t, x: base(t, x)
    L, B = 8, 256
    times = jnp.linspace(0.0, 1.0, L)
    key = jax.random.PRNGKey(11)
    k_init, k_run = jax.random.split(key)
    x0 = prior.sample(k_init, (B,))
    samples, ss, diags, final_state = jax.jit(lambda k, x: re_sampler(
        k, x, times, lpg, swap_frequency=4, n_warmup_mcmc_steps=200,
        n_mcmc_steps=200, step_sizes_per_noise=jnp.full((L,), 0.05)))(k_run, x0)
    assert samples.shape == (L, 200, B, 2)
    final = samples[0, 100:].reshape(-1, 2)
    mw = float(target.compute_mode_weight(final))
    assert abs(mw - 100 * 2 / 3) < 12.0, f"mode weight {mw}"
    # persistent-state restart: feed final_state back in
    samples2, _, _, _ = re_sampler(
        jax.random.PRNGKey(12), x0, times, lpg, swap_frequency=4,
        n_warmup_mcmc_steps=0, n_mcmc_steps=4,
        step_sizes_per_noise=jnp.full((L,), 0.05),
        init_state=final_state, start_step=400)
    assert samples2.shape == (L, 4, B, 2)


@pytest.mark.slow
def test_re_sampler_identity_precond_matches_plain():
    """Per-level (L, D, D) preconditioning in re_sampler: identity matrices
    reproduce plain MALA exactly (the Prop-1 optimized ratio is exact, and
    the key/noise schedule is shared)."""
    target = TwoModes(dim=2, n_reference_samples=10_000)
    prior = Gauss(dim=2, loc=0.0, scale=2.0)
    lpg = _tempering_lpg(target, prior)
    L, B = 4, 32
    times = jnp.linspace(0.0, 1.0, L)
    x0 = prior.sample(jax.random.PRNGKey(0), (B,))
    kwargs = dict(swap_frequency=4, n_warmup_mcmc_steps=8, n_mcmc_steps=8,
                  step_sizes_per_noise=jnp.full((L,), 0.05))
    s_plain, ss_p, _, _ = re_sampler(jax.random.PRNGKey(1), x0, times, lpg,
                                     **kwargs)
    eye = jnp.broadcast_to(jnp.eye(2)[None], (L, 2, 2))
    s_prec, ss_q, _, _ = re_sampler(jax.random.PRNGKey(1), x0, times, lpg,
                                    precond_matrix_per_noise=eye,
                                    precond_matrix_chol_per_noise=eye,
                                    **kwargs)
    np.testing.assert_allclose(np.asarray(s_plain), np.asarray(s_prec),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ss_p), np.asarray(ss_q), rtol=1e-6)
