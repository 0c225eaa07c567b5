"""SDE-algebra oracle tests.

Oracles (SURVEY.md §7 stage 2): transition kernels vs brute-force
Euler-Maruyama at tiny dt; scale/variance ODE identities; marginal scores vs
autodiff of marginal log-probs; exponential-integrator steps preserve
Gaussian-reference marginals exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.sde import VP, CosineVP, PinnedBM, ScaledBM, ConstOU, get_timesteps

SDES = [
    ("vp", lambda: VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)),
    ("vp_scaled", lambda: VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0, scale_diff_coeff=1.5)),
    ("cosine_vp", lambda: CosineVP()),
    ("pbm", lambda: PinnedBM(diff_coeff=2.0)),
    ("sbm", lambda: ScaledBM(diff_coeff=1.5)),
    ("const_ou", lambda: ConstOU(drift_coeff=1.0, diff_coeff=2.0)),
]


@pytest.mark.parametrize("name,make", SDES, ids=[s[0] for s in SDES])
def test_scale_variance_ode_identities(name, make):
    """ds/dt = k(t)s(t) and d(σ²)/dt = g²/s² by finite differences."""
    sde = make()
    ts = jnp.linspace(0.05, 0.9 * sde.terminal_t, 20)
    eps = 1e-4
    ds = (sde.s(ts + eps) - sde.s(ts - eps)) / (2 * eps)
    np.testing.assert_allclose(
        np.asarray(ds), np.asarray(sde.drift_coeff_t(ts) * sde.s(ts)), rtol=2e-2, atol=1e-4)
    dsig = (sde.sigma_sq(ts + eps) - sde.sigma_sq(ts - eps)) / (2 * eps)
    expected = sde.diff_coeff_t(ts) ** 2 / sde.s(ts) ** 2
    np.testing.assert_allclose(np.asarray(dsig), np.asarray(expected), rtol=2e-2, atol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("name,make", SDES, ids=[s[0] for s in SDES])
def test_transition_params_vs_em(name, make):
    """X_t = m·X_s + sqrt(v)·Z must match brute-force EM simulation."""
    sde = make()
    s, t = 0.2, 0.55
    n_sub, n_samp = 2000, 200_000
    key = jax.random.PRNGKey(0)
    x0 = 1.3 * jnp.ones((n_samp, 1))
    grid = jnp.linspace(s, t, n_sub + 1)

    def body(carry, st):
        x, k = carry
        a, b = st
        k, sub = jax.random.split(k)
        dt = b - a
        db = jnp.sqrt(dt) * jax.random.normal(sub, x.shape)
        return (x + sde.drift(a, x) * dt + sde.diff(a, x) * db, k), None

    (x_em, _), _ = jax.lax.scan(body, (x0, key), (grid[:-1], grid[1:]))
    m, v = sde.transition_params(jnp.asarray(s), jnp.asarray(t))
    np.testing.assert_allclose(float(x_em.mean()), float(m * 1.3), rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(float(x_em.var()), float(v), rtol=3e-2, atol=5e-3)


@pytest.mark.parametrize("name,make", SDES[:4], ids=[s[0] for s in SDES[:4]])
def test_transition_consistency_with_generic(name, make):
    """Specialized transition_params must agree with the generic s/σ² form."""
    sde = make()
    s, t = jnp.asarray(0.3), jnp.asarray(0.7)
    m, v = sde.transition_params(s, t)
    m_gen = sde.s(t) / sde.s(s)
    v_gen = sde.s(t) ** 2 * (sde.sigma_sq(t) - sde.sigma_sq(s))
    np.testing.assert_allclose(float(m), float(m_gen), rtol=1e-5)
    np.testing.assert_allclose(float(v), float(v_gen), rtol=1e-4)


def test_marginal_params_gauss():
    """Noised marginal of N(mu, V): loc=s·mu, var=s²(σ²+V)."""
    sde = VP()
    t = jnp.asarray(0.4)
    mu = jnp.asarray([1.0, -2.0])
    var = jnp.asarray([0.5, 2.0])
    loc, v = sde.marginal_params(t, mu, var_init=var)
    s_t = sde.s(t)
    np.testing.assert_allclose(np.asarray(loc), np.asarray(s_t * mu), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(s_t**2 * (sde.sigma_sq(t) + var)), rtol=1e-5)


@pytest.mark.parametrize("cov_kind", ["diag", "full", "eig"])
def test_marginal_score_vs_autodiff(cov_kind):
    sde = VP()
    t = jnp.asarray(0.3)
    mu = jnp.asarray([0.5, -0.5])
    if cov_kind == "diag":
        var_init = jnp.asarray([0.4, 1.2])
    elif cov_kind == "full":
        var_init = jnp.asarray([[0.8, 0.2], [0.2, 0.5]])
    else:
        cov = np.array([[0.8, 0.2], [0.2, 0.5]])
        eigval, eigvec = np.linalg.eigh(cov)
        var_init = (jnp.asarray(eigval), jnp.asarray(eigvec))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    score = sde.marginal_score(t, x, mu, var_init=var_init)
    auto = jax.grad(lambda y: sde.marginal_log_prob(t, y, mu, var_init=var_init).sum())(x)
    np.testing.assert_allclose(np.asarray(score), np.asarray(auto), rtol=1e-3, atol=1e-4)


def test_marginal_eig_matches_full():
    """(eigvals, eigvecs) marginal params must equal the dense-full path."""
    sde = VP()
    t = jnp.asarray(0.45)
    mu = jnp.asarray([0.3, -0.7, 1.0])
    cov = np.array([[1.0, 0.3, 0.1], [0.3, 0.7, 0.2], [0.1, 0.2, 0.5]])
    eigval, eigvec = np.linalg.eigh(cov)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    lp_full = sde.marginal_log_prob(t, x, mu, var_init=jnp.asarray(cov))
    lp_eig = sde.marginal_log_prob(t, x, mu, var_init=(jnp.asarray(eigval), jnp.asarray(eigvec)))
    np.testing.assert_allclose(np.asarray(lp_full), np.asarray(lp_eig), rtol=1e-4, atol=1e-4)


def test_marginal_gmm_score_vs_autodiff():
    sde = VP()
    t = jnp.asarray(0.25)
    means = jnp.asarray([[-1.0, 0.0], [1.0, 1.0]])
    variances = jnp.asarray([[0.3, 0.5], [0.2, 0.4]])
    weights = jnp.asarray([0.7, 0.3])
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 2))
    score = sde.marginal_gmm_score(t, x, means, variances, weights)
    auto = jax.grad(
        lambda y: sde.marginal_gmm_log_prob(t, y, means, variances, weights).sum())(x)
    np.testing.assert_allclose(np.asarray(score), np.asarray(auto), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("step_kind", ["ei", "ddpm"])
@pytest.mark.parametrize("name,make", [SDES[0], SDES[3]], ids=["vp", "pbm"])
def test_denoising_step_mean_map(step_kind, name, make):
    """EI/DDPM denoising steps with the exact reference score map the mean of
    the noised Gaussian reference marginal from generative time t_k onto
    t_{k+1} exactly (the variance mismatch is what the ω-weighted RND accounts
    for; full unbiasedness is verified at the loss level in test_losses.py).
    """
    sde = make()
    T = sde.terminal_t
    mu = jnp.asarray([1.0])
    var = jnp.asarray([0.3])
    t_k, t_k1 = 0.35, 0.6
    n = 200_000
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    loc, v = sde.marginal_params(jnp.asarray(T - t_k), mu, var_init=var)
    x = loc + jnp.sqrt(v) * jax.random.normal(k1, (n, 1))
    score = sde.marginal_score(jnp.asarray(T - t_k), x, mu, var_init=var)
    z = jax.random.normal(k2, (n, 1))
    step = sde.ei_integration_step if step_kind == "ei" else sde.ddpm_integration_step
    y = step(x, jnp.asarray(t_k), jnp.asarray(t_k1), score, z)
    loc1, _ = sde.marginal_params(jnp.asarray(T - t_k1), mu, var_init=var)
    np.testing.assert_allclose(float(y.mean()), float(loc1[0]), atol=3e-2)


def test_generic_ddpm_matches_vp_specialized():
    """OU._ddpm_mean_var (generic) vs the VP-stable closed form."""
    sde = VP()
    x = jnp.asarray([[0.7], [-0.3]])
    score = jnp.asarray([[0.1], [0.2]])
    z = jnp.zeros_like(x)
    t_k, t_k1 = jnp.asarray(0.4), jnp.asarray(0.6)
    from sde_sampler_lrds_tpu.sde.linear import OU

    generic = OU.ddpm_integration_step(sde, x, t_k, t_k1, score, z)
    special = sde.ddpm_integration_step(x, t_k, t_k1, score, z)
    np.testing.assert_allclose(np.asarray(generic), np.asarray(special), rtol=1e-3, atol=1e-4)
    w_generic = OU.omega_ddpm(sde, t_k, t_k1)
    w_special = sde.omega_ddpm(t_k, t_k1)
    np.testing.assert_allclose(float(w_generic), float(w_special), rtol=1e-3)


def test_log_snr_monotone_and_grid():
    sde = VP()
    ts = jnp.linspace(0.01, 0.99, 50)
    snr = sde.log_snr(ts)
    assert bool(jnp.all(jnp.diff(snr) < 0))
    grid = get_timesteps(0.01, 0.99, steps=32, sde=sde)
    assert grid.shape == (33,)
    np.testing.assert_allclose(float(grid[0]), 0.01, atol=1e-6)
    np.testing.assert_allclose(float(grid[-1]), 0.99, atol=1e-6)
    # log-SNR equispaced: equal increments
    incs = jnp.diff(sde.log_snr(grid))
    np.testing.assert_allclose(np.asarray(incs), np.asarray(incs).mean(), rtol=2e-2)


def test_time_grids():
    uni = get_timesteps(0.0, 1.0, steps=10)
    assert uni.shape == (11,)
    quad = get_timesteps(0.0, 1.0, steps=10, rescale_t="quad")
    assert quad.shape == (11,)
    assert bool(jnp.all(jnp.diff(quad) >= -1e-6))
    cos = get_timesteps(0.0, 6.4, steps=10, rescale_t="cosine")
    assert cos.shape == (12,)  # cosine grid keeps start + cumsum(K+1)
    dt_grid = get_timesteps(0.0, 1.0, dt=0.25)
    assert dt_grid.shape == (5,)
