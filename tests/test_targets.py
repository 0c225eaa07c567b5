"""Target-layer oracle tests.

Two oracle patterns from the reference test strategy (SURVEY.md §4):
  1. analytic score vs autodiff of unnorm_log_prob (self-consistency);
  2. ground-truth samples pushed through moments match analytic expectations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.targets import (
    GMM,
    BracketTwoModes,
    Checkerboard,
    Delta,
    Gauss,
    GaussFull,
    GMMFull,
    IsotropicGauss,
    LogisticRegression,
    ManyModes,
    PhiFour,
    Rings,
    TwoModes,
    TwoModesFull,
)
from sde_sampler_lrds_tpu.targets.base import sample_uniform


def autodiff_score(target, x):
    return jax.grad(lambda y: target.unnorm_log_prob(y).sum())(x)


DISTRS = [
    ("gauss", lambda: Gauss(dim=3, loc=1.0, scale=2.0)),
    ("gauss_full", lambda: GaussFull(
        dim=2, loc=jnp.array([0.5, -0.5]),
        cov=jnp.array([[1.0, 0.3], [0.3, 0.5]]))),
    ("iso", lambda: IsotropicGauss(dim=4, loc=0.5, scale=1.5)),
    ("gmm", lambda: GMM(name="dist", dim=2)),
    ("two_modes", lambda: TwoModes(dim=5, ill_conditioned="medium")),
    ("two_modes_full", lambda: TwoModesFull(dim=4)),
    ("bracket", lambda: BracketTwoModes(dim=3)),
    ("many_modes", lambda: ManyModes(n_modes=4, dim=3)),
    ("rings", lambda: Rings()),
    ("phi_four", lambda: PhiFour(a=0.1, b=0.0, dim=16)),
    ("logreg", lambda: LogisticRegression(data_type="ionosphere")),
]


@pytest.mark.parametrize("name,make", DISTRS, ids=[d[0] for d in DISTRS])
def test_score_matches_autodiff(name, make):
    distr = make()
    key = jax.random.PRNGKey(0)
    x = sample_uniform(key, distr.domain, 64)
    if name == "rings":  # avoid the origin where score is singular
        x = x + jnp.where(jnp.abs(x) < 0.3, 0.5, 0.0)
    if name == "logreg":  # stay where the likelihood is not clipped/saturated
        x = 0.1 * jax.random.normal(key, (64, distr.dim))
    analytic = distr.score(x)
    auto = autodiff_score(distr, x)
    np.testing.assert_allclose(np.asarray(analytic), np.asarray(auto), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("name,make", DISTRS[:8], ids=[d[0] for d in DISTRS[:8]])
def test_log_prob_shapes(name, make):
    distr = make()
    x = sample_uniform(jax.random.PRNGKey(1), distr.domain, 7)
    assert distr.unnorm_log_prob(x).shape == (7,)
    assert distr.score(x).shape == x.shape


def test_gauss_log_prob_value():
    g = Gauss(dim=2, loc=0.0, scale=1.0)
    x = jnp.zeros((1, 2))
    expected = -jnp.log(2 * jnp.pi)
    np.testing.assert_allclose(float(g.log_prob(x)[0]), float(expected), rtol=1e-6)


def test_gmm_sampling_moments():
    tm = TwoModes(dim=2)
    samples = tm.sample(jax.random.PRNGKey(0), (100_000,))
    # mean = (2/3)(-a) + (1/3)(a) = -a/3 with a=1
    np.testing.assert_allclose(np.asarray(samples.mean(0)), [-1 / 3, -1 / 3], atol=0.02)
    # mode weight ~ 2/3
    mw = tm.compute_mode_weight(samples)
    assert abs(float(mw) - 100 * 2 / 3) < 1.0


def test_gmm_full_matches_diag():
    """A GMMFull with diagonal covariances must agree with the diagonal GMM."""
    loc = jnp.array([[-1.0, 0.5], [1.0, -0.5]])
    scale = jnp.array([[0.5, 0.8], [0.3, 0.6]])
    w = jnp.array([2.0, 1.0])
    diag = GMM(dim=2, loc=loc, scale=scale, mixture_weights=w)
    cov = jax.vmap(jnp.diag)(scale**2)
    full = GMMFull(dim=2, loc=loc, cov=cov, mixture_weights=w)
    x = jax.random.normal(jax.random.PRNGKey(2), (32, 2)) * 2
    np.testing.assert_allclose(
        np.asarray(diag.unnorm_log_prob(x)), np.asarray(full.unnorm_log_prob(x)), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(diag.score(x)), np.asarray(full.score(x)), rtol=1e-3, atol=1e-4
    )


def test_delta_sample():
    d = Delta(dim=3, loc=2.0)
    s = d.sample(jax.random.PRNGKey(0), (5,))
    assert s.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(s), 2.0)


def test_checkerboard():
    cb = Checkerboard()
    s = cb.sample(jax.random.PRNGKey(0), (10_000,))
    lp = cb.unnorm_log_prob(s)
    assert bool(jnp.all(jnp.isfinite(lp)))
    # samples outside the board have huge negative log-prob
    out = cb.unnorm_log_prob(jnp.array([[-3.0, 3.0]]))
    assert float(out[0]) < -100
    assert cb.score(s).shape == s.shape


def test_rings_sampling_and_density():
    rings = Rings()
    s = rings.sample(jax.random.PRNGKey(0), (50_000,))
    r = jnp.linalg.norm(s, axis=-1)
    # radii concentrate near 1, 3, 5
    assert float(jnp.abs(jnp.stack([jnp.abs(r - c).min() for c in [1.0, 3.0, 5.0]]).max())) < 0.5
    counts = rings.compute_mode_count(s)
    probs = np.asarray(counts / counts.sum())
    np.testing.assert_allclose(probs, np.asarray(rings._probs), atol=0.02)


def test_phi_four_grad():
    pf = PhiFour(a=0.1, b=0.0, dim=8)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    np.testing.assert_allclose(
        np.asarray(pf.grad_U(x)),
        np.asarray(jax.grad(lambda y: pf.U(y).sum())(x)),
        rtol=1e-4, atol=1e-5,
    )


def test_compute_stats_gauss():
    g = Gauss(dim=2, loc=0.0, scale=1.0, n_reference_samples=100_000)
    g.compute_stats(jax.random.PRNGKey(0))
    # E[sum x_i^2] = dim
    assert abs(g.expectations["square"] - 2.0) < 0.05
    assert abs(g.expectations["sum"]) < 0.05


@pytest.mark.slow
def test_logreg_log_prob_stable_at_confident_logits():
    """Regression: clipping sigmoid in probability space NaNs in float32
    (1-1e-8 rounds to 1.0, then (1-y)*log1p(-1) = 0*(-inf) = NaN) for
    |logits| > ~17 — samples a diffusion eval pass routinely visits. The
    stable log-sigmoid form must stay finite in value AND gradient."""
    lr = LogisticRegression(data_type="ionosphere")
    key = jax.random.PRNGKey(3)
    # large weights -> confident logits well past the f32 saturation point
    x = 8.0 * jax.random.normal(key, (32, lr.dim))
    lp = lr.unnorm_log_prob(x)
    assert bool(jnp.isfinite(lp).all()), np.asarray(lp)
    g = jax.vmap(jax.grad(lambda v: lr.unnorm_log_prob(v[None])[0]))(x)
    assert bool(jnp.isfinite(g).all())
    # matches the naive clipped-probability form where that form is exact
    x_small = 0.05 * jax.random.normal(key, (32, lr.dim))
    w, b = x_small[:, :-1], x_small[:, -1]
    logits = w @ lr.X_train.T + b[:, None]
    probs = jnp.clip(jax.nn.sigmoid(logits), 1e-8, 1 - 1e-8)
    naive_ll = jnp.sum(lr.y_train[None] * jnp.log(probs)
                       + (1 - lr.y_train[None]) * jnp.log1p(-probs), axis=-1)
    stable_ll = lr.unnorm_log_prob(x_small) - (
        -0.5 * jnp.sum(w**2, axis=-1) / lr.weight_scale**2
        - 0.5 * w.shape[-1] * np.log(2 * np.pi * lr.weight_scale**2)
        - 0.5 * (b - lr.intercept_mean) ** 2 / lr.intercept_scale**2
        - 0.5 * np.log(2 * np.pi * lr.intercept_scale**2))
    np.testing.assert_allclose(np.asarray(stable_ll), np.asarray(naive_ll),
                               rtol=1e-5, atol=1e-4)


def test_phi_four_rb_weight_immune_to_sample_balance():
    """The Z2-antithetic Rao-Blackwellized weight must recover the
    quadrature truth regardless of the sample set's own well balance,
    while the indicator estimator just reports that balance."""
    pf = PhiFour(a=0.5, b=0.05, dim=2, grid_points=129**2)
    # quadrature truth: P(center site < 0) / P(center site > 0)
    from sde_sampler_lrds_tpu.targets.base import boole_grid
    pts, qw = boole_grid(pf.domain, 129**2)
    lw = pf.unnorm_log_prob(pts) + jnp.log(qw)
    w = jnp.exp(lw - jax.scipy.special.logsumexp(lw))
    neg = pts[:, pf.dim // 2] < 0
    truth = float(w[neg].sum() / w[~neg].sum())
    # MALA-free synthetic proposal: Laplace-shaped Gaussians at the two
    # true minima (gradient flow + Hessian covariance — the within-well
    # shape a decent sampler achieves), deliberately mis-balanced 90/10
    # (truth balance is ~52/48)
    from sde_sampler_lrds_tpu.targets.base import run_gdflow
    x_min = run_gdflow(pf.grad_U, jnp.stack([jnp.ones(2), -jnp.ones(2)]),
                       10000, 5e-3)
    cov_chol = jnp.linalg.cholesky(jnp.linalg.inv(pf.hessian(x_min[0])))
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x_pos = x_min[0] + jax.random.normal(k1, (9000, 2)) @ cov_chol.T
    x_neg = x_min[1] + jax.random.normal(k2, (1000, 2)) @ cov_chol.T
    samples = jnp.concatenate([x_pos, x_neg])
    raw = float(pf.compute_phi_four_weight(samples))
    rb = float(pf.compute_phi_four_weight_rb(samples))
    assert abs(raw - truth) > 0.5          # indicator inherits the 90/10
    assert abs(rb - truth) < 0.12 * truth  # RB estimate lands on truth


def test_phi_four_rb_weight_ignores_diverged_samples():
    """Diverged trajectories overflow U to inf on both pair members; the RB
    weight must drop them instead of returning NaN."""
    pf = PhiFour(a=0.1, b=0.02, dim=8)
    key = jax.random.PRNGKey(1)
    good = 0.8 * jnp.sign(jax.random.normal(key, (64, 1))) + \
        0.1 * jax.random.normal(key, (64, 8))
    bad = jnp.full((8, 8), 1e30)
    w = float(pf.compute_phi_four_weight_rb(jnp.concatenate([good, bad])))
    w_good = float(pf.compute_phi_four_weight_rb(good))
    assert np.isfinite(w)
    np.testing.assert_allclose(w, w_good, rtol=1e-6)


def test_phi_four_transfer_matrix_matches_quadrature():
    """The exact transfer-matrix oracle must agree with dense 2-d Boole
    quadrature on weight AND log Z. The Laplace oracle does not at THIS
    tiny dim (genuinely ~16% high from well anharmonicity) — at the paper's
    dim=100 the corrected Laplace agrees to 0.12% (see
    test_phi_four_laplace_matches_transfer_matrix); the old dim-100
    '1.348' figure was a Hessian bug, not a Laplace property."""
    pf = PhiFour(a=0.1, b=0.02, dim=2, grid_points=257**2)
    from sde_sampler_lrds_tpu.targets.base import boole_grid
    pts, qw = boole_grid(pf.domain, 257**2)
    lw = pf.unnorm_log_prob(pts) + jnp.log(qw)
    logz_quad = float(jax.scipy.special.logsumexp(lw))
    w = jnp.exp(lw - logz_quad)
    neg = pts[:, pf.dim // 2] < 0
    truth = float(w[neg].sum() / w[~neg].sum())
    w_tm = pf.compute_stats_transfer_matrix()
    assert abs(w_tm - truth) < 0.01 * truth
    # logZ on the SAME ±1.5 support as the box quadrature must agree tightly;
    # the full ±3 support holds ~2% more tail mass (quadrature clips it)
    pf_box = PhiFour(a=0.1, b=0.02, dim=2)
    pf_box.compute_stats_transfer_matrix(grid_limit=1.5)
    assert abs(pf_box.log_norm_const - logz_quad) < 0.005
    assert pf.log_norm_const > logz_quad
    pf2 = PhiFour(a=0.1, b=0.02, dim=2)
    pf2.compute_stats_integration()  # also runs the TM oracle now
    lap = pf2.expectations["true_weight_cor"]
    assert abs(lap - truth) > 0.10 * truth  # Laplace really is off
    assert pf2.expectations["weight"] == pytest.approx(w_tm, rel=1e-6)


def test_phi_four_exact_sampler_matches_oracle():
    """FFBS samples: raw and RB weight estimates must land on the
    transfer-matrix truth, and site marginals must have the exact moments."""
    pf = PhiFour(a=0.1, b=0.02, dim=6)
    truth = pf.compute_stats_transfer_matrix()
    s = pf.sample(jax.random.PRNGKey(0), (20000,))
    assert s.shape == (20000, 6)
    raw = float(pf.compute_phi_four_weight(s))
    rb = float(pf.compute_phi_four_weight_rb(s))
    assert abs(raw - truth) < 0.06 * truth   # MC error at n=20000
    assert abs(rb - truth) < 0.02 * truth    # RB variance is far smaller


def test_phi_four_tm_weight_symmetric_at_b_zero():
    """b = 0 makes the chain exactly Z2-symmetric: the transfer-matrix
    weight must be 1 to numerical precision."""
    pf = PhiFour(a=0.1, b=0.0, dim=24)
    assert pf.compute_stats_transfer_matrix() == pytest.approx(1.0, abs=1e-9)


def test_phi_four_hessian_matches_autodiff():
    """hessian == jax.hessian of U (the diagonal is 2*coef + local term:
    each site sits in two Dirichlet bonds; a 3*coef diagonal once skewed
    the Laplace oracle ~26% high)."""
    pf = PhiFour(a=0.1, b=0.02, dim=8)
    x = 0.6 * jnp.ones(8)
    h_auto = jax.hessian(lambda y: pf.U(y[None])[0])(x)
    np.testing.assert_allclose(np.asarray(pf.hessian(x)),
                               np.asarray(h_auto), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_phi_four_laplace_matches_transfer_matrix():
    """With the corrected Hessian, the Laplace-corrected weight lands
    within ~0.2% of the exact transfer-matrix value (1.0733 at the paper
    protocol) — the two independent oracles agree."""
    pf = PhiFour(a=0.1, b=0.02, dim=100)
    pf.compute_stats_integration()
    lap = pf.expectations["true_weight_cor"]
    exact = pf.compute_stats_transfer_matrix()
    assert abs(lap / exact - 1.0) < 5e-3


def test_checkerboard_metrics_aligned_any_width():
    """Exact samples give ~zero kl/tv for every width — squares are counted
    in _probs order directly (the old (4,width)-histogram parity mask
    mis-paired squares for width = 2 mod 4)."""
    for width in (4, 6):
        cb = Checkerboard(width=width)
        s = cb.sample(jax.random.PRNGKey(0), (100_000,))
        counts = cb.compute_mode_count(s)
        assert counts.shape == (cb.n_mixtures,)
        assert float(cb.kl_weights(s, counts=counts)) < 5e-3
        assert float(cb.tv_weights(s, counts=counts)) < 0.05
        assert float(cb.compute_forgotten_modes(s, counts=counts)) == 0.0


def test_entropy_finite_with_empty_modes():
    """A sampler that misses modes entirely must report low entropy, not
    NaN (0*log0 = 0 by the xlogy convention; the reference NaNs here)."""
    gmm = GMM(dim=2, name="grid", n_reference_samples=1000)
    only_one_mode = jnp.tile(gmm.loc[:1], (500, 1))
    e = float(gmm.entropy(only_one_mode))
    assert np.isfinite(e) and e < 0.05
    cb = Checkerboard()
    corner = jnp.tile(cb.loc[:1], (500, 1))
    assert np.isfinite(float(cb.entropy(corner)))
