"""Eval-layer tests: Sinkhorn vs exact OT, MMD/KS sanity, metric sweep on
ground-truth samples (the reference's statistical-closeness oracle,
tests/distr_eval.py:57), and the plot bundle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.eval import Sinkhorn, compute_sliced_ks, get_metrics, mmd_median
from sde_sampler_lrds_tpu.eval.plots import get_plots, save_fig
from sde_sampler_lrds_tpu.targets import Gauss, TwoModes


def test_sinkhorn_matches_exact_ot():
    """ε-annealed Sinkhorn tracks the exact assignment cost (the reference's
    stalled fixed ε=1e-3 iteration underestimates separated clouds badly)."""
    from scipy.optimize import linear_sum_assignment

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = np.asarray(jax.random.normal(k1, (400, 2)))
    y = np.asarray(jax.random.normal(k2, (400, 2))) + 3.0
    M = np.sqrt(((x[:, None] - y[None]) ** 2).sum(-1))
    r, c = linear_sum_assignment(M)
    exact = M[r, c].mean()
    d = float(Sinkhorn()(jnp.asarray(x), jnp.asarray(y)))
    assert abs(d - exact) / exact < 0.05, (d, exact)
    # identical clouds -> ~0 (reference oracle: sinkhorn(gt, gt) < 0.1)
    assert float(Sinkhorn()(jnp.asarray(x), jnp.asarray(x))) < 0.1


def test_sinkhorn_weighted_and_nmax():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (300, 2))
    y = jax.random.normal(k2, (500, 2))
    w_x = jnp.ones((300,)) / 300
    w_y = jnp.ones((500,)) / 500
    d = float(Sinkhorn()(x, y, w_x=w_x, w_y=w_y))
    assert np.isfinite(d) and d > 0
    d2 = float(Sinkhorn(n_max=200)(x, y))
    assert np.isfinite(d2)


@pytest.mark.slow
def test_sinkhorn_native_matches_xla():
    """The JIT-built C++/OpenMP host backend (eval/native, the pykeops-parity
    tier) must agree with the tiled-XLA kernel on the same inputs."""
    from sde_sampler_lrds_tpu.eval.native import load_sinkhorn_lib

    if load_sinkhorn_lib() is None:
        pytest.skip("no host C++ toolchain available")
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    x = np.asarray(jax.random.normal(k1, (300, 4)))
    y = np.asarray(jax.random.normal(k2, (450, 4))) + 1.5
    d_xla = float(Sinkhorn()(jnp.asarray(x), jnp.asarray(y)))
    d_nat = Sinkhorn(backend="native")(x, y)
    assert abs(d_nat - d_xla) / d_xla < 0.02, (d_nat, d_xla)
    # weighted + p=1 variants
    w_x = np.asarray(jax.random.dirichlet(k3, jnp.ones(300)))
    d_xla_w = float(Sinkhorn(p=1)(jnp.asarray(x), jnp.asarray(y),
                                  w_x=jnp.asarray(w_x)))
    d_nat_w = Sinkhorn(p=1, backend="native")(x, y, w_x=w_x)
    assert abs(d_nat_w - d_xla_w) / d_xla_w < 0.02, (d_nat_w, d_xla_w)
    # identical clouds -> ~0; 'auto' resolves to the native path here
    assert Sinkhorn(backend="auto")(x, x) < 0.1
    # odd p: |delta|^p, not a signed power (NaN regression)
    d3n = Sinkhorn(p=3, backend="native")(x[:100], y[:100])
    d3x = float(Sinkhorn(p=3)(jnp.asarray(x[:100]), jnp.asarray(y[:100])))
    assert np.isfinite(d3n) and np.isfinite(d3x)
    assert abs(d3n - d3x) / d3x < 0.05, (d3n, d3x)


def test_mmd_discriminates():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (256, 3))
    y_same = jax.random.normal(k2, (256, 3))
    y_diff = jax.random.normal(k3, (256, 3)) + 2.0
    assert float(mmd_median(x, y_diff)) > 3 * float(mmd_median(x, y_same))


def test_sliced_ks_discriminates():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(k1, (2048, 4))
    y_same = jax.random.normal(k2, (2048, 4))
    y_diff = jax.random.normal(k3, (2048, 4)) * 2.0
    ks_same = float(compute_sliced_ks(x, y_same))
    ks_diff = float(compute_sliced_ks(x, y_diff))
    assert ks_diff > 2 * ks_same
    assert ks_same < 0.1


@pytest.mark.slow
def test_metrics_on_ground_truth_samples():
    """Reference oracle (tests/distr_eval.py:104-126): pushing true samples
    through the metric pipeline yields near-zero errors, IS-weighted equal to
    unweighted under uniform weights, >90% of samples in domain."""
    target = TwoModes(dim=3, n_reference_samples=200_000)
    target.compute_stats(jax.random.PRNGKey(0))
    samples = target.sample(jax.random.PRNGKey(1), (100_000,))
    weights = jnp.ones((samples.shape[0],)) / samples.shape[0]
    metrics = get_metrics(target, samples, weights=weights,
                          log_norm_const_preds={"log_norm_const_is": 0.0},
                          marginal_dims=[0, 1])
    assert metrics["rel_error/square"] < 0.15
    assert metrics["rel_error/abs"] < 0.15
    assert abs(metrics["eval/square"] - metrics["eval/square_is"]) < 1e-3
    assert metrics["error/log_norm_const_is"] == 0.0
    assert metrics["eval/frac_pred_in_domain"] > 0.9
    assert metrics["eval/norm_effective_sample_size"] > 0.999
    assert metrics["error/mode_weight"] < 1.0


@pytest.mark.slow
def test_plots_bundle(tmp_path):
    target = TwoModes(dim=2, n_reference_samples=10_000)
    samples = target.sample(jax.random.PRNGKey(4), (2048,))
    ts = jnp.linspace(0, 1, 9)
    xs = jax.random.normal(jax.random.PRNGKey(5), (9, 64, 2))
    plots = get_plots(target, samples, ts=ts, xs=xs, marginal_dims=[0, 1])
    assert set(plots) >= {"plots/hist_0", "plots/hist_1", "plots/traj_0",
                          "plots/density_0_1", "plots/groundtruth_density_0_1"}
    for name, fig in plots.items():
        save_fig(fig, tmp_path / f"{name.replace('/', '_')}.png")
    assert len(list(tmp_path.glob("*.png"))) == len(plots)


def test_sinkhorn_nmax_renormalizes_weights():
    """Truncating weighted inputs must renormalize both marginals: balanced
    Sinkhorn needs equal total mass, and a truncated softmax sums < 1 by a
    side-dependent amount (the distance must match the explicitly
    renormalized call)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    x = jax.random.normal(k1, (300, 2))
    y = jax.random.normal(k2, (300, 2)) + 0.5
    w_y = jax.nn.softmax(jax.random.normal(k3, (300,)))
    d_trunc = float(Sinkhorn(n_max=200)(x, y, w_y=w_y))
    w_cut = w_y[:200] / w_y[:200].sum()
    d_explicit = float(Sinkhorn()(x[:200], y[:200], w_y=w_cut))
    assert np.isfinite(d_trunc)
    np.testing.assert_allclose(d_trunc, d_explicit, rtol=1e-5)


def test_sliced_ks_disjoint_supports_finite():
    """Fully disjoint supports: the second set's mass falls outside the
    first set's projection ranges; the KS must report ~1, not NaN (0/0)."""
    from sde_sampler_lrds_tpu.eval.ks import compute_sliced_ks

    x = jax.random.normal(jax.random.PRNGKey(0), (500, 2))
    y = x + 1e4
    ks = float(compute_sliced_ks(x, y, key=jax.random.PRNGKey(1)))
    assert np.isfinite(ks)
    assert ks > 0.9
