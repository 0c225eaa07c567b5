"""Device-resident EM for Gaussian mixtures (diag / full covariances).

TPU replacement for the sklearn GaussianMixture fit used by the reference's
benchmark pipeline (benchmark_utils.py:336). sklearn's single-core EM takes
minutes at experiment scale (e.g. 8-27 min on the phi4 40k x 100 full-cov
fit); here the E-step is one batched matmul/cholesky-solve per iteration and
the whole fit runs in a `lax.while_loop` on device in seconds.

Semantics follow sklearn: k-means++-style seeding (or `means_init`),
`reg_covar` added to covariance diagonals, convergence when the mean
log-likelihood improves by less than `tol` between iterations.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_LOG_2PI = jnp.log(2.0 * jnp.pi)


def _component_log_prob_diag(x, means, variances):
    """x (B, D), means/variances (K, D) -> (B, K)."""
    diff = x[:, None, :] - means[None]
    lp = -0.5 * jnp.sum(diff**2 / variances[None], axis=-1)
    lp -= 0.5 * jnp.sum(jnp.log(variances), axis=-1)[None]
    return lp - 0.5 * x.shape[-1] * _LOG_2PI


def _component_log_prob_full(x, means, chols):
    """x (B, D), means (K, D), chols (K, D, D) lower -> (B, K).

    Inverts each D x D Cholesky factor once (tiny triangular solve), then the
    per-sample work is one batched (B, K, D) x (K, D, D) contraction that
    rides the MXU — a 40k-row solve_triangular here is bandwidth-bound and
    ~10x slower on TPU.
    """
    d = x.shape[-1]
    inv_l = jax.vmap(lambda L: jax.scipy.linalg.solve_triangular(
        L, jnp.eye(d), lower=True))(chols)                   # (K, D, D)
    y = jnp.einsum("ked,bkd->bke", inv_l, x[:, None, :] - means[None])
    quad = jnp.sum(y * y, axis=-1)
    log_det = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chols, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * (quad + log_det[None] + d * _LOG_2PI)


@partial(jax.jit, static_argnames=("n_components", "em_type", "max_iter"))
def _em_fit(x, init_means, n_components: int, em_type: str, max_iter: int,
            tol: float, reg_covar: float):
    n, d = x.shape
    k = n_components
    var0 = x.var(axis=0) + reg_covar

    weights = jnp.full((k,), 1.0 / k)
    means = init_means
    if em_type == "full":
        covs = jnp.broadcast_to(jnp.diag(var0)[None], (k, d, d))
    else:
        covs = jnp.broadcast_to(var0[None], (k, d))

    def e_step(weights, means, covs):
        if em_type == "full":
            chols = jnp.linalg.cholesky(covs)
            lp = _component_log_prob_full(x, means, chols)
        else:
            lp = _component_log_prob_diag(x, means, covs)
        lw = lp + jnp.log(weights)[None]
        norm = jax.scipy.special.logsumexp(lw, axis=-1, keepdims=True)
        return jnp.exp(lw - norm), norm.mean()

    def m_step(resp):
        nk = resp.sum(axis=0) + 1e-10                        # (K,)
        means = (resp.T @ x) / nk[:, None]
        if em_type == "full":
            diff = x[:, None, :] - means[None]               # (B, K, D)
            covs = jnp.einsum("bk,bki,bkj->kij", resp, diff, diff) / \
                nk[:, None, None]
            covs = covs + reg_covar * jnp.eye(d)[None]
        else:
            diff2 = (x[:, None, :] - means[None]) ** 2
            covs = jnp.einsum("bk,bkd->kd", resp, diff2) / nk[:, None] \
                + reg_covar
        return nk / n, means, covs

    # one E-step per iteration; convergence on the change of the E-step
    # log-likelihood between successive iterations (sklearn's lower_bound)
    def cond(state):
        _, _, _, prev_ll, ll, it = state
        return (it < max_iter) & (jnp.abs(ll - prev_ll) > tol)

    def body(state):
        weights, means, covs, _, ll, it = state
        resp, new_ll = e_step(weights, means, covs)
        weights, means, covs = m_step(resp)
        return weights, means, covs, ll, new_ll, it + 1

    state = (weights, means, covs, -jnp.inf, jnp.inf, jnp.asarray(0))
    weights, means, covs, _, ll, n_iter = jax.lax.while_loop(cond, body, state)
    return weights, means, covs, ll, n_iter


def fit_gmm_em(n_components: int, dataset, means_init=None,
               em_type: str = "diag", max_iter: int = 1000, tol: float = 1e-3,
               reg_covar: float = 1e-6, key=None):
    """Fit a GMM by device-resident EM. Returns (weights, means, covs, ll).

    means_init defaults to k-means++-style seeding: the first mean is a
    random sample, each next mean the sample farthest (in expectation) from
    the chosen set — matching sklearn's default closely enough for these
    well-separated experiment datasets.
    """
    x = jnp.asarray(dataset, jnp.float32).reshape(-1, dataset.shape[-1])
    if key is None:
        key = jax.random.PRNGKey(0)
    if means_init is None:
        idx0 = jax.random.randint(key, (), 0, x.shape[0])
        means = [x[idx0]]
        for i in range(1, n_components):
            d2 = jnp.min(jnp.stack([
                jnp.sum((x - m[None]) ** 2, axis=-1) for m in means]), axis=0)
            key, sub = jax.random.split(key)
            probs = d2 / (d2.sum() + 1e-30)
            means.append(x[jax.random.categorical(sub, jnp.log(probs + 1e-30))])
        init_means = jnp.stack(means)
    else:
        init_means = jnp.asarray(means_init, jnp.float32)
    w, m, v, ll, _ = _em_fit(x, init_means, n_components, em_type,
                             max_iter, tol, reg_covar)
    return w, m, v, ll
