"""Median-heuristic Gaussian-kernel Maximum Mean Discrepancy.

Re-design of sde_sampler/additions/mmd.py:25-54: pairwise squared distances
via Gram matrices (MXU matmuls), bandwidth = median over all pairwise
distances, unbiased MMD² estimate with sqrt clamp.
"""
from __future__ import annotations

import jax.numpy as jnp


def _sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ra = (a**2).sum(-1)[:, None]
    rb = (b**2).sum(-1)[None, :]
    return ra + rb - 2.0 * a @ b.T


def mmd_median(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    n, m = x.shape[0], y.shape[0]
    assert n == m and n >= 2
    d_xx = _sq_dists(x, x)
    d_yy = _sq_dists(y, y)
    d_xy = _sq_dists(x, y)
    iu = jnp.triu_indices(n, k=1)
    bandwidth_sq = jnp.median(jnp.concatenate(
        [d_xx[iu], d_yy[iu], d_xy.reshape(-1)]))
    k_xx = jnp.exp(-d_xx / (2 * bandwidth_sq))
    k_yy = jnp.exp(-d_yy / (2 * bandwidth_sq))
    k_xy = jnp.exp(-d_xy / (2 * bandwidth_sq))
    mmd = (k_xx.sum() - n) / (n * (n - 1))
    mmd += (k_yy.sum() - m) / (m * (m - 1))
    mmd -= 2.0 * k_xy.mean()
    return jnp.sqrt(jnp.maximum(1e-20, mmd))
