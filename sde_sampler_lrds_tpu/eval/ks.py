"""Sliced Kolmogorov-Smirnov distance via random 1-D projections.

Re-design of sde_sampler/additions/ks.py:9-67: project both sample sets onto
shared random unit directions, build (vectorized, batched) weighted histogram
CDFs on the first set's ranges, and report the mean maximal CDF gap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _proj_cdf(samples, projs, n_bins, min_x, max_x, weights=None):
    """CDFs of projected samples: (n_proj, n_bins)."""
    z = samples @ projs.T  # (B, P)
    z = z.T  # (P, B)
    width = (max_x - min_x) / n_bins
    idx = jnp.clip(((z - min_x[:, None]) / width[:, None]).astype(jnp.int32), 0, n_bins - 1)
    w = jnp.ones(z.shape[1]) if weights is None else jnp.reshape(weights, (-1,))
    in_range = (z >= min_x[:, None]) & (z <= max_x[:, None])
    wmat = jnp.broadcast_to(w[None, :], z.shape) * in_range
    hist = jax.vmap(lambda i, wm: jnp.zeros(n_bins).at[i].add(wm))(idx, wmat)
    # out-of-range mass is dropped and each histogram renormalized over its
    # in-range sum — the reference's torch.histogram semantics (ks.py:30-32).
    # Guard the all-out-of-range projection: a zero histogram yields a zero
    # CDF (max gap ~1 against the other set) instead of 0/0 = NaN.
    hist = hist / jnp.maximum(hist.sum(-1, keepdims=True), 1e-30)
    return jnp.cumsum(hist, axis=-1)


def compute_sliced_ks(samples1, samples2, key=None, weights=None,
                      n_random_projections: int = 128, n_bins: int = 256):
    """Mean (over projections) max CDF gap between the two sample sets."""
    if key is None:
        key = jax.random.PRNGKey(0)
    projs = jax.random.normal(key, (n_random_projections, samples1.shape[-1]))
    projs = projs / jnp.linalg.norm(projs, axis=-1, keepdims=True)
    z1 = samples1 @ projs.T
    min_x = z1.min(axis=0)
    max_x = z1.max(axis=0)
    cdf1 = _proj_cdf(samples1, projs, n_bins, min_x, max_x)
    cdf2 = _proj_cdf(samples2, projs, n_bins, min_x, max_x, weights=weights)
    return jnp.max(jnp.abs(cdf1 - cdf2), axis=-1).mean()
