"""Particle resampling: systematic (Pallas TPU kernel + XLA fallback) and
multinomial.

The reference uses torch.multinomial inside its SMC loop
(sde_sampler/additions/ebm_mle.py:116) — the N3 native-equivalent component
of SURVEY.md §2.3. Systematic resampling is the lower-variance default here:
one uniform draw u₀, positions (i+u₀)/N, inverse-CDF lookup on the weight
cumsum. The Pallas kernel keeps the cumsum in VMEM and computes the
inverse-CDF lookup gather-free as a mask-matmul count (Mosaic does not lower
1-D dynamic gathers): idx_i = #{j : cdf_j < pos_i} = 1ᵀ·[cdfᵀ < pos], one
(N, P) compare + MXU dot per 128-wide position block. On non-TPU backends a
jnp.searchsorted fallback compiles to the same result.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# (N, 128) f32 mask per grid step must fit VMEM alongside the cdf row
_PALLAS_MAX_N = 16_384


def systematic_resample(key: jax.Array, log_weights: jnp.ndarray,
                        use_pallas: bool | None = None) -> jnp.ndarray:
    """Indices (N,) of the systematic resampling of softmax(log_weights)."""
    n = log_weights.shape[0]
    w = jax.nn.softmax(log_weights)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    positions = (jnp.arange(n, dtype=jnp.float32) + u0) / n
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    # NOTE: the selection must be static — a pallas_call that fails Mosaic
    # lowering raises at the enclosing jit's compile time, where a runtime
    # try/except cannot catch it.
    if use_pallas and 256 <= n <= _PALLAS_MAX_N and n % 128 == 0:
        return _systematic_pallas(cdf, positions)
    return jnp.clip(jnp.searchsorted(cdf, positions), 0, n - 1).astype(jnp.int32)


def multinomial_resample(key: jax.Array, log_weights: jnp.ndarray) -> jnp.ndarray:
    """Reference-equivalent multinomial resampling (ebm_mle.py:116)."""
    n = log_weights.shape[0]
    return jax.random.categorical(key, log_weights, shape=(n,))


def _systematic_pallas(cdf: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF lookup as a gather-free mask-matmul count.

    For each 128-wide block of positions: mask[j, i] = cdf_j < pos_i (an
    (N, 128) broadcast compare in VMEM), then idx = 1ᵀ·mask via one MXU dot.
    Counts ≤ N < 2²⁴ are exact in float32. searchsorted-left equivalent:
    idx_i = #{j : cdf_j < pos_i}.
    """
    from jax.experimental import pallas as pl

    n = cdf.shape[0]
    blk = 128

    def kernel(cdf_ref, pos_ref, out_ref):
        c = cdf_ref[:]                                 # (1, n)
        p = pos_ref[:]                                 # (1, blk)
        mask = (c.T < p).astype(jnp.float32)           # (n, blk)
        cnt = jnp.dot(jnp.ones((1, n), jnp.float32), mask)
        out_ref[:] = jnp.clip(cnt.astype(jnp.int32), 0, n - 1)

    out = pl.pallas_call(
        kernel,
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((1, n), lambda i: (0, 0)),
                  pl.BlockSpec((1, blk), lambda i: (0, i))],
        out_specs=pl.BlockSpec((1, blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(cdf[None], positions[None])
    return out[0]
