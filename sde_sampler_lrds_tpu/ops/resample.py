"""Particle resampling: systematic (Pallas TPU kernel + XLA fallback) and
multinomial.

The reference uses torch.multinomial inside its SMC loop
(sde_sampler/additions/ebm_mle.py:116) — the N3 native-equivalent component
of SURVEY.md §2.3. Systematic resampling is the lower-variance default here:
one uniform draw u₀, positions (i+u₀)/N, inverse-CDF lookup on the weight
cumsum. The Pallas kernel keeps the cumsum in VMEM and binary-searches all
lanes in lock-step (log₂N vectorized steps on the VPU); on non-TPU backends
a jnp.searchsorted fallback compiles to the same result.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


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
    if use_pallas and n >= 256 and (n & (n - 1)) == 0:
        try:
            return _systematic_pallas(cdf, positions)
        except Exception:  # pragma: no cover - fallback on kernel issues
            pass
    return jnp.clip(jnp.searchsorted(cdf, positions), 0, n - 1).astype(jnp.int32)


def multinomial_resample(key: jax.Array, log_weights: jnp.ndarray) -> jnp.ndarray:
    """Reference-equivalent multinomial resampling (ebm_mle.py:116)."""
    n = log_weights.shape[0]
    return jax.random.categorical(key, log_weights, shape=(n,))


def _systematic_pallas(cdf: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """Binary search of `positions` into `cdf`, fully vectorized in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = cdf.shape[0]
    n_iter = int(math.ceil(math.log2(n))) + 1  # width-1 interval needs a final probe

    def kernel(cdf_ref, pos_ref, out_ref):
        cdf_v = cdf_ref[:]
        pos = pos_ref[:]
        lo = jnp.zeros_like(pos, dtype=jnp.int32)
        hi = jnp.full_like(lo, n)

        def body(_, lohi):
            lo, hi = lohi
            active = lo < hi  # converged lanes must not move again
            mid = (lo + hi) // 2
            val = jnp.take(cdf_v, jnp.clip(mid, 0, n - 1), axis=0)
            go_right = val < pos
            new_lo = jnp.where(go_right, mid + 1, lo)
            new_hi = jnp.where(go_right, hi, mid)
            return jnp.where(active, new_lo, lo), jnp.where(active, new_hi, hi)

        lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
        out_ref[:] = jnp.clip(lo, 0, n - 1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(cdf, positions)
