"""Common utilities: results container, time grids, masked statistics.

Functional analogue of the reference's utils/common.py (Results namedtuple,
get_timesteps incl. SNR-equispaced grids via vectorized bisection,
sde_sampler/utils/common.py:9-82) — rebuilt for JAX: grids are computed once on
host (static shapes), the bisection is a vectorized fori-free loop over jnp.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax.numpy as jnp


@dataclasses.dataclass
class Results:
    """Container for one evaluation pass of a sampler.

    Mirrors the reference Results namedtuple (utils/common.py:9) with
    jnp arrays; rnd is kept as well since all weights derive from it.
    """

    samples: jnp.ndarray | None = None          # (batch, dim)
    weights: jnp.ndarray | None = None          # (batch,) normalized IS weights
    rnd: jnp.ndarray | None = None              # (batch,) density log-ratio
    log_norm_const_preds: dict = dataclasses.field(default_factory=dict)
    expectation_preds: dict = dataclasses.field(default_factory=dict)
    ts: jnp.ndarray | None = None               # (n_steps+1,)
    xs: jnp.ndarray | None = None               # (n_steps+1, batch, dim)
    metrics: dict = dataclasses.field(default_factory=dict)
    plots: dict = dataclasses.field(default_factory=dict)


# Results is a pytree so a whole evaluation pass can be the output of one
# cached jit (solvers/oc.py evaluate) — without this, loss.eval re-traces
# and recompiles the full trajectory scan on EVERY eval call (~minutes per
# call for the MNIST UNet).
import jax.tree_util as _jtu  # noqa: E402

_RESULTS_FIELDS = tuple(f.name for f in dataclasses.fields(Results))
_jtu.register_pytree_node(
    Results,
    lambda r: (tuple(getattr(r, n) for n in _RESULTS_FIELDS), None),
    lambda _, children: Results(**dict(zip(_RESULTS_FIELDS, children))),
)


def binary_search_v(
    f: Callable, low: jnp.ndarray, high: jnp.ndarray, target: jnp.ndarray, n_attempts: int = 1024
) -> jnp.ndarray:
    """Vectorized bisection: find x in [low, high] with f(x) ~= target.

    Assumes f is monotonically *decreasing* in the bracketing sense used by the
    reference (utils/common.py:18): move `low` up while f(mid) > target.
    """
    low = jnp.broadcast_to(jnp.asarray(low, dtype=jnp.float32), target.shape)
    high = jnp.broadcast_to(jnp.asarray(high, dtype=jnp.float32), target.shape)
    for _ in range(n_attempts):
        mid = 0.5 * (low + high)
        ret = f(mid)
        low = jnp.where(ret > target, mid, low)
        high = jnp.where(ret <= target, mid, high)
    return 0.5 * (low + high)


def get_timesteps(
    start: float,
    end: float,
    dt: float | None = None,
    steps: int | None = None,
    rescale_t: str | None = None,
    n_attempts: int = 256,
    sde: Any | None = None,
) -> jnp.ndarray:
    """Build a (steps+1,) time grid on [start, end].

    Grids (reference utils/common.py:30-82):
      * sde given      -> log-SNR-equispaced grid via vectorized bisection on
                          ``sde.log_snr`` (monotone decreasing in t).
      * rescale_t None -> uniform
      * 'quad'         -> sqrt of uniform grid on [start, end^2]
      * 'cosine'       -> DDS cosine-spaced increments (Vargas et al.)
    """
    if (steps is None) == (dt is None):
        raise ValueError("Exactly one of `dt` and `steps` should be defined.")
    if steps is None:
        steps = int(math.ceil((end - start) / dt))
    if sde is not None:
        log_snr_start = sde.log_snr(jnp.asarray(start, jnp.float32))
        log_snr_end = sde.log_snr(jnp.asarray(end, jnp.float32))
        if not (bool(jnp.isfinite(log_snr_start)) and bool(jnp.isfinite(log_snr_end))):
            raise ValueError("Non-finite log-SNR at the grid endpoints.")
        targets = jnp.linspace(log_snr_start, log_snr_end, steps + 1)[1:-1]
        inner = binary_search_v(sde.log_snr, start, end, targets, n_attempts=n_attempts)
        ts = jnp.concatenate(
            [jnp.asarray([start], jnp.float32), inner, jnp.asarray([end], jnp.float32)]
        )
        return jnp.sort(ts)
    if rescale_t is None:
        return jnp.linspace(start, end, steps + 1, dtype=jnp.float32)
    if rescale_t == "quad":
        grid = jnp.linspace(start, end**2, steps + 1, dtype=jnp.float32)
        return jnp.clip(jnp.sqrt(grid), max=end)
    if rescale_t == "cosine":
        # DDS cosine increments: dt_k ∝ cos^4(pi/2 * (u_k + s)/(1 + s)).
        # NOTE: returns steps+2 points (steps+1 increments plus the
        # prepended start) — verbatim reference/DDS behavior
        # (utils/common.py:63-81, itself copied from the DDS repo), kept
        # for step-count parity with the reference's DDS protocol.
        s = 0.008
        pre_phase = jnp.linspace(start, end, steps + 1, dtype=jnp.float32) / end
        phase = ((pre_phase + s) / (1 + s)) * jnp.pi * 0.5
        dts = jnp.cos(phase) ** 4
        dts = dts / dts.sum() * end
        return jnp.concatenate([jnp.asarray([start], jnp.float32), jnp.cumsum(dts)])
    raise ValueError(f"Unknown timestep rescaling method {rescale_t!r}.")


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over entries where mask is True (jit-safe replacement for x[mask].mean())."""
    count = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, x, 0.0).sum() / count


def masked_var(x: jnp.ndarray, mask: jnp.ndarray, ddof: int = 1) -> jnp.ndarray:
    """Unbiased variance over masked entries (matches torch.var default ddof=1)."""
    count = jnp.maximum(mask.sum(), 1)
    mean = jnp.where(mask, x, 0.0).sum() / count
    sq = jnp.where(mask, (x - mean) ** 2, 0.0).sum()
    return sq / jnp.maximum(count - ddof, 1)


def normalized_ess(log_w: jnp.ndarray) -> jnp.ndarray:
    """Normalized effective sample size of (unnormalized) log importance
    weights: exp(2·lse(w) − lse(2w)) / n ∈ (0, 1]. The single definition
    used by forward-ESS diagnostics, checkpoint selection, and tests."""
    from jax.scipy.special import logsumexp

    n = log_w.shape[0]
    return jnp.exp(2.0 * logsumexp(log_w) - logsumexp(2.0 * log_w)) / n


def clip_norm(x: jnp.ndarray, max_norm: float | None) -> jnp.ndarray:
    """Elementwise clip to [-max_norm, max_norm] (reference clip_and_log, common.py:85)."""
    if max_norm is None:
        return x
    return jnp.clip(x, -max_norm, max_norm)
