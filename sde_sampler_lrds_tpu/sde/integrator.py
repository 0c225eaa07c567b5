"""Euler-Maruyama SDE integration as a single fused lax.scan.

Re-design of sde_sampler/eq/integrator.py:24-129 (the reference loops in
Python and optionally wraps torchsde). Here the whole trajectory is one
``lax.scan`` whose body fuses drift evaluation, the EM update, and
counter-based Brownian sampling — the N1/N5 native-equivalent pieces of
SURVEY.md §2.3.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def integrate_sde(sde, key: jax.Array, ts: jnp.ndarray, x_init: jnp.ndarray,
                  return_traj: bool = True):
    """Integrate dX = drift dt + diff dW over the (K+1,) grid `ts`.

    Returns the trajectory stacked over times (K+1, B, D) if return_traj,
    else just the terminal state (B, D).
    """
    def body(carry, st):
        x, k = carry
        s, t = st
        k, sub = jax.random.split(k)
        dt = t - s
        db = jnp.sqrt(dt) * jax.random.normal(sub, x.shape, x.dtype)
        x_new = x + sde.drift(s, x) * dt + sde.diff(s, x) * db
        return (x_new, k), (x_new if return_traj else None)

    (x_final, _), traj = jax.lax.scan(body, (x_init, key), (ts[:-1], ts[1:]))
    if return_traj:
        return jnp.concatenate([x_init[None], traj], axis=0)
    return x_final


def interpolate_traj(traj: jnp.ndarray, grid: jnp.ndarray, out_ts: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of a (K+1, B, D) trajectory onto output times
    (reference eq/integrator.py:66)."""
    idx = jnp.clip(jnp.searchsorted(grid, out_ts, side="right") - 1, 0, grid.shape[0] - 2)
    t0 = grid[idx]
    t1 = grid[idx + 1]
    w = ((out_ts - t0) / jnp.maximum(t1 - t0, 1e-12))[:, None, None]
    return traj[idx] * (1 - w) + traj[idx + 1] * w


class EulerIntegrator:
    """Thin object wrapper matching the reference Integrator protocol
    (eq/integrator.py:80): integrate on an (optionally finer) internal grid,
    then linearly interpolate onto the requested output times."""

    def __init__(self, sde_steps: int | None = None):
        self.sde_steps = sde_steps

    def integrate(self, sde, key: jax.Array, ts: jnp.ndarray, x_init: jnp.ndarray,
                  timesteps: jnp.ndarray | None = None) -> jnp.ndarray:
        grid = ts if timesteps is None else timesteps
        if self.sde_steps is not None and self.sde_steps + 1 != grid.shape[0]:
            grid = jnp.linspace(ts[0], ts[-1], self.sde_steps + 1)
        traj = integrate_sde(sde, key, grid, x_init, return_traj=True)
        if timesteps is not None or grid.shape[0] != ts.shape[0]:
            return interpolate_traj(traj, grid, ts)
        return traj


def make_brownian_increments(key: jax.Array, ts: jnp.ndarray, shape: tuple) -> jnp.ndarray:
    """All Brownian increments for a grid at once: (K, *shape)."""
    dts = ts[1:] - ts[:-1]
    z = jax.random.normal(key, (dts.shape[0], *shape))
    return z * jnp.sqrt(dts).reshape(-1, *([1] * len(shape)))
