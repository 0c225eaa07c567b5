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


class EulerIntegrator:
    """Thin object wrapper matching the reference Integrator protocol
    (eq/integrator.py:80): integrate(sde, ts, x_init) -> trajectory."""

    def __init__(self, sde_steps: int | None = None):
        self.sde_steps = sde_steps

    def integrate(self, sde, key: jax.Array, ts: jnp.ndarray, x_init: jnp.ndarray,
                  timesteps: jnp.ndarray | None = None) -> jnp.ndarray:
        grid = ts if timesteps is None else timesteps
        return integrate_sde(sde, key, grid, x_init, return_traj=True)


def make_brownian_increments(key: jax.Array, ts: jnp.ndarray, shape: tuple) -> jnp.ndarray:
    """All Brownian increments for a grid at once: (K, *shape)."""
    dts = ts[1:] - ts[:-1]
    z = jax.random.normal(key, (dts.shape[0], *shape))
    return z * jnp.sqrt(dts).reshape(-1, *([1] * len(shape)))
