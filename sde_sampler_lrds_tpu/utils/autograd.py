"""Divergence estimators via forward-mode JVPs.

Re-design of sde_sampler/utils/autograd.py:14-105: the exact divergence is a
sum of D basis-vector JVPs (vmapped, one forward trace — no Python autograd
loop), and the Hutchinson estimator is a single JVP against a Rademacher or
Gaussian probe.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def compute_divx(
    f: Callable,
    t: jnp.ndarray,
    x: jnp.ndarray,
    key: jax.Array | None = None,
    noise_type: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Divergence of x ↦ f(t, x) plus the function value.

    noise_type None -> exact (vmapped basis JVPs, cost D forward passes);
    'rademacher'/'gaussian' -> Hutchinson single-probe estimate.

    Returns (div (B,1), f(t,x) (B,D)) matching the reference contract
    (utils/autograd.py:81-105).
    """
    g = lambda y: f(t, y)
    if noise_type is None:
        dim = x.shape[-1]
        eye = jnp.eye(dim, dtype=x.dtype)

        def one_dir(e):
            out, jv = jax.jvp(g, (x,), (jnp.broadcast_to(e, x.shape),))
            return out, jnp.sum(jv * e, axis=-1)

        outs, divs = jax.vmap(one_dir)(eye)
        return divs.sum(axis=0)[:, None], outs[0]
    if key is None:
        raise ValueError("Hutchinson estimators require a PRNG key.")
    if noise_type == "rademacher":
        probe = jax.random.rademacher(key, x.shape, dtype=x.dtype)
    elif noise_type in ("gaussian", "gauss"):
        probe = jax.random.normal(key, x.shape, dtype=x.dtype)
    else:
        raise ValueError(f"Unknown noise type {noise_type!r}.")
    out, jv = jax.jvp(g, (x,), (probe,))
    return jnp.sum(jv * probe, axis=-1, keepdims=True), out


def compute_gradx(f: Callable, t: jnp.ndarray, x: jnp.ndarray, **kwargs):
    """(∇ₓ Σf, f) for a scalar-per-sample f (utils/autograd.py:67)."""
    vals = f(t, x, **kwargs)
    grad = jax.grad(lambda y: jnp.sum(f(t, y, **kwargs)))(x)
    return grad, vals
