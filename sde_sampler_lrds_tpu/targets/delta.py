"""Dirac prior (used by PIS), approximated as a narrow Gaussian.

Re-design of sde_sampler/distr/delta.py:8-31.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .gauss import Gauss


class Delta(Gauss):
    """Dirac at `loc`: log-prob of a narrow Gaussian, sampling returns loc."""

    def __init__(self, dim: int = 1, loc=0.0, approx_scale: float = 1e-3,
                 domain_scale: float = 10.0, **kwargs):
        super().__init__(dim=dim, loc=loc, scale=approx_scale,
                         domain_scale=domain_scale, **kwargs)

    def sample(self, key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
        del key
        return jnp.broadcast_to(self.loc[0], (*shape, self.dim))
