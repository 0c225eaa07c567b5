"""Langevin-type SDEs (plain and tempering-path controlled).

Re-design of sde_sampler/eq/sdes.py:46-114. These carry a score callable, a
constant diffusion coefficient, and an optional score clip; drift/diff are
pure jittable functions.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..utils.common import clip_norm


class LangevinSDE:
    """dX = (g²/2)·∇log π(X) dt + g dW (eq/sdes.py:46)."""

    def __init__(self, target_score: Callable, diff_coeff: float = 1.0,
                 clip_score: float | None = None, terminal_t: float = 1.0):
        self.target_score = target_score
        self.diff_coeff = float(diff_coeff)
        self.clip_score = clip_score
        self.terminal_t = float(terminal_t)

    def drift(self, t, x):
        drift = self.target_score(x) * self.diff_coeff**2 / 2.0
        return clip_norm(drift, self.clip_score)

    def diff(self, t, x=None):
        return jnp.asarray(self.diff_coeff, jnp.float32)


class ControlledLangevinSDE:
    """Langevin SDE along the geometric tempering path
    (t/T)·logπ + (1-t/T)·logp₀ (eq/sdes.py:78, used by CMCD)."""

    def __init__(self, target_score: Callable, prior_score: Callable,
                 diff_coeff: float = 1.0, terminal_t: float = 1.0,
                 clip_score: float | None = None):
        self.target_score = target_score
        self.prior_score = prior_score
        self.diff_coeff = float(diff_coeff)
        self.terminal_t = float(terminal_t)
        self.clip_score = clip_score

    def drift(self, t, x):
        u = t / self.terminal_t
        drift = self.target_score(x) * u + self.prior_score(x) * (1.0 - u)
        drift = drift * (0.5 * self.diff_coeff**2)
        return clip_norm(drift, self.clip_score)

    def diff(self, t, x=None):
        return jnp.asarray(self.diff_coeff, jnp.float32)


class ControlledSDE:
    """Base SDE plus g·ctrl(T-t, x) drift correction (eq/sdes.py:681)."""

    def __init__(self, sde, ctrl: Callable | None):
        self.sde = sde
        self.ctrl = ctrl
        self.terminal_t = sde.terminal_t

    def drift(self, t, x):
        d = self.sde.drift(t, x)
        if self.ctrl is not None:
            d = d + self.sde.diff(t, x) * self.ctrl(self.terminal_t - t, x)
        return d

    def diff(self, t, x=None):
        return self.sde.diff(t, x)
