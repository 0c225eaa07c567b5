"""Control reparametrizations: clipping, target-informed scores, Langevin
init, prior↔target score interpolation.

Re-design of sde_sampler/models/reparam.py:18-199 as Flax wrapper modules.
External score callables (target/prior scores, SDE coefficients) are static
module attributes — they close over fixed jnp buffers and stay outside the
parameter pytree, so the trainable params are exactly the wrapped network's.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.common import clip_norm


class ClippedCtrl(nn.Module):
    """Clip the wrapped network's output to ±clip_model (reparam.py:18)."""

    base_model: nn.Module
    clip_model: float | None = None

    def clipped_base_model(self, t, x):
        return clip_norm(self.base_model(t, x), self.clip_model)

    def __call__(self, t, x):
        return self.clipped_base_model(t, x)


class ScoreCtrl(ClippedCtrl):
    """Target-informed control NN(t,x) + scale(t)·∇log ρ(x) (reparam.py:67).

    `score_model` (optional) is a small time net producing the scale; the
    target score is stop-gradiented when detach_score (the default), matching
    the reference's x.detach() path.
    """

    target_score: Callable = None
    score_model: nn.Module | None = None
    detach_score: bool = True
    scale_score: float = 1.0
    clip_score: float | None = None

    def clipped_target_score(self, t, x):
        if self.detach_score:
            x = jax.lax.stop_gradient(x)
        return clip_norm(self.target_score(x), self.clip_score)

    def clipped_score_model(self, t, x):
        return clip_norm(self.score_model(t, x), self.clip_model)

    def __call__(self, t, x):
        ctrl = self.clipped_base_model(t, x)
        score = self.scale_score * self.clipped_target_score(t, x)
        if self.score_model is not None:
            score = score * self.clipped_score_model(t, x)
        return ctrl + score


class CancelDriftCtrl(ScoreCtrl):
    """Langevin initialization: add drift/diff + ½·diff·score so the
    zero-init network starts as an annealed Langevin sampler (reparam.py:120).
    """

    sde: object = None
    use_rescaling: bool = True

    def __call__(self, t, x):
        ctrl = self.clipped_base_model(t, x)
        # column time so per-sample t broadcasts against (B, D) states
        t_sde = jnp.reshape(t, (-1, 1)) if jnp.ndim(t) > 0 else t
        sde_diff = self.sde.diff(t_sde, x)
        sde_drift = self.sde.drift(t_sde, x)
        score = self.scale_score * self.clipped_target_score(t, x)
        if self.score_model is not None:
            score = score * self.clipped_score_model(t, x)
        if self.use_rescaling:
            return ctrl + sde_drift / sde_diff + 0.5 * sde_diff * score
        return ctrl + sde_drift / jnp.square(sde_diff) + 0.5 * score


class LerpCtrl(ScoreCtrl):
    """Prior↔target score interpolation for DIS (reparam.py:148).

    Note: reparam.py:184 references `self.terminal_t` (AttributeError when
    hard_constrain=True); we use sde.terminal_t — the evident intent.
    """

    sde: object = None
    prior_score: Callable = None
    hard_constrain: bool = False
    scale_lerp: float = 1.0

    def clipped_interpolated_score(self, t, x):
        if self.detach_score:
            x = jax.lax.stop_gradient(x)
        target = self.target_score(x)
        prior = self.prior_score(x)
        u = jnp.reshape(t / self.sde.terminal_t, (-1, 1)) if jnp.ndim(t) > 0 else t / self.sde.terminal_t
        out = prior + u * (target - prior)
        return clip_norm(out, self.clip_score)

    def constrain(self, output, t):
        T = self.sde.terminal_t
        factor = 4.0 * (T - t) * t / T**2
        if jnp.ndim(t) > 0:
            factor = jnp.reshape(factor, (-1, 1))
        return output * factor

    def __call__(self, t, x):
        ctrl = self.clipped_base_model(t, x)
        if self.hard_constrain:
            ctrl = self.constrain(ctrl, t)
        score = self.scale_score * self.clipped_interpolated_score(t, x)
        if self.score_model is not None:
            sm = self.clipped_score_model(t, x)
            if self.hard_constrain:
                sm = self.constrain(sm, t)
            score = score * sm
        t_sde = jnp.reshape(t, (-1, 1)) if jnp.ndim(t) > 0 else t
        return ctrl + self.sde.diff(t_sde, x) * score


def remove_reference_ctrl(ctrl: Callable, ref_score: Callable,
                          use_rescaling: bool = True, sde=None) -> Callable:
    """Subtract the reference score from a trained control (reparam.py:46).

    Used with CancelDriftCtrl (Langevin init) under RDS so the generative
    control models only the deviation from the reference process.
    """
    if use_rescaling:
        def wrapped(t, x):
            return ctrl(t, x) - sde.diff(t, x) * ref_score(t, x)
    else:
        def wrapped(t, x):
            return ctrl(t, x) - ref_score(t, x)
    return wrapped
