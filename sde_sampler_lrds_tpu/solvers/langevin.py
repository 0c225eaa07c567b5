"""Unlearned ULA baseline solver.

Re-design of sde_sampler/solver/langevin.py:15-66: integrate the Langevin SDE
from the prior with the fused scan integrator, discard a burn-in prefix, and
report expectation predictions over the pooled post-burn-in samples.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ..sde.integrator import integrate_sde
from ..sde.langevin import LangevinSDE
from ..targets.base import EXPECTATION_FNS
from ..utils.common import Results
from .base import Solver


class LangevinSolver(Solver):
    def __init__(self, target, prior, sde: LangevinSDE | None = None,
                 eval_ts=None, eval_batch_size: int = 6000,
                 burn_steps: int = 0, diff_coeff: float = 1.0,
                 clip_score: float | None = None, **kwargs):
        super().__init__(target, **kwargs)
        self.prior = prior
        self.sde = sde if sde is not None else LangevinSDE(
            target_score=target.score, diff_coeff=diff_coeff, clip_score=clip_score)
        self.eval_ts = eval_ts
        self.eval_batch_size = eval_batch_size
        if burn_steps >= len(eval_ts):
            raise ValueError("Specify more eval_steps than burn_steps.")
        self.burn_steps = burn_steps

    def run(self, key: jax.Array | None = None) -> Results:
        key = key if key is not None else jax.random.PRNGKey(0)
        k_prior, k_sim = jax.random.split(key)
        start = time.time()
        x = self.prior.sample(k_prior, (self.eval_batch_size,))
        xs = integrate_sde(self.sde, k_sim, self.eval_ts, x, return_traj=True)
        metrics = {"eval/sample_time": time.time() - start}
        pooled = xs[self.burn_steps:].reshape(-1, self.target.dim)
        expectation_preds = {
            name: float(fn(pooled).mean()) for name, fn in EXPECTATION_FNS.items()
        }
        return Results(samples=xs[-1], weights=None, ts=self.eval_ts, xs=xs,
                       metrics=metrics, expectation_preds=expectation_preds)
