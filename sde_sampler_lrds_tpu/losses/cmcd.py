"""Discrete-time CMCD loss (Controlled Monte Carlo Diffusion).

Re-design of sde_sampler/losses/oc.py:654-894: annealed Langevin forward
kernel corrected by a learned control; the per-step cost evaluates the drift
and control at BOTH ends of the step,

  cost = (f(s,x)+f(t,y))/g + u(s,x) − u(t,y),
  rnd += ½‖cost‖²dt + cost·(ū−u)dt + cost·dB,

with initial cost log p₀(x) (eval) and terminal −log ρ(x_T). Volatility is
constant (the annealed-Langevin SDE), one lax.scan per simulation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import BaseOCLoss, compute_results, flat_ctrl_eval


class ControlledLangevinSDELoss(BaseOCLoss):
    def __init__(self, *args, use_rescaling: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.use_rescaling = use_rescaling

    def _rescale(self, u, sde_diff):
        return u if self.use_rescaling else u * (0.5 * sde_diff)

    def simulate(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                 initial_log_prob=None, train: bool = True,
                 change_sde_ctrl: bool = False, return_traj: bool = False,
                 noise: jnp.ndarray | None = None):
        sde_diff = self.sde.diff_coeff  # constant volatility by construction

        def body(carry, st):
            x, rnd, k = carry
            if noise is not None:
                *st, z_in = st
            s, t, dt, sqdt = st
            k, k_db, k_ctrl = jax.random.split(k, 3)
            u_s = ctrl(s, x)
            sde_ctrl = self._sde_ctrl(u_s, k_ctrl, s, x) if change_sde_ctrl else u_s
            u_s = self._rescale(u_s, sde_diff)
            sde_ctrl = self._rescale(sde_ctrl, sde_diff)
            db = sqdt * (z_in if noise is not None
                         else jax.random.normal(k_db, x.shape))
            drift_s = self.sde.drift(s, x)
            y = x + (drift_s + sde_ctrl * sde_diff) * dt + sde_diff * db
            drift_t = self.sde.drift(t, y)
            u_t = self._rescale(ctrl(t, y), sde_diff)
            cost = (drift_s + drift_t) / sde_diff + u_s - u_t
            rnd = rnd + 0.5 * jnp.sum(cost**2, axis=-1) * dt
            rnd = rnd + jnp.sum(cost * (sde_ctrl - u_s), axis=-1) * dt
            rnd = rnd + jnp.sum(cost * db, axis=-1)
            return (y, rnd, k), (y if return_traj else None)

        if train and self.method in ("kl", "kl_ito"):
            rnd0 = jnp.zeros((x.shape[0],), x.dtype)
        else:
            rnd0 = initial_log_prob(x)
        dt_arr = ts[1:] - ts[:-1]
        xs_in = (ts[:-1], ts[1:], dt_arr, jnp.sqrt(dt_arr))
        if noise is not None:
            xs_in = (*xs_in, noise)
        (x_T, rnd, _), traj = self._scan(body, (x, rnd0, key), xs_in)
        rnd = rnd - terminal_unnorm_log_prob(x_T)
        xs = jnp.concatenate([x[None], traj], axis=0) if return_traj else None
        return x_T, rnd, xs

    def __call__(self, key, ts, x, ctrl, terminal_unnorm_log_prob, initial_log_prob=None):
        x = self.repeat_traj(x)
        samples, rnd, _ = self.simulate(
            key, ts, x, ctrl, terminal_unnorm_log_prob,
            initial_log_prob=initial_log_prob, train=True,
            change_sde_ctrl=self.is_lv, return_traj=False)
        return self.reduce(rnd, samples=samples)

    # -- flat LV training path ---------------------------------------------
    def supports_flat_lv(self, ts, call_args: frozenset) -> bool:
        # LV's rnd0 = initial_log_prob(x0), so both args must be wired
        return call_args == frozenset({"terminal_unnorm_log_prob",
                                       "initial_log_prob"})

    def lv_flat_call(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                     initial_log_prob=None, traj_fn=None):
        """LV training as gradient-free simulation + flat batched cost.

        The LV simulation control is detached, so the trajectory x_0..x_T
        carries no parameter gradient — only the per-step cost does, and
        CMCD's cost evaluates the control at BOTH step endpoints
        (losses/oc.py:714-742), i.e. at the K+1 states x_0..x_T. This
        method simulates under stop_gradient and differentiates ONE batched
        control evaluation over all (K+1)·B states: same value and gradient
        as ``__call__`` under common noise (tests/test_fused_traj.py), with
        half the control evaluations (the scan computes u(t, x_{k+1}) again
        as u(s, x_{k+1}) in step k+1) and no backprop-through-scan.
        ``traj_fn`` is accepted for solver-interface parity but unused —
        the fused Pallas kernel does not cover the Langevin step."""
        del traj_fn
        x, k_sim, zs = self._flat_lv_setup(key, ts, x)
        _, _, xs_all = self.simulate(
            k_sim, ts, x, ctrl, terminal_unnorm_log_prob,
            initial_log_prob=initial_log_prob, train=True,
            change_sde_ctrl=True, return_traj=True, noise=zs)
        xs_all = jax.lax.stop_gradient(xs_all)                 # (K+1, B, D)
        sde_diff = self.sde.diff_coeff
        dt = (ts[1:] - ts[:-1])[:, None]                       # (K, 1)
        db = jnp.sqrt(dt)[..., None] * zs                      # (K, B, D)
        u_all = self._rescale(flat_ctrl_eval(ctrl, ts, xs_all), sde_diff)
        drift_all = jax.vmap(self.sde.drift)(ts, xs_all)
        u_s, u_t = u_all[:-1], u_all[1:]
        cost = (drift_all[:-1] + drift_all[1:]) / sde_diff + u_s - u_t
        u_bar = jax.lax.stop_gradient(u_s)
        steps = (0.5 * jnp.sum(cost**2, axis=-1) * dt
                 + jnp.sum(cost * (u_bar - u_s), axis=-1) * dt
                 + jnp.sum(cost * db, axis=-1))                # (K, B)
        rnd = initial_log_prob(xs_all[0]) + jnp.sum(steps, axis=0) \
            - terminal_unnorm_log_prob(xs_all[-1])
        return self.reduce(rnd, samples=xs_all[-1])

    def eval(self, key, ts, x, ctrl, terminal_unnorm_log_prob, initial_log_prob=None,
             compute_weights: bool = True, return_traj: bool = True):
        samples, rnd, xs = self.simulate(
            key, ts, x, ctrl, terminal_unnorm_log_prob,
            initial_log_prob=initial_log_prob, train=False, return_traj=return_traj)
        return compute_results(rnd, compute_weights=compute_weights, ts=ts,
                               max_rnd=self.max_rnd, samples=samples, xs=xs)

    def compute_eubo(self, key, ts, x, ctrl, terminal_unnorm_log_prob, initial_log_prob=None):
        """Reverse pass from true target samples (losses/oc.py:757-828)."""
        sde_diff = self.sde.diff_coeff
        times_s = jnp.flip(ts[:-1])
        times_t = jnp.flip(ts[1:])

        def body(carry, st):
            x, rnd, k = carry
            s, t, dt, sqdt = st
            k, k_db = jax.random.split(k)
            u_t = self._rescale(ctrl(t, x), sde_diff)
            db = sqdt * jax.random.normal(k_db, x.shape)
            drift_t = self.sde.drift(t, x)
            y = x + (drift_t - u_t * sde_diff) * dt + sde_diff * db
            # NOTE: drift at (t, y) — matching the reference's reverse pass
            # (losses/oc.py:807 evaluates drift_s at time t).
            drift_s = self.sde.drift(t, y)
            u_s = self._rescale(ctrl(s, y), sde_diff)
            cost = (drift_s + drift_t) / sde_diff + u_s - u_t
            rnd = rnd - 0.5 * jnp.sum(cost**2, axis=-1) * dt
            rnd = rnd - jnp.sum(cost * db, axis=-1)
            return (y, rnd, k), None

        rnd0 = -terminal_unnorm_log_prob(x)
        dt_arr = times_t - times_s
        (x_0, rnd, _), _ = self._scan(
            body, (x, rnd0, key), (times_s, times_t, dt_arr, jnp.sqrt(dt_arr)))
        return rnd + initial_log_prob(x_0)
