"""Time-reversal (DIS) losses: discrete-time EI variant and the original
continuous-time variant with optional learned inference control.

Re-design of sde_sampler/losses/oc.py:897-1307. Here generative_ctrl
approximates ∇log p_t (the full score, not the reference-relative one):

  discrete DIS (oc.py:897-1102): EI kernel with ω weights, initial cost
      log p₀(x) (eval) and terminal −log ρ.
  original DIS (oc.py:1105-1307): EM in forward time with the generative
      process's own clock, optional inference control whose divergence enters
      via a Hutchinson/exact estimator, and the eval-only drift-divergence
      integral correction (oc.py:1219).

All per-step schedule scalars are precomputed grid arrays (see losses/rds.py).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.autograd import compute_divx
from .base import BaseOCLoss, compute_results, flat_ctrl_eval


class DiscreteTimeReversalLossEI(BaseOCLoss):
    """Discrete-time DIS with the exponential integrator (oc.py:897)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.use_rescaling = False

    def simulate(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                 initial_log_prob=None, train: bool = True,
                 change_sde_ctrl: bool = False, return_traj: bool = False,
                 noise: jnp.ndarray | None = None):
        T = ts[-1]
        s_arr, t_arr = ts[:-1], ts[1:]
        omega = self.sde.omega(s_arr, t_arr)
        a_x, a_s, a_z = self.sde.ei_step_coeffs(s_arr, t_arr)
        xs_in = (T - s_arr, omega, jnp.sqrt(omega), a_x, a_s, a_z)
        if noise is not None:
            xs_in = (*xs_in, noise)

        def body(carry, inp):
            x, rnd, k = carry
            if noise is not None:
                *inp, z_in = inp
            tc, om, sq_om, a_x, a_s, a_z = inp
            k, k_z, k_ctrl = jax.random.split(k, 3)
            u = ctrl(tc, x)
            sde_ctrl = self._sde_ctrl(u, k_ctrl, tc, x) if change_sde_ctrl else u
            rnd = rnd + om * self.running_cost(u, sde_ctrl, change_sde_ctrl)
            z = z_in if noise is not None else jax.random.normal(k_z, x.shape)
            x_new = a_x * x + a_s * sde_ctrl + a_z * z
            rnd = rnd + sq_om * jnp.sum(u * z, axis=-1)
            return (x_new, rnd, k), (x_new if return_traj else None)

        if train and self.method in ("kl", "kl_ito"):
            rnd0 = jnp.zeros((x.shape[0],), x.dtype)
        else:
            rnd0 = initial_log_prob(x)
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

    # -- flat LV training path (see losses/rds.py lv_flat_call) ------------
    def supports_flat_lv(self, ts, call_args: frozenset) -> bool:
        # LV's rnd0 = initial_log_prob(x0), so both args must be wired
        return call_args == frozenset({"terminal_unnorm_log_prob",
                                       "initial_log_prob"})

    def lv_flat_call(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                     initial_log_prob=None, traj_fn=None):
        """LV training as gradient-free simulation + flat batched cost: the
        detached simulation control makes the trajectory parameter-free, so
        one batched control evaluation over all K·B pre-step states carries
        the full gradient (value- and gradient-identical to ``__call__``
        under common noise, tests/test_fused_traj.py). ``traj_fn(x0, zs) ->
        (xs, x_T)`` runs the simulation in the fused Pallas kernel
        (ops/fused_traj; see losses/rds.py lv_flat_call)."""
        x, k_sim, zs = self._flat_lv_setup(key, ts, x)
        if traj_fn is not None:
            xs, x_t = traj_fn(x, zs)
        else:
            x_t, _, xs_all = self.simulate(
                k_sim, ts, x, ctrl, terminal_unnorm_log_prob,
                initial_log_prob=initial_log_prob, train=True,
                change_sde_ctrl=True, return_traj=True, noise=zs)
            xs = xs_all[:-1]
        xs = jax.lax.stop_gradient(xs)                         # (K, B, D)
        x_t = jax.lax.stop_gradient(x_t)
        s_arr, t_arr = ts[:-1], ts[1:]
        omega = self.sde.omega(s_arr, t_arr)[:, None]          # (K, 1)
        u = flat_ctrl_eval(ctrl, ts[-1] - s_arr, xs)           # (K, B, D)
        u_bar = jax.lax.stop_gradient(u)
        steps = (omega * jnp.sum(u * (u_bar - 0.5 * u), axis=-1)
                 + jnp.sqrt(omega) * jnp.sum(u * zs, axis=-1))  # (K, B)
        rnd = initial_log_prob(x) + jnp.sum(steps, axis=0) \
            - terminal_unnorm_log_prob(x_t)
        return self.reduce(rnd, samples=x_t)

    # -- fused KL training path (see losses/rds.py kl_fused_call) ----------
    def supports_fused_kl(self, ts, call_args: frozenset) -> bool:
        return (self.method in ("kl", "kl_ito")
                and call_args == frozenset({"terminal_unnorm_log_prob",
                                            "initial_log_prob"}))

    def kl_fused_call(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                      initial_log_prob=None, traj_rnd_fn=None):
        """KL training through the differentiable fused trajectory
        (ops/fused_traj.fused_kl_traj; rationale in losses/rds.py). KL
        training starts from rnd₀ = 0 — ``initial_log_prob`` is an
        eval-only boundary term here (simulate, train=True branch)."""
        del ctrl, initial_log_prob
        x = self.repeat_traj(x)
        k_z, _ = jax.random.split(key)
        zs = jax.random.normal(k_z, (ts.shape[0] - 1, *x.shape))
        x_t, rnd = traj_rnd_fn(x, zs)
        rnd = rnd - terminal_unnorm_log_prob(x_t)
        return self.reduce(rnd, samples=x_t)

    def eval(self, key, ts, x, ctrl, terminal_unnorm_log_prob, initial_log_prob=None,
             compute_weights: bool = True, return_traj: bool = True):
        samples, rnd, xs = self.simulate(
            key, ts, x, ctrl, terminal_unnorm_log_prob,
            initial_log_prob=initial_log_prob, train=False, return_traj=return_traj)
        return compute_results(rnd, compute_weights=compute_weights, ts=ts,
                               max_rnd=self.max_rnd, samples=samples, xs=xs)

    def compute_eubo(self, key, ts, x, ctrl, terminal_unnorm_log_prob, initial_log_prob=None):
        """Reverse noising pass (losses/oc.py:980-1036). The trajectory is
        control-free, so the K control evaluations run as one flat batched
        pass (losses/rds.py compute_eubo rationale)."""
        T = ts[-1]
        times_s = jnp.flip(ts[:-1])
        times_t = jnp.flip(ts[1:])
        mean_f, var_f = self.sde.transition_params(T - times_t, T - times_s)
        std_f = jnp.sqrt(var_f)
        omega = self.sde.omega(times_s, times_t)[:, None]       # (K, 1)
        x_0, xs, zs = self._noising_states(key, x, mean_f, std_f)
        u = flat_ctrl_eval(ctrl, T - times_s, xs)               # (K, B, D)
        steps = (-0.5 * jnp.sum(u**2, axis=-1) * omega
                 - jnp.sum(u * zs, axis=-1) * jnp.sqrt(omega))
        return (-terminal_unnorm_log_prob(x) + jnp.sum(steps, axis=0)
                + initial_log_prob(x_0))


class TimeReversalLoss(BaseOCLoss):
    """Original DIS loss (oc.py:1105), optionally with a learned inference
    control and divergence estimation (GBS / Bridge)."""

    def __init__(self, *args, inference_ctrl: Callable | None = None,
                 div_estimator: str | None = None, use_rescaling: bool = True,
                 **kwargs):
        super().__init__(*args, **kwargs)
        if not use_rescaling:
            raise ValueError("use_rescaling must be True for TimeReversalLoss.")
        self.inference_ctrl = inference_ctrl
        self.div_estimator = div_estimator

    def simulate(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                 initial_log_prob=None, train: bool = True,
                 compute_ito_int: bool = False, change_sde_ctrl: bool = False,
                 return_traj: bool = False, inference_ctrl: Callable | None = None,
                 noise: jnp.ndarray | None = None):
        inference_ctrl = inference_ctrl if inference_ctrl is not None else self.inference_ctrl
        s_arr, t_arr = ts[:-1], ts[1:]
        dt_arr = t_arr - s_arr
        linear = hasattr(self.sde, "drift_coeff_t")
        if linear:
            diff_arr = self.sde.diff_coeff_t(s_arr)
            drift_k_arr = self.sde.drift_coeff_t(s_arr)
            div_int_arr = self.sde.int_drift_coeff_t(s_arr, t_arr) * x.shape[-1]
        else:
            diff_arr = drift_k_arr = div_int_arr = jnp.zeros_like(dt_arr)
        xs_in = (s_arr, dt_arr, jnp.sqrt(dt_arr), diff_arr, drift_k_arr, div_int_arr)
        if noise is not None:
            xs_in = (*xs_in, noise)

        def body(carry, inp):
            x, rnd, k = carry
            if noise is not None:
                *inp, z_in = inp
            s, dt, sqdt, diff, drift_k, div_int = inp
            k, k_db, k_ctrl, k_div = jax.random.split(k, 4)
            u = ctrl(s, x)
            sde_ctrl = self._sde_ctrl(u, k_ctrl, s, x) if change_sde_ctrl else u
            sde_diff = diff if linear else self.sde.diff(s, x)
            if inference_ctrl is None:
                gen_plus = gen_minus = u
            else:
                div_type = self.div_estimator if train else None
                div_ctrl, inf = compute_divx(inference_ctrl, s, x, key=k_div,
                                             noise_type=div_type)
                rnd = rnd + sde_diff * div_ctrl[:, 0] * dt
                gen_plus = u + inf
                gen_minus = u - inf
            if change_sde_ctrl:
                cost = jnp.sum(gen_plus * (sde_ctrl - 0.5 * gen_minus), axis=-1)
            else:
                cost = 0.5 * jnp.sum(gen_plus**2, axis=-1)
            rnd = rnd + cost * dt
            if not train:
                rnd = rnd - (div_int if linear else self.sde.drift_div_int(s, s + dt, x))
            db = sqdt * (z_in if noise is not None
                         else jax.random.normal(k_db, x.shape))
            drift = (drift_k * x) if linear else self.sde.drift(s, x)
            x_new = x + (drift + sde_diff * sde_ctrl) * dt + sde_diff * db
            if compute_ito_int:
                rnd = rnd + jnp.sum(gen_plus * db, axis=-1)
            return (x_new, rnd, k), (x_new if return_traj else None)

        if train and self.method in ("kl", "kl_ito"):
            rnd0 = jnp.zeros((x.shape[0],), x.dtype)
        else:
            rnd0 = initial_log_prob(x)
        (x_T, rnd, _), traj = self._scan(body, (x, rnd0, key), xs_in)
        rnd = rnd - terminal_unnorm_log_prob(x_T)
        xs = jnp.concatenate([x[None], traj], axis=0) if return_traj else None
        return x_T, rnd, xs

    def __call__(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                 initial_log_prob=None, inference_ctrl: Callable | None = None):
        x = self.repeat_traj(x)
        samples, rnd, _ = self.simulate(
            key, ts, x, ctrl, terminal_unnorm_log_prob,
            initial_log_prob=initial_log_prob, train=True,
            compute_ito_int=self.method != "kl", change_sde_ctrl=self.is_lv,
            return_traj=False, inference_ctrl=inference_ctrl)
        return self.reduce(rnd, samples=samples)

    # -- flat LV training path (see losses/rds.py lv_flat_call) ------------
    def supports_flat_lv(self, ts, call_args: frozenset) -> bool:
        # a learned inference control adds a live divergence term along the
        # trajectory — out of the flat restructuring's scope
        return (self.inference_ctrl is None
                and call_args == frozenset({"terminal_unnorm_log_prob",
                                            "initial_log_prob"}))

    def lv_flat_call(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                     initial_log_prob=None, traj_fn=None):
        """LV training as gradient-free simulation + flat batched cost
        (detached simulation control, so only the per-step cost
        dt·u·(ū−½u) + √dt·u·z at frozen states carries gradient)."""
        del traj_fn
        if self.inference_ctrl is not None:
            raise ValueError("lv_flat_call does not support a learned "
                             "inference control (live divergence term)")
        x, k_sim, zs = self._flat_lv_setup(key, ts, x)
        _, _, xs_all = self.simulate(
            k_sim, ts, x, ctrl, terminal_unnorm_log_prob,
            initial_log_prob=initial_log_prob, train=True,
            compute_ito_int=False, change_sde_ctrl=True, return_traj=True,
            noise=zs)
        xs_all = jax.lax.stop_gradient(xs_all)                 # (K+1, B, D)
        dt = (ts[1:] - ts[:-1])[:, None]                       # (K, 1)
        u = flat_ctrl_eval(ctrl, ts[:-1], xs_all[:-1])         # (K, B, D)
        u_bar = jax.lax.stop_gradient(u)
        steps = (dt * jnp.sum(u * (u_bar - 0.5 * u), axis=-1)
                 + jnp.sqrt(dt) * jnp.sum(u * zs, axis=-1))    # (K, B)
        rnd = initial_log_prob(xs_all[0]) + jnp.sum(steps, axis=0) \
            - terminal_unnorm_log_prob(xs_all[-1])
        return self.reduce(rnd, samples=xs_all[-1])

    def eval(self, key, ts, x, ctrl, terminal_unnorm_log_prob, initial_log_prob=None,
             compute_weights: bool = True, return_traj: bool = True,
             inference_ctrl: Callable | None = None):
        samples, rnd, xs = self.simulate(
            key, ts, x, ctrl, terminal_unnorm_log_prob,
            initial_log_prob=initial_log_prob, train=False,
            compute_ito_int=compute_weights, return_traj=return_traj,
            inference_ctrl=inference_ctrl)
        return compute_results(rnd, compute_weights=compute_weights, ts=ts,
                               max_rnd=self.max_rnd, samples=samples, xs=xs)
