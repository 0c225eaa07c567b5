"""Original DDS loss (Vargas et al. exponential-integrator update).

Re-design of sde_sampler/losses/oc.py:1310-1467:
  β_k = clip(α√dt, 0, 1), α_k = √(1-β_k²),
  x ← α_k x + β_k²σ² ū + σβ_k ε,
  rnd += β_k²σ²·cost + σβ_k u·ε,
terminal cost log p_ref(x_T) − log ρ(x_T) with the Gaussian prior as
reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import BaseOCLoss, compute_results, flat_ctrl_eval


class ExponentialIntegratorSDELoss(BaseOCLoss):
    def __init__(self, *args, alpha: float, sigma: float, **kwargs):
        super().__init__(*args, **kwargs)
        self.alpha = float(alpha)
        self.sigma = float(sigma)

    def simulate(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                 reference_log_prob, compute_ito_int: bool = False,
                 change_sde_ctrl: bool = False, return_traj: bool = False,
                 noise: jnp.ndarray | None = None):
        # precomputed per-step schedule (see losses/rds.py TPU note)
        s_arr, t_arr = ts[:-1], ts[1:]
        beta = jnp.clip(self.alpha * jnp.sqrt(t_arr - s_arr), 0.0, 1.0)
        alpha_k = jnp.sqrt(1.0 - beta**2)
        xs_in = (s_arr, beta, alpha_k)
        if noise is not None:
            xs_in = (*xs_in, noise)

        def body(carry, inp):
            x, rnd, k = carry
            if noise is not None:
                *inp, z_in = inp
            s, beta_k, alpha_k = inp
            k, k_eps, k_ctrl = jax.random.split(k, 3)
            u = ctrl(s, x)
            sde_ctrl = self._sde_ctrl(u, k_ctrl, s, x) if change_sde_ctrl else u
            cost = self.running_cost(u, sde_ctrl, change_sde_ctrl)
            rnd = rnd + beta_k**2 * self.sigma**2 * cost
            eps = z_in if noise is not None else jax.random.normal(k_eps, x.shape)
            x_new = x * alpha_k + beta_k**2 * self.sigma**2 * sde_ctrl \
                + self.sigma * beta_k * eps
            if compute_ito_int:
                rnd = rnd + self.sigma * beta_k * jnp.sum(u * eps, axis=-1)
            return (x_new, rnd, k), (x_new if return_traj else None)

        rnd0 = jnp.zeros((x.shape[0],), x.dtype)
        (x_T, rnd, _), traj = self._scan(body, (x, rnd0, key), xs_in)
        rnd = rnd + reference_log_prob(x_T) - terminal_unnorm_log_prob(x_T)
        xs = jnp.concatenate([x[None], traj], axis=0) if return_traj else None
        return x_T, rnd, xs

    def __call__(self, key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob):
        x = self.repeat_traj(x)
        samples, rnd, _ = self.simulate(
            key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob,
            compute_ito_int=self.method != "kl", change_sde_ctrl=self.is_lv,
            return_traj=False)
        return self.reduce(rnd, samples=samples)

    # -- flat LV training path (see losses/rds.py lv_flat_call) ------------
    def supports_flat_lv(self, ts, call_args: frozenset) -> bool:
        return call_args == frozenset({"terminal_unnorm_log_prob",
                                       "reference_log_prob"})

    def lv_flat_call(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                     reference_log_prob, traj_fn=None):
        """LV training as gradient-free simulation + flat batched cost
        (detached simulation control; cost β²σ²·u·(ū−½u) + σβ·u·ε at
        frozen states carries the full gradient). ``traj_fn(x0, zs) ->
        (xs, x_T)`` runs the simulation in the fused Pallas kernel
        (ops/fused_traj; see losses/rds.py lv_flat_call)."""
        x, k_sim, zs = self._flat_lv_setup(key, ts, x)
        if traj_fn is not None:
            xs, x_t = traj_fn(x, zs)
        else:
            x_t, _, xs_all = self.simulate(
                k_sim, ts, x, ctrl, terminal_unnorm_log_prob,
                reference_log_prob, compute_ito_int=False,
                change_sde_ctrl=True, return_traj=True, noise=zs)
            xs = xs_all[:-1]
        xs = jax.lax.stop_gradient(xs)                         # (K, B, D)
        x_t = jax.lax.stop_gradient(x_t)
        s_arr, t_arr = ts[:-1], ts[1:]
        beta = jnp.clip(self.alpha * jnp.sqrt(t_arr - s_arr),
                        0.0, 1.0)[:, None]                     # (K, 1)
        u = flat_ctrl_eval(ctrl, s_arr, xs)                    # (K, B, D)
        u_bar = jax.lax.stop_gradient(u)
        steps = (beta**2 * self.sigma**2
                 * jnp.sum(u * (u_bar - 0.5 * u), axis=-1)
                 + self.sigma * beta * jnp.sum(u * zs, axis=-1))
        rnd = (jnp.sum(steps, axis=0) + reference_log_prob(x_t)
               - terminal_unnorm_log_prob(x_t))
        return self.reduce(rnd, samples=x_t)

    # -- fused KL training path (see losses/rds.py kl_fused_call) ----------
    @property
    def fused_train_ito(self) -> bool:
        # __call__ trains with compute_ito_int = (method != 'kl')
        return self.method != "kl"

    def supports_fused_kl(self, ts, call_args: frozenset) -> bool:
        return (self.method in ("kl", "kl_ito")
                and call_args == frozenset({"terminal_unnorm_log_prob",
                                            "reference_log_prob"}))

    def kl_fused_call(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                      reference_log_prob, traj_rnd_fn):
        """KL training through the differentiable fused trajectory
        (ops/fused_traj.fused_kl_traj; rationale in losses/rds.py). The
        plan's c_dot carries the ito toggle (``fused_train_ito``)."""
        del ctrl
        x = self.repeat_traj(x)
        k_z, _ = jax.random.split(key)
        zs = jax.random.normal(k_z, (ts.shape[0] - 1, *x.shape))
        x_t, rnd = traj_rnd_fn(x, zs)
        rnd = rnd + reference_log_prob(x_t) - terminal_unnorm_log_prob(x_t)
        return self.reduce(rnd, samples=x_t)

    def eval(self, key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob,
             compute_weights: bool = True, return_traj: bool = True):
        samples, rnd, xs = self.simulate(
            key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob,
            compute_ito_int=compute_weights, change_sde_ctrl=False,
            return_traj=return_traj)
        return compute_results(rnd, compute_weights=compute_weights, ts=ts,
                               max_rnd=self.max_rnd, samples=samples, xs=xs)
