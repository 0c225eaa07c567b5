"""Reference-based diffusion sampler (RDS) losses: EM / EI / DDPM integrators.

Re-design of sde_sampler/losses/oc.py:203-651. The generative control u
approximates ∇log(p_t/p_t^ref); the reference control (∇log p_t^ref) enters
the drift. RND accumulation per step:

  EM  (oc.py:218-296):  rnd += cost·dt + u·dB,  x += (−f + g²·s_ref + g·ū)dt + g·dB
  EI  (oc.py:431-568):  rnd += ω(s,t)·cost + √ω·u·z,  x = ei_step(x, s_ref+ū, z)
  DDPM(oc.py:571-651):  same with ω_ddpm and the DDPM-like kernel

with terminal cost log p_ref(x_T) − log ρ(x_T). KL cost = ½‖u‖²; LV cost =
u·(ū−½u) with ū detached. Each simulate is one lax.scan (remat'd body).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .base import BaseOCLoss, compute_results


class EMReferenceSDELoss(BaseOCLoss):
    """RDS loss with the Euler-Maruyama integrator (losses/oc.py:203)."""

    def __init__(self, *args, reference_ctrl: Callable | None = None,
                 use_rescaling: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.reference_ctrl = reference_ctrl
        self.use_rescaling = use_rescaling

    def simulate(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                 reference_log_prob, change_sde_ctrl: bool = False,
                 return_traj: bool = False):
        T = ts[-1]

        def body(carry, st):
            x, rnd, k = carry
            s, t = st
            k, k_db, k_ctrl = jax.random.split(k, 3)
            dt = t - s
            u = ctrl(T - s, x)
            sde_ctrl = self._sde_ctrl(u, k_ctrl, T - s, x) if change_sde_ctrl else u
            sde_diff = self.sde.diff(T - s, x)
            if not self.use_rescaling:
                u = u * sde_diff
                sde_ctrl = sde_ctrl * sde_diff
            rnd = rnd + self.running_cost(u, sde_ctrl, change_sde_ctrl) * dt
            db = jnp.sqrt(dt) * jax.random.normal(k_db, x.shape)
            drift = -self.sde.drift(T - s, x)
            if self.reference_ctrl is not None:
                drift = drift + jnp.square(sde_diff) * self.reference_ctrl(T - s, x)
            x_new = x + (drift + sde_diff * sde_ctrl) * dt + sde_diff * db
            rnd = rnd + jnp.sum(u * db, axis=-1)
            return (x_new, rnd, k), (x_new if return_traj else None)

        rnd0 = jnp.zeros((x.shape[0],), x.dtype)
        (x_T, rnd, _), traj = self._scan(body, (x, rnd0, key), (ts[:-1], ts[1:]))
        rnd = rnd + reference_log_prob(x_T) - terminal_unnorm_log_prob(x_T)
        xs = jnp.concatenate([x[None], traj], axis=0) if return_traj else None
        return x_T, rnd, xs

    def __call__(self, key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob):
        x = self.repeat_traj(x)
        samples, rnd, _ = self.simulate(
            key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob,
            change_sde_ctrl=self.is_lv, return_traj=False)
        return self.reduce(rnd, samples=samples)

    def eval(self, key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob,
             compute_weights: bool = True, return_traj: bool = True):
        samples, rnd, xs = self.simulate(
            key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob,
            change_sde_ctrl=False, return_traj=return_traj)
        return compute_results(rnd, compute_weights=compute_weights, ts=ts,
                               samples=samples, xs=xs)

    def compute_eubo(self, key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob):
        """Reverse (noising) pass from true target samples: the EUBO upper
        bound of arXiv:2406.07423 (losses/oc.py:298-362)."""
        T = ts[-1]
        times_s = jnp.flip(ts[:-1])
        times_t = jnp.flip(ts[1:])
        mean_f, var_f = self.sde.transition_params(T - times_t, T - times_s)
        std_f = jnp.sqrt(var_f)

        def body(carry, inp):
            x, rnd, k = carry
            s, t, mf, sf = inp
            k, k_z = jax.random.split(k)
            z = jax.random.normal(k_z, x.shape)
            x = mf * x + sf * z
            u = ctrl(T - s, x)
            ref = self.reference_ctrl(T - s, x)
            sde_diff = self.sde.diff(T - s, x)
            dt = t - s
            if self.use_rescaling:
                u = u / sde_diff
            cost = jnp.sum(u * (ref + 0.5 * u), axis=-1)
            rnd = rnd - cost * dt * sde_diff**2
            rnd = rnd + jnp.sum(u * x, axis=-1) * (
                1.0 / mf - 1.0 + self.sde.drift_coeff_t(T - s) * dt)
            rnd = rnd - jnp.sum(u * z, axis=-1) * (sf / mf)
            return (x, rnd, k), None

        rnd0 = reference_log_prob(x) - terminal_unnorm_log_prob(x)
        (_, rnd, _), _ = self._scan(body, (x, rnd0, key), (times_s, times_t, mean_f, std_f))
        return rnd


class EIReferenceSDELoss(EMReferenceSDELoss):
    """RDS loss with the exponential integrator (losses/oc.py:431)."""

    def __init__(self, *args, reference_ctrl: Callable | None = None, **kwargs):
        kwargs["use_rescaling"] = False
        super().__init__(*args, reference_ctrl=reference_ctrl, **kwargs)
        # NOTE: no rescaling for the EI variant (oc.py:440-442); the control
        # output lives directly in score units.
        self.use_rescaling = False

    def _omega(self, s, t):
        return self.sde.omega(s, t)

    def _step(self, x, s, t, score, z):
        return self.sde.ei_integration_step(x, s, t, score, z)

    def simulate(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                 reference_log_prob, change_sde_ctrl: bool = False,
                 return_traj: bool = False):
        T = ts[-1]

        def body(carry, st):
            x, rnd, k = carry
            s, t = st
            k, k_z, k_ctrl = jax.random.split(k, 3)
            u = ctrl(T - s, x)
            sde_ctrl = self._sde_ctrl(u, k_ctrl, T - s, x) if change_sde_ctrl else u
            omega = self._omega(s, t)
            rnd = rnd + omega * self.running_cost(u, sde_ctrl, change_sde_ctrl)
            z = jax.random.normal(k_z, x.shape)
            x_new = self._step(x, s, t, self.reference_ctrl(T - s, x) + sde_ctrl, z)
            rnd = rnd + jnp.sqrt(omega) * jnp.sum(u * z, axis=-1)
            return (x_new, rnd, k), (x_new if return_traj else None)

        rnd0 = jnp.zeros((x.shape[0],), x.dtype)
        (x_T, rnd, _), traj = self._scan(body, (x, rnd0, key), (ts[:-1], ts[1:]))
        rnd = rnd + reference_log_prob(x_T) - terminal_unnorm_log_prob(x_T)
        xs = jnp.concatenate([x[None], traj], axis=0) if return_traj else None
        return x_T, rnd, xs

    def compute_eubo(self, key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob):
        """Reverse noising pass with ω weights (losses/oc.py:512-568)."""
        T = ts[-1]
        times_s = jnp.flip(ts[:-1])
        times_t = jnp.flip(ts[1:])
        mean_f, var_f = self.sde.transition_params(T - times_t, T - times_s)
        std_f = jnp.sqrt(var_f)

        def body(carry, inp):
            x, rnd, k = carry
            s, t, mf, sf = inp
            k, k_z = jax.random.split(k)
            z = jax.random.normal(k_z, x.shape)
            x = mf * x + sf * z
            u = ctrl(T - s, x)
            ref = self.reference_ctrl(T - s, x)
            omega = self._omega(s, t)
            rnd = rnd - jnp.sum(u * (ref + 0.5 * u), axis=-1) * omega
            rnd = rnd - jnp.sum(u * z, axis=-1) * jnp.sqrt(omega)
            return (x, rnd, k), None

        rnd0 = reference_log_prob(x) - terminal_unnorm_log_prob(x)
        (_, rnd, _), _ = self._scan(body, (x, rnd0, key), (times_s, times_t, mean_f, std_f))
        return rnd


class DDPMLikeReferenceSDELoss(EIReferenceSDELoss):
    """RDS loss with the DDPM-like kernel (losses/oc.py:571)."""

    def _omega(self, s, t):
        return self.sde.omega_ddpm(s, t)

    def _step(self, x, s, t, score, z):
        return self.sde.ddpm_integration_step(x, s, t, score, z)

    compute_eubo = None  # no EUBO variant for the DDPM kernel in the reference
