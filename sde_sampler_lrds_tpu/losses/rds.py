"""Reference-based diffusion sampler (RDS) losses: EM / EI / DDPM integrators.

Re-design of sde_sampler/losses/oc.py:203-651. The generative control u
approximates ∇log(p_t/p_t^ref); the reference control (∇log p_t^ref) enters
the drift. RND accumulation per step:

  EM  (oc.py:218-296):  rnd += cost·dt + u·dB,  x += (−f + g²·s_ref + g·ū)dt + g·dB
  EI  (oc.py:431-568):  rnd += ω(s,t)·cost + √ω·u·z,  x = ei_step(x, s_ref+ū, z)
  DDPM(oc.py:571-651):  same with ω_ddpm and the DDPM-like kernel

with terminal cost log p_ref(x_T) − log ρ(x_T). KL cost = ½‖u‖²; LV cost =
u·(ū−½u) with ū detached. Each simulate is one lax.scan (remat'd body).

TPU note: ALL per-step schedule scalars (ω, the affine kernel coefficients,
dt, diffusion values) are precomputed as vectorized grid arrays and fed to
the scan as inputs — scalar transcendentals inside a TPU scan body cost
~0.26 ms per step, two orders of magnitude more than the batched math they
feed at the reference's eval scale.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .base import BaseOCLoss, compute_results, flat_ctrl_eval


class EMReferenceSDELoss(BaseOCLoss):
    """RDS loss with the Euler-Maruyama integrator (losses/oc.py:203)."""

    def __init__(self, *args, reference_ctrl: Callable | None = None,
                 use_rescaling: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.reference_ctrl = reference_ctrl
        self.use_rescaling = use_rescaling

    def simulate(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                 reference_log_prob, change_sde_ctrl: bool = False,
                 return_traj: bool = False, noise: jnp.ndarray | None = None):
        T = ts[-1]
        s_arr, t_arr = ts[:-1], ts[1:]
        t_ctrl = T - s_arr
        dt_arr = t_arr - s_arr
        linear = hasattr(self.sde, "drift_coeff_t")
        if linear:
            xs_in = (t_ctrl, dt_arr, jnp.sqrt(dt_arr),
                     self.sde.diff_coeff_t(t_ctrl), self.sde.drift_coeff_t(t_ctrl))
        else:
            zeros = jnp.zeros_like(dt_arr)
            xs_in = (t_ctrl, dt_arr, jnp.sqrt(dt_arr), zeros, zeros)
        tabulated = hasattr(self.reference_ctrl, "precompute")
        if tabulated:
            xs_in = (*xs_in, self.reference_ctrl.precompute(t_ctrl))
        # provided per-step standard normals (K, B, D): common-random-number
        # studies and bit-comparable tests of the fused Pallas path
        if noise is not None:
            xs_in = (*xs_in, noise)

        def body(carry, inp):
            x, rnd, k = carry
            if noise is not None:
                *inp, z_in = inp
            if tabulated:
                tc, dt, sqdt, diff, drift_k, tab = inp
            else:
                tc, dt, sqdt, diff, drift_k = inp
            k, k_db, k_ctrl = jax.random.split(k, 3)
            u = ctrl(tc, x)
            sde_ctrl = self._sde_ctrl(u, k_ctrl, tc, x) if change_sde_ctrl else u
            sde_diff = diff if linear else self.sde.diff(tc, x)
            if not self.use_rescaling:
                u = u * sde_diff
                sde_ctrl = sde_ctrl * sde_diff
            rnd = rnd + self.running_cost(u, sde_ctrl, change_sde_ctrl) * dt
            db = sqdt * (z_in if noise is not None
                         else jax.random.normal(k_db, x.shape))
            drift = -(drift_k * x) if linear else -self.sde.drift(tc, x)
            if self.reference_ctrl is not None:
                ref_score = self.reference_ctrl.apply(tab, x) if tabulated \
                    else self.reference_ctrl(tc, x)
                drift = drift + jnp.square(sde_diff) * ref_score
            x_new = x + (drift + sde_diff * sde_ctrl) * dt + sde_diff * db
            rnd = rnd + jnp.sum(u * db, axis=-1)
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
            change_sde_ctrl=self.is_lv, return_traj=False)
        return self.reduce(rnd, samples=samples)

    # -- flat LV training path ---------------------------------------------
    def supports_flat_lv(self, ts, call_args: frozenset) -> bool:
        return (call_args == frozenset({"terminal_unnorm_log_prob",
                                        "reference_log_prob"})
                and self._flat_grids(ts) is not None)

    def _flat_grids(self, ts):
        """(c_cost, c_dot, u_scale) per step for ``lv_flat_call``: the RND is
        Σ_k c_cost·cost(u_scale·u_k) + c_dot·(u_scale·u_k)·z_k."""
        if not hasattr(self.sde, "drift_coeff_t"):
            return None
        t_ctrl = ts[-1] - ts[:-1]
        dt = ts[1:] - ts[:-1]
        scale = (jnp.ones_like(dt) if self.use_rescaling
                 else jnp.broadcast_to(self.sde.diff_coeff_t(t_ctrl), dt.shape))
        return dt, jnp.sqrt(dt), scale

    def lv_flat_call(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                     reference_log_prob, traj_fn=None):
        """LV training as gradient-free simulation + flat batched cost.

        The log-variance loss detaches the simulation control
        (losses/oc.py:83 ``sde_ctrl = u.detach()``), so the trajectory
        x_0..x_T carries NO parameter gradient — only the per-step cost
        c_cost·u·(ū−½u) + c_dot·u·z does, evaluated at frozen (x_k, z_k).
        This method therefore simulates under stop_gradient (optionally in
        the fused Pallas kernel via ``traj_fn(x0, zs) -> (xs, x_T)``,
        ops/fused_traj.fused_traj_states) and differentiates ONE batched
        control evaluation over all K·B states: same value and gradient as
        ``__call__`` under common noise (tests/test_fused_traj.py), but no
        backprop-through-scan — the backward pass is a single flat MLP VJP.
        """
        grids = self._flat_grids(ts)
        if grids is None:
            raise ValueError("the flat LV path needs a linear SDE")
        c_cost, c_dot, u_scale = grids
        x, k_sim, zs = self._flat_lv_setup(key, ts, x)
        if traj_fn is not None:
            xs, x_t = traj_fn(x, zs)
        else:
            x_t, _, xs_all = self.simulate(
                k_sim, ts, x, ctrl, terminal_unnorm_log_prob,
                reference_log_prob, change_sde_ctrl=True, return_traj=True,
                noise=zs)
            xs = xs_all[:-1]
        xs = jax.lax.stop_gradient(xs)
        x_t = jax.lax.stop_gradient(x_t)
        u = flat_ctrl_eval(ctrl, ts[-1] - ts[:-1], xs) * u_scale[:, None, None]
        u_bar = jax.lax.stop_gradient(u)
        cost = jnp.sum(u * (u_bar - 0.5 * u), axis=-1)            # (K, B)
        ito = jnp.sum(u * zs, axis=-1)                            # (K, B)
        rnd = jnp.sum(c_cost[:, None] * cost + c_dot[:, None] * ito, axis=0)
        rnd = rnd + reference_log_prob(x_t) - terminal_unnorm_log_prob(x_t)
        return self.reduce(rnd, samples=x_t)

    # -- fused KL training path ---------------------------------------------
    def supports_fused_kl(self, ts, call_args: frozenset) -> bool:
        """Whether ``kl_fused_call`` (the differentiable fused-kernel KL
        path, ops/fused_traj.fused_kl_traj) covers this loss with the
        solver's call-arg set: KL method + the same structural scope as the
        flat LV path (linear SDE, tabulated reference)."""
        return (self.method in ("kl", "kl_ito")
                and call_args == frozenset({"terminal_unnorm_log_prob",
                                            "reference_log_prob"})
                and self._flat_grids(ts) is not None)

    def kl_fused_call(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                      reference_log_prob, traj_rnd_fn):
        """KL training through the differentiable fused trajectory.

        Unlike LV, the KL loss attaches the simulated control, so the
        trajectory carries parameter gradient and cannot be flattened —
        instead ``traj_rnd_fn(x0, zs) -> (x_T, rnd)`` is the custom-VJP
        fused kernel (ops/fused_traj.fused_kl_traj): Pallas forward, one
        reverse adjoint scan backward over the saved states. Same estimator
        and gradient as ``__call__`` under common noise
        (tests/test_fused_traj.py); the internal noise stream mirrors
        ``_flat_lv_setup`` so common-random-number comparisons line up."""
        del ctrl  # the control rides inside traj_rnd_fn's tables
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
            change_sde_ctrl=False, return_traj=return_traj)
        return compute_results(rnd, compute_weights=compute_weights, ts=ts,
                               max_rnd=self.max_rnd, samples=samples, xs=xs)

    def compute_eubo(self, key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob):
        """Reverse (noising) pass from true target samples: the EUBO upper
        bound of arXiv:2406.07423 (losses/oc.py:298-362).

        The noising trajectory is control-free, so the K sequential
        control/reference evaluations of the reference's loop are
        restructured into ONE batched evaluation over all K·B states
        (flat_ctrl_eval — at MNIST-UNet scale this replaces 100 sequential
        small-batch net calls with a few large MXU-saturating ones)."""
        T = ts[-1]
        times_s = jnp.flip(ts[:-1])
        times_t = jnp.flip(ts[1:])
        mean_f, var_f = self.sde.transition_params(T - times_t, T - times_s)
        std_f = jnp.sqrt(var_f)
        t_ctrl = T - times_s
        dt_arr = times_t - times_s
        diff_arr = self.sde.diff_coeff_t(t_ctrl)
        drift_k_arr = self.sde.drift_coeff_t(t_ctrl)
        _, xs, zs = self._noising_states(key, x, mean_f, std_f)
        u = flat_ctrl_eval(ctrl, t_ctrl, xs)                    # (K, B, D)
        # the reference goes through the same K-chunked path: an 'nn'
        # (EBM-score) reference is a conv-net gradient, and vmapping it
        # over all K*B states at once OOMs HBM at MNIST eval shapes
        ref = flat_ctrl_eval(self.reference_ctrl, t_ctrl, xs)
        if self.use_rescaling:
            u = u / diff_arr[:, None, None]
        cost = jnp.sum(u * (ref + 0.5 * u), axis=-1)            # (K, B)
        steps = (-cost * (dt_arr * diff_arr**2)[:, None]
                 + jnp.sum(u * xs, axis=-1)
                 * (1.0 / mean_f - 1.0 + drift_k_arr * dt_arr)[:, None]
                 - jnp.sum(u * zs, axis=-1) * (std_f / mean_f)[:, None])
        rnd0 = reference_log_prob(x) - terminal_unnorm_log_prob(x)
        return rnd0 + jnp.sum(steps, axis=0)


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

    def _step_coeffs(self, s, t):
        return self.sde.ei_step_coeffs(s, t)

    def _flat_grids(self, ts):
        omega = self._omega(ts[:-1], ts[1:])
        return omega, jnp.sqrt(omega), jnp.ones_like(omega)

    def _grid(self, ts):
        """Per-step arrays: ctrl time, ω, √ω, affine kernel coefficients."""
        T = ts[-1]
        s_arr, t_arr = ts[:-1], ts[1:]
        omega = self._omega(s_arr, t_arr)
        a_x, a_s, a_z = self._step_coeffs(s_arr, t_arr)
        return T - s_arr, omega, jnp.sqrt(omega), a_x, a_s, a_z

    def simulate(self, key, ts, x, ctrl, terminal_unnorm_log_prob,
                 reference_log_prob, change_sde_ctrl: bool = False,
                 return_traj: bool = False, noise: jnp.ndarray | None = None):
        grid = self._grid(ts)
        # tabulated reference: per-step noised-marginal parameters are
        # precomputed and fed through the scan (see solvers/oc.py
        # GaussianReferenceCtrl / GMMReferenceCtrl)
        tabulated = hasattr(self.reference_ctrl, "precompute")
        if tabulated:
            ref_tab = self.reference_ctrl.precompute(ts[-1] - ts[:-1])
            grid = (*grid, ref_tab)
        if noise is not None:  # provided standard normals (K, B, D)
            grid = (*grid, noise)

        def body(carry, inp):
            x, rnd, k = carry
            if noise is not None:
                *inp, z_in = inp
            if tabulated:
                tc, omega, sq_omega, a_x, a_s, a_z, tab = inp
                ref_score = self.reference_ctrl.apply(tab, x)
            else:
                tc, omega, sq_omega, a_x, a_s, a_z = inp
                ref_score = self.reference_ctrl(tc, x)
            k, k_z, k_ctrl = jax.random.split(k, 3)
            u = ctrl(tc, x)
            sde_ctrl = self._sde_ctrl(u, k_ctrl, tc, x) if change_sde_ctrl else u
            rnd = rnd + omega * self.running_cost(u, sde_ctrl, change_sde_ctrl)
            z = z_in if noise is not None else jax.random.normal(k_z, x.shape)
            x_new = a_x * x + a_s * (ref_score + sde_ctrl) + a_z * z
            rnd = rnd + sq_omega * jnp.sum(u * z, axis=-1)
            return (x_new, rnd, k), (x_new if return_traj else None)

        rnd0 = jnp.zeros((x.shape[0],), x.dtype)
        (x_T, rnd, _), traj = self._scan(body, (x, rnd0, key), grid)
        rnd = rnd + reference_log_prob(x_T) - terminal_unnorm_log_prob(x_T)
        xs = jnp.concatenate([x[None], traj], axis=0) if return_traj else None
        return x_T, rnd, xs

    def compute_eubo(self, key, ts, x, ctrl, terminal_unnorm_log_prob, reference_log_prob):
        """Reverse noising pass with ω weights (losses/oc.py:512-568),
        flat-batched control/reference evaluation (see the EM variant)."""
        T = ts[-1]
        times_s = jnp.flip(ts[:-1])
        times_t = jnp.flip(ts[1:])
        mean_f, var_f = self.sde.transition_params(T - times_t, T - times_s)
        std_f = jnp.sqrt(var_f)
        omega = self._omega(times_s, times_t)[:, None]          # (K, 1)
        t_ctrl = T - times_s
        _, xs, zs = self._noising_states(key, x, mean_f, std_f)
        u = flat_ctrl_eval(ctrl, t_ctrl, xs)                    # (K, B, D)
        # the reference goes through the same K-chunked path: an 'nn'
        # (EBM-score) reference is a conv-net gradient, and vmapping it
        # over all K*B states at once OOMs HBM at MNIST eval shapes
        ref = flat_ctrl_eval(self.reference_ctrl, t_ctrl, xs)
        steps = (-jnp.sum(u * (ref + 0.5 * u), axis=-1) * omega
                 - jnp.sum(u * zs, axis=-1) * jnp.sqrt(omega))
        rnd0 = reference_log_prob(x) - terminal_unnorm_log_prob(x)
        return rnd0 + jnp.sum(steps, axis=0)


class DDPMLikeReferenceSDELoss(EIReferenceSDELoss):
    """RDS loss with the DDPM-like kernel (losses/oc.py:571)."""

    def _omega(self, s, t):
        return self.sde.omega_ddpm(s, t)

    def _step_coeffs(self, s, t):
        return self.sde.ddpm_step_coeffs(s, t)

    compute_eubo = None  # no EUBO variant for the DDPM kernel in the reference
