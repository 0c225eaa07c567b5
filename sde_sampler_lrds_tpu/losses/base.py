"""Shared machinery for the variational trajectory losses.

Re-design of sde_sampler/losses/oc.py:14-200 (BaseOCLoss). Each concrete loss
simulates denoising trajectories and accumulates the density log-ratio (RND)
in ONE fused ``lax.scan`` (the reference's per-step Python loops,
losses/oc.py:252 etc., are the N1 hot loops of SURVEY.md §2.3). KL vs LV is a
``stop_gradient`` placement on the simulated ("sde") control; masking-based
reductions replace boolean indexing so everything stays jittable.

Control convention: a control is a callable ``ctrl(t, x) -> u`` already bound
to parameters — the trainer closes it over the current params inside the
jitted step, and passes the EMA-bound callable for evaluation (replacing the
reference's use_ema flags).
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.common import Results, masked_mean, masked_var


def flat_ctrl_eval(ctrl: Callable, t_grid: jnp.ndarray, xs: jnp.ndarray,
                   max_flat: int = 4_000_000) -> jnp.ndarray:
    """Batched control evaluation over per-step states for the flat LV
    path: u[k] = ctrl(t_grid[k], xs[k]) for xs (K, B, ...).

    Small problems run as one vmapped mega-batch (best MXU utilization).
    Past ``max_flat`` state elements, the time axis is chunked through a
    remat'd ``lax.map`` so the backward pass stores only the control
    OUTPUTS (K·B·D) and recomputes layer activations per chunk — the
    difference between ~20 MB and multiple GB of stored activations for
    the MNIST UNet at K=100, B=256."""
    if xs.size <= max_flat:
        return jax.vmap(lambda t, x: ctrl(t, x))(t_grid, xs)
    f = jax.checkpoint(lambda args: ctrl(args[0], args[1]))
    return jax.lax.map(f, (t_grid, xs), batch_size=16)


def compute_results(rnd: jnp.ndarray, compute_weights: bool = False,
                    ts=None, samples=None, xs=None,
                    max_rnd: float | None = None) -> Results:
    """Metrics from the density log-ratio (losses/oc.py:133-173):
    elbo = E[-rnd]; IS weights = softmax(-rnd);
    log_norm_const_is = logsumexp(-rnd) - log N.

    ``eval/elbo`` is reference-faithful: its compute_results does not filter
    diverged trajectories, so on heavy-tailed targets (φ⁴) the headline bound
    carries NaN/huge-rnd artifacts. When ``max_rnd`` is set (the losses
    forward their training filter), ``eval/elbo_filtered`` /
    ``eval/log_norm_const_is_filtered`` additionally report the bound over
    trajectories with finite rnd < max_rnd, plus ``eval/filtered_frac`` — the
    diagnostic, not a replacement for the headline.
    """
    # trace-safe: under the solvers' cached jitted eval these stay jnp
    # scalars (the caller concretizes); float() eagerly otherwise
    as_scalar = (lambda x: x) if isinstance(rnd, jax.core.Tracer) else float
    neg = -rnd
    metrics = {"eval/elbo": as_scalar(neg.mean())}
    if max_rnd is not None:
        keep = jnp.isfinite(rnd) & (rnd < max_rnd)
        n_keep = jnp.maximum(keep.sum(), 1)
        neg_safe = jnp.where(keep, neg, 0.0)
        # all-filtered -> NaN, not a plausible-looking 0.0
        metrics["eval/elbo_filtered"] = as_scalar(jnp.where(
            keep.any(), neg_safe.sum() / n_keep, jnp.nan))
        metrics["eval/filtered_frac"] = as_scalar(1.0 - keep.sum() / rnd.shape[0])
        metrics["eval/log_norm_const_is_filtered"] = as_scalar(
            jax.scipy.special.logsumexp(jnp.where(keep, neg, -jnp.inf))
            - jnp.log(n_keep))
    log_norm_const_preds = {}
    weights = None
    if compute_weights:
        weights = jax.nn.softmax(neg)
        log_norm_const_preds["log_norm_const_is"] = as_scalar(
            jax.scipy.special.logsumexp(neg) - math.log(neg.shape[0]))
        metrics["eval/lv_loss"] = as_scalar(rnd.var(ddof=1))
    return Results(samples=samples, weights=weights, rnd=rnd,
                   log_norm_const_preds=log_norm_const_preds,
                   ts=ts, xs=xs, metrics=metrics)


class BaseOCLoss:
    """Config + reduction shared by all trajectory losses."""

    def __init__(
        self,
        sde=None,
        method: str = "kl",
        traj_per_sample: int = 1,
        filter_samples: Callable | None = None,
        max_rnd: float | None = None,
        sde_ctrl_noise: float | None = None,
        sde_ctrl_dropout: float | None = None,
        remat: bool = True,
        # 4-step scan unroll amortizes the TPU per-iteration overhead:
        # interleaved A/B at the demo protocol measured eval 3.37 -> 3.06 ms
        # (+10%) and training 3.37 -> 2.51 ms/opt step (-26%), identical
        # numerics; unroll >= 8 regresses (docs/RESULTS.md microbenchmarks)
        unroll: int = 4,
    ):
        if method not in ("kl", "kl_ito", "lv", "lv_traj"):
            raise ValueError("Unknown loss method.")
        if traj_per_sample == 1 and method == "lv_traj":
            raise ValueError("Cannot compute variance over a single trajectory.")
        self.sde = sde
        self.method = method
        self.traj_per_sample = traj_per_sample
        self.filter_samples = filter_samples
        self.max_rnd = max_rnd
        self.sde_ctrl_noise = sde_ctrl_noise
        self.sde_ctrl_dropout = sde_ctrl_dropout
        self.remat = remat
        self.unroll = unroll

    # -- LV control detachment --------------------------------------------
    @property
    def is_lv(self) -> bool:
        return self.method in ("lv", "lv_traj")

    def _sde_ctrl(self, u: jnp.ndarray, key: jax.Array, t, x) -> jnp.ndarray:
        """Detached simulation control for the log-variance loss, with the
        optional exploration noise/dropout hooks (losses/oc.py:83-103)."""
        sde_ctrl = jax.lax.stop_gradient(u)
        if self.sde_ctrl_noise is not None:
            key, sub = jax.random.split(key)
            sde_ctrl = sde_ctrl + self.sde_ctrl_noise * jax.random.normal(sub, sde_ctrl.shape)
        if self.sde_ctrl_dropout is not None:
            key, sub = jax.random.split(key)
            mask = jax.random.uniform(sub, sde_ctrl.shape) > self.sde_ctrl_dropout
            replacement = -(self.sde.drift(t, x) / self.sde.diff(t, x))
            sde_ctrl = jnp.where(mask, jnp.broadcast_to(replacement, sde_ctrl.shape), sde_ctrl)
        return sde_ctrl

    def supports_flat_lv(self, ts, call_args: frozenset) -> bool:
        """Whether ``lv_flat_call`` (the flat LV training restructuring —
        gradient-free simulation + one batched control evaluation) covers
        this loss with the solver's call-arg set. Default: no."""
        return False

    def _flat_lv_setup(self, key, ts, x):
        """Shared lv_flat_call preamble: guard (plain LV only — the
        noise/dropout hooks inject live randomness the flat cost math
        assumes absent), trajectory repetition, and the per-step noise
        every family's detached simulation consumes."""
        if not self.is_lv or self.sde_ctrl_noise is not None \
                or self.sde_ctrl_dropout is not None:
            raise ValueError("lv_flat_call requires a plain LV loss "
                             "(no sde_ctrl noise/dropout hooks)")
        x = self.repeat_traj(x)
        k_z, k_sim = jax.random.split(key)
        zs = jax.random.normal(k_z, (ts.shape[0] - 1, *x.shape))
        return x, k_sim, zs

    @staticmethod
    def running_cost(u: jnp.ndarray, sde_ctrl: jnp.ndarray, detached: bool) -> jnp.ndarray:
        """Per-step quadratic cost summed over dims: KL = ½‖u‖²,
        LV = u·(ū − ½u) with ū the detached simulation control
        (losses/oc.py:270-274)."""
        if detached:
            return jnp.sum(u * (sde_ctrl - 0.5 * u), axis=-1)
        return 0.5 * jnp.sum(u**2, axis=-1)

    # -- filtering + reduction --------------------------------------------
    def filter_mask(self, rnd: jnp.ndarray, samples=None) -> jnp.ndarray:
        mask = jnp.ones_like(rnd, dtype=bool)
        if samples is not None and self.filter_samples is not None:
            mask = mask & self.filter_samples(samples)
        if self.max_rnd is None:
            return mask & jnp.isfinite(rnd)
        return mask & (rnd < self.max_rnd)

    def reduce(self, rnd: jnp.ndarray, samples=None):
        """Masked mean (kl) / variance (lv) / per-sample trajectory variance
        (lv_traj) of the RND (losses/oc.py:105-131)."""
        mask = self.filter_mask(rnd, samples=samples)
        n_filtered = jnp.sum(~mask)
        if self.method == "lv_traj":
            r = rnd.reshape(self.traj_per_sample, -1)
            m = mask.reshape(self.traj_per_sample, -1).all(axis=0)
            per_sample_var = r.var(axis=0, ddof=1)
            loss = masked_mean(per_sample_var, m)
        elif self.method == "lv":
            loss = masked_var(rnd, mask)
        else:
            loss = masked_mean(rnd, mask)
        return loss, {"train/n_filtered": n_filtered}

    def repeat_traj(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.traj_per_sample != 1:
            return jnp.tile(x, (self.traj_per_sample, 1))
        return x

    def _scan(self, body, carry, xs):
        """Fused trajectory scan: remat'd body (memory ∝ K/unroll instead of
        K when differentiating), unrolled a few steps per iteration to
        amortize the TPU's per-scan-iteration overhead."""
        if self.remat:
            body = jax.checkpoint(body)
        return jax.lax.scan(body, carry, xs, unroll=self.unroll)

    def _noising_states(self, key, x, mean_f, std_f):
        """Control-free reverse (noising) trajectory x_k = mf·x + sf·z:
        the cheap affine scan every EUBO pass shares. Returns the final
        state, the post-step states (K, B, D), and the noises that
        produced them."""
        zs = jax.random.normal(key, (mean_f.shape[0], *x.shape))

        def body(x, inp):
            mf, sf, z = inp
            x = mf * x + sf * z
            return x, x

        x_last, xs = jax.lax.scan(body, x, (mean_f, std_f, zs))
        return x_last, xs, zs
