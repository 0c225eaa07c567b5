"""Contrastive maximum-likelihood training of time-indexed EBMs.

Re-design of sde_sampler/additions/ebm_mle.py:401-809. The trainer learns an
annealed energy E(t, x) (usually a GMM/Gauss-tilted potential) so that its
Gibbs distributions match the SDE-noised data at every level:

  positives: analytically noised data  x⁺ = s(t)·x₀ + s(t)√σ²(t)·ε
  negatives: samples of the current model via {annealed_mcmc, smc, smc_pdds,
             replica_exchange (persistent chains), cd}
  loss:      E[E(t,x⁺)] − E[E(t,x⁻)]  (+ 1/σ²(t) reweighting, + energy L2)

TPU design: the negative sampler is one fused scan (mcmc/smc.py) invoked
under jit with the current (stop-gradient) parameters; one jitted
loss-and-update step; persistent replica state and per-level step sizes are
explicit carried arrays, not module buffers. NaN/divergence aborts match the
reference (ebm_mle.py:760-767).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..mcmc.smc import re_sampler, smc_sampler
from ..mcmc.kernels import MCMCState
from ..mcmc.smc import _mcmc_scan
from ..utils.common import get_timesteps

SAMPLER_TYPES = ("annealed_mcmc", "smc", "smc_pdds", "replica_exchange", "cd")


class MaximumLikelihoodEBM:
    def __init__(self, sde, prior, net, sampler_type: str,
                 step_sizes_per_noise=1e-3, precond_matrix_per_noise=None,
                 precond_matrix_chol_per_noise=None, use_ula: bool = False,
                 reweight_threshold: float = 1.0, swap_frequency: int = 16,
                 target_acceptance: float = 0.75, perc_keep_mcmc: float = -1.0,
                 use_snr_adapted_disc: bool = False, start_eps: float = 1e-3,
                 end_eps: float = 0.0, n_steps: int = 100):
        if sampler_type not in SAMPLER_TYPES:
            raise NotImplementedError(f"Sampler {sampler_type} not found.")
        self.sde = sde
        self.prior = prior
        self.net = net  # flax module with energy / unnorm_log_prob_and_grad methods
        self.sampler_type = sampler_type
        self.reweight_threshold = reweight_threshold
        self.swap_frequency = swap_frequency
        self.init_step_size = step_sizes_per_noise
        self.precond_matrix_per_noise = precond_matrix_per_noise
        self.precond_matrix_chol_per_noise = precond_matrix_chol_per_noise
        self.use_precond = precond_matrix_per_noise is not None
        self.use_ula = use_ula
        self.target_acceptance = target_acceptance
        self.use_snr_adapted_disc = use_snr_adapted_disc
        self.perc_keep_mcmc = perc_keep_mcmc
        self.start_eps = start_eps
        self.end_eps = end_eps
        self.n_steps = n_steps
        self.times = get_timesteps(
            start=start_eps, end=sde.terminal_t - end_eps, steps=n_steps,
            sde=sde if use_snr_adapted_disc else None)
        self.params = None
        self.ema_params = None

    # -- model plumbing ------------------------------------------------------
    def init_params(self, key, dim: int):
        t = jnp.zeros((2,))
        x = jnp.zeros((2, dim))
        self.params = self.net.init(key, t, x)
        self.ema_params = self.params
        return self.params

    def log_prob_and_grads(self, params) -> Callable:
        return lambda t, y: self.net.apply(
            params, jnp.reshape(t, (-1,)), y, method="unnorm_log_prob_and_grad")

    def energy(self, params, t, x):
        return self.net.apply(params, jnp.reshape(t, (-1,)), x, method="energy")

    # -- negative sampling ---------------------------------------------------
    def sample_negatives(self, params, key, batch_size: int, step_sizes,
                         n_warmup: int, n_mcmc: int, persistent=None,
                         xs_pos=None):
        """One jit-compatible negative-sampling pass. Returns
        (xs_neg flat (N, D), new_step_sizes, new_persistent, diags)."""
        lpg = self.log_prob_and_grads(jax.lax.stop_gradient(params))
        L = self.times.shape[0]
        k_init, k_run = jax.random.split(key)
        if self.sampler_type in ("annealed_mcmc", "smc", "smc_pdds"):
            x_init = self.prior.sample(k_init, (batch_size,))
            thr = 0.0 if self.sampler_type == "annealed_mcmc" else self.reweight_threshold
            samples, new_ss, diags = smc_sampler(
                k_run, x_init, self.times,
                lambda t, y: lpg(jnp.full((y.shape[0],), t), y),
                n_warmup_mcmc_steps=n_warmup, n_mcmc_steps=n_mcmc,
                step_sizes_per_noise=step_sizes,
                reweight_threshold=thr,
                use_pdds_weights=self.sampler_type == "smc_pdds",
                sde=self.sde if self.sampler_type == "smc_pdds" else None,
                target_acceptance=self.target_acceptance,
                precond_matrix_per_noise=self.precond_matrix_per_noise,
                precond_matrix_chol_per_noise=self.precond_matrix_chol_per_noise,
                use_ula=self.use_ula)
            # level-major flatten: each level's n_mcmc*B rows stay
            # consecutive, matching ts_neg = repeat(times, ...) below
            # (the reference reshapes its (L, n_kept, B, D) buffer the same
            # way, ebm_mle.py:733; a step-major swapaxes here mislabeled
            # negatives' noise levels whenever n_kept > 1)
            xs_neg = samples.reshape(-1, samples.shape[-1])
            return xs_neg, new_ss, persistent, diags
        if self.sampler_type == "replica_exchange":
            # persistent replicas: an (L, B, D) array on the first call, the
            # re_sampler's (x, lp, grad) state tuple afterwards
            if persistent is None:
                x_init = self.prior.sample(k_init, (L, batch_size))
                init_state = None
            elif isinstance(persistent, tuple):
                x_init = persistent[0].reshape(L, batch_size, -1)
                init_state = persistent
            else:
                x_init, init_state = persistent, None
            samples, new_ss, diags, new_persistent = re_sampler(
                k_run, x_init, self.times, lpg,
                swap_frequency=self.swap_frequency,
                n_warmup_mcmc_steps=n_warmup, n_mcmc_steps=n_mcmc,
                step_sizes_per_noise=step_sizes, per_noise_init=True,
                target_acceptance=self.target_acceptance,
                precond_matrix_per_noise=self.precond_matrix_per_noise,
                precond_matrix_chol_per_noise=self.precond_matrix_chol_per_noise,
                use_ula=self.use_ula, init_state=init_state)
            xs_neg = samples.reshape(-1, samples.shape[-1])
            return xs_neg, new_ss, new_persistent, diags
        # 'cd': contrastive divergence from the positives (ebm_mle.py:528)
        t_flat = jnp.repeat(self.times, xs_pos.shape[0] // L)
        local_lpg = lambda y: lpg(t_flat, y)
        lp0, g0 = local_lpg(xs_pos)
        ss_flat = jnp.broadcast_to(jnp.reshape(step_sizes, (-1, 1)),
                                   (xs_pos.shape[0], 1))
        state = MCMCState(x=xs_pos, log_prob=lp0, grad=g0, step_size=ss_flat)
        state, (samples, accs) = _mcmc_scan(
            k_run, state, local_lpg, n_warmup + n_mcmc, self.use_ula,
            self.target_acceptance, collect=True)
        # (n_kept, L, B, D) -> level-major rows to match ts_neg (the
        # reference's cd branch flattens its buffer step-major against a
        # level-major ts_neg, ebm_mle.py:537,733 — mislabeled levels for
        # n_kept > 1; defect not replicated)
        dim = xs_pos.shape[-1]
        xs_neg = (samples[n_warmup:]
                  .reshape(n_mcmc, L, -1, dim)
                  .swapaxes(0, 1)
                  .reshape(-1, dim))
        return xs_neg, state.step_size, persistent, {"acc": accs.mean()}

    # -- training --------------------------------------------------------------
    def train(self, key, data: jnp.ndarray, batch_size: int, n_epochs: int,
              reweight_loss: bool = False, lr: float = 3e-4, decay: float = 0.0,
              clip_val: float = 1.0, initial_n_warmup_mcmc_steps: int = 1024,
              n_mcmc_steps: int = 32, n_accumulation_steps: int = 1,
              reg_val: float = 0.0, use_ema: bool = False,
              ema_decay: float = 0.995, ema_steps: int = 10,
              batches_per_call: int = 1, verbose: bool = False,
              select_fn=None, select_every: int | None = None):
        """Fused contrastive-MLE training.

        The first batch (with its long ``initial_n_warmup_mcmc_steps`` warmup)
        runs as one jitted call; the remaining ``n_epochs × n_batches − 1``
        updates are fused ``batches_per_call`` at a time into a single
        ``lax.scan`` whose carry holds (params, grad accumulator, opt state,
        EMA, per-level MCMC step sizes, persistent replica state, current
        negative pool). Per-step PRNG keys are derived by ``fold_in`` on the
        global step index, so results are bit-identical for every
        ``batches_per_call`` value; NaN/divergence aborts (ebm_mle.py:760-767)
        are checked on the host after each fused call.

        ``n_accumulation_steps`` = A > 1 reproduces the reference's gradient
        accumulation exactly (ebm_mle.py:702,755-758,785), with PER-EPOCH
        group boundaries: negatives are resampled when the batch index WITHIN
        the epoch hits a multiple of A (and reused in between), micro-losses
        are scaled by 1/A — or by 1/(n_batches % A) in the ragged tail group —
        and the accumulated gradient is applied both at group boundaries and
        at epoch end, so groups never drift across epochs even when
        n_batches % A != 0. (Because the params are frozen within a group,
        recomputing the negative energy each micro-step is exactly the
        reference's retain_graph re-backward.)

        ``select_fn(params) -> float`` enables best-checkpoint selection
        (higher is better — e.g. forward ESS of the reference against the
        target, the protocol that stabilizes seed-fragile contrastive runs:
        under-training leaves the tilt ≈ 0, over-training locks onto the
        dataset's empirical mode balance; the score peaks in between). It is
        evaluated on the live (EMA if ``use_ema``) params at fused-call
        boundaries, at most every ``select_every`` optimizer-loop steps
        (default: one epoch); the best params/score/step are stored on
        ``self.best_params`` / ``self.best_score`` / ``self.best_step``.

        ``use_ema`` mirrors the reference's AveragedModel schedule
        (ebm_mle.py:622-626, 790): one blend every ``ema_steps`` optimizer
        steps with the 'adjusted' coefficient
        alpha = min(1, (1-ema_decay)·A·L·eff_batch·ema_steps/n_epochs)
        — note that at experiment scale this adjustment saturates at alpha=1,
        i.e. the reference's "EMA" degenerates to a lagged parameter copy;
        pass a larger ema_decay/n_epochs ratio for a real average.

        Returns (losses, grad_norms, diagnostics).
        """
        L = self.times.shape[0]
        dim = data.shape[-1]
        if self.params is None:
            key, sub = jax.random.split(key)
            self.init_params(sub, dim)

        if self.perc_keep_mcmc > 0:
            n_warmup = int((1.0 - self.perc_keep_mcmc) * n_mcmc_steps)
            n_kept = max(int(self.perc_keep_mcmc * n_mcmc_steps), 1)
        else:
            n_warmup = n_mcmc_steps - 1
            n_kept = 1
        eff_batch = min(batch_size * n_kept, data.shape[0]) \
            if self.sampler_type != "cd" else batch_size

        n_acc = int(n_accumulation_steps)
        if n_acc != 1 and self.sampler_type == "cd":
            raise ValueError(
                "Can't use n_accumulation_steps != 1 if sampler_type is CD.")
        tx = optax.adamw(lr, weight_decay=decay) if decay > 0 else optax.adam(lr)
        if clip_val > 0:
            tx = optax.chain(optax.clip_by_global_norm(clip_val), tx)
        opt_state = tx.init(self.params)

        ts_pos = jnp.repeat(self.times, eff_batch)  # (L*eff_batch,)
        mean_f = self.sde.s(ts_pos)[:, None]
        std_f = mean_f * jnp.sqrt(self.sde.sigma_sq(ts_pos))[:, None]
        loss_scale = (1.0 / self.sde.sigma_sq(ts_pos)) if reweight_loss else 1.0

        step_sizes = jnp.asarray(self.init_step_size)
        if step_sizes.ndim == 0:
            step_sizes = jnp.full((L, batch_size, 1), float(step_sizes))
        elif step_sizes.ndim == 1:
            step_sizes = jnp.broadcast_to(step_sizes[:, None, None], (L, batch_size, 1))

        persistent = None
        if self.sampler_type == "replica_exchange":
            key, sub = jax.random.split(key)
            if hasattr(self.net, "sample_prior"):
                t_rep = jnp.repeat(self.times, batch_size)
                x0 = self.net.apply(self.params, sub, t_rep, method="sample_prior")
                persistent = x0.reshape(L, batch_size, dim)
            else:
                persistent = self.prior.sample(sub, (L, batch_size))

        def loss_fn(params, ts_p, xs_p, ts_n, xs_n):
            en_pos = self.energy(params, ts_p, xs_p)
            en_neg = self.energy(params, ts_n, xs_n)
            if self.sampler_type == "cd":
                loss = en_pos.mean() - en_neg.mean()
            else:
                loss = jnp.mean(loss_scale * (en_pos - en_neg))
            if reg_val > 0:
                loss = loss + reg_val * (jnp.mean(en_pos**2) + jnp.mean(en_neg**2))
            return loss

        n_batches = data.shape[0] // eff_batch
        total_steps = n_epochs * n_batches
        if total_steps == 0:
            return np.zeros((0,)), np.zeros((0,)), []
        is_cd = self.sampler_type == "cd"
        tail = n_batches % n_acc  # ragged last accumulation group of an epoch
        # reference AveragedModel 'adjusted alpha' (ebm_mle.py:622-626)
        ema_alpha = min(1.0, (1.0 - ema_decay) * n_acc * L * eff_batch
                        * ema_steps / n_epochs) if use_ema else 0.0

        # Deterministic schedule: permutation per epoch + per-step keys are all
        # fold_in derivatives, so the fused scan matches batches_per_call=1.
        key, k_perm, k_step = jax.random.split(key, 3)
        idx_all = jnp.stack([
            jax.random.permutation(jax.random.fold_in(k_perm, e),
                                   data.shape[0])[:n_batches * eff_batch]
            for e in range(n_epochs)]).reshape(total_steps, eff_batch)
        step_ids = jnp.arange(total_steps)

        def one_step(params, grad_acc, opt_state, opt_step, ema, step_sizes,
                     persistent, neg_pool, idx, step_id, warm,
                     force_sample: bool):
            k = jax.random.fold_in(k_step, step_id)
            k_noise, k_neg = jax.random.split(k)
            batch = jnp.take(data, idx, axis=0)
            eps = jax.random.normal(k_noise, (ts_pos.shape[0], dim))
            xs_pos = mean_f * jnp.tile(batch, (L, 1)) + std_f * eps
            # group boundaries are PER EPOCH (ebm_mle.py:702): the batch index
            # within the epoch, not the global step, decides resampling/apply
            batch_in_epoch = step_id % n_batches

            def sample(_):
                return self.sample_negatives(
                    params, k_neg, batch_size, step_sizes, warm, n_kept,
                    persistent=persistent, xs_pos=xs_pos if is_cd else None)

            if force_sample or n_acc == 1:
                xs_neg, step_sizes_n, persistent_n, diags = sample(None)
            else:
                # accumulation group: refresh the negative pool at each
                # per-epoch group start, reuse it (and sampler state) between
                xs_neg_p, diags_p = neg_pool
                xs_neg, step_sizes_n, persistent_n, diags = jax.lax.cond(
                    (batch_in_epoch % n_acc) == 0, sample,
                    lambda _: (xs_neg_p, step_sizes, persistent, diags_p),
                    None)
            neg_pool = (xs_neg, diags)
            ts_neg = jnp.repeat(self.times, xs_neg.shape[0] // L)
            # micro-loss scaling anticipates the group averaging: 1/A, or
            # 1/(n_batches % A) in the ragged tail group (ebm_mle.py:755-758)
            if n_acc > 1 and tail > 0:
                denom = jnp.where(batch_in_epoch >= n_batches - tail,
                                  float(tail), float(n_acc))
            else:
                denom = float(n_acc)

            def scaled_loss(p):
                return loss_fn(p, ts_pos, xs_pos, ts_neg, xs_neg) / denom

            loss, grads = jax.value_and_grad(scaled_loss)(params)
            grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
            # logged PRE-clip, like the reference's clip_grad_norm_ return
            # value — otherwise grad_norms saturates at clip_val and
            # exploding gradients are invisible
            gnorm = optax.global_norm(grad_acc)
            if clip_val > 0:
                # the reference clips the ACCUMULATED grad in place after
                # every micro-step (ebm_mle.py clip_grad_norm_ before the
                # boundary step), so accumulation is g <- clip(g + g_i);
                # the boundary-time optax clip is then a no-op
                scale = jnp.where(gnorm > clip_val, clip_val / gnorm, 1.0)
                grad_acc = jax.tree.map(lambda g: g * scale, grad_acc)
            # optimizer step at group boundaries AND at epoch end, so the
            # ragged tail group never drifts into the next epoch
            do_apply = (((batch_in_epoch + 1) % n_acc) == 0) | \
                (batch_in_epoch + 1 == n_batches)
            updates, new_opt = tx.update(grad_acc, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            sel = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(do_apply, a, b), new, old)
            params = sel(new_params, params)
            opt_state = sel(new_opt, opt_state)
            grad_acc = sel(jax.tree.map(jnp.zeros_like, grad_acc), grad_acc)
            opt_step = opt_step + do_apply.astype(jnp.int32)
            if use_ema:
                # one blend every ema_steps optimizer steps with the adjusted
                # alpha (ebm_mle.py:622,790)
                do_ema = do_apply & ((opt_step % ema_steps) == 0)
                a = jnp.where(do_ema, ema_alpha, 0.0)
                ema = jax.tree.map(lambda e, p: (1 - a) * e + a * p,
                                   ema, params)
            else:
                ema = params
            diag_means = jax.tree.map(jnp.mean, diags)
            return params, grad_acc, opt_state, opt_step, ema, step_sizes_n, \
                persistent_n, neg_pool, loss, gnorm, diag_means

        @jax.jit
        def first_step(params, grad_acc, opt_state, opt_step, ema, step_sizes,
                       persistent, idx, step_id):
            return one_step(params, grad_acc, opt_state, opt_step, ema,
                            step_sizes, persistent, None, idx, step_id,
                            initial_n_warmup_mcmc_steps, force_sample=True)

        def scan_body(carry, inp):
            params, grad_acc, opt_state, opt_step, ema, step_sizes, \
                persistent, neg_pool = carry
            idx, step_id = inp
            params, grad_acc, opt_state, opt_step, ema, step_sizes, \
                persistent, neg_pool, loss, gnorm, dm = one_step(
                    params, grad_acc, opt_state, opt_step, ema, step_sizes,
                    persistent, neg_pool, idx, step_id, n_warmup,
                    force_sample=False)
            return (params, grad_acc, opt_state, opt_step, ema, step_sizes,
                    persistent, neg_pool), (loss, gnorm, dm)

        @jax.jit
        def fused_steps(carry, idxs, sids):
            return jax.lax.scan(scan_body, carry, (idxs, sids))

        def check_abort(loss_block, offset):
            bad = ~np.isfinite(loss_block)
            if bad.any():
                raise RuntimeError(
                    f"NaN loss detected at step {offset + int(bad.argmax())}.")
            big = np.abs(loss_block) > 1e9
            if big.any():
                i = int(big.argmax())
                raise RuntimeError(
                    f"Training diverged (loss = {loss_block[i]:.2e}) at step "
                    f"{offset + i}.")

        losses, grad_norms, diagnostics = [], [], []
        self.best_params = self.best_score = self.best_step = None
        # full (step, score) trace of every select_fn evaluation — the
        # over/under-training diagnostic curve (docs/RESULTS.md MNIST)
        self.select_history = []
        sel_every = select_every if select_every is not None else n_batches
        sel_last = [-(10**9)]

        def maybe_select(step_pos, params, ema):
            if select_fn is None or step_pos - sel_last[0] < sel_every:
                return
            sel_last[0] = step_pos
            score = float(select_fn(ema if use_ema else params))
            self.select_history.append((int(step_pos), score))
            if np.isfinite(score) and (self.best_score is None
                                       or score > self.best_score):
                self.best_score, self.best_step = score, step_pos
                self.best_params = ema if use_ema else params

        # score the untrained params too: with a zero-init tilt this is the
        # GMM-only baseline every later point on the curve is judged against
        maybe_select(0, self.params, self.ema_params)
        sel_last[0] = -(10**9)

        grad_acc = jax.tree.map(jnp.zeros_like, self.params)
        opt_step = jnp.asarray(0, jnp.int32)
        # first batch: long initial warmup, also normalizes the persistent
        # replica state to the re_sampler's (x, lp, grad) tuple for the scan
        self.params, grad_acc, opt_state, opt_step, self.ema_params, \
            step_sizes, persistent, neg_pool, loss, gnorm, dm = first_step(
                self.params, grad_acc, opt_state, opt_step, self.ema_params,
                step_sizes, persistent, idx_all[0], step_ids[0])
        loss_block = np.asarray([float(loss)])
        check_abort(loss_block, 0)
        losses.append(float(loss))
        grad_norms.append(float(gnorm))
        diagnostics.append(jax.tree.map(float, dm))
        maybe_select(1, self.params, self.ema_params)

        spc = max(int(batches_per_call), 1)
        pos = 1
        carry = (self.params, grad_acc, opt_state, opt_step, self.ema_params,
                 step_sizes, persistent, neg_pool)
        while pos < total_steps:
            hi = min(pos + spc, total_steps)
            # the ragged tail compiles once more at its shorter scan length
            if hi - pos != spc:
                spc = hi - pos
            carry, (loss_b, gnorm_b, dm_b) = fused_steps(
                carry, idx_all[pos:hi], step_ids[pos:hi])
            loss_block = np.asarray(loss_b)
            check_abort(loss_block, pos)
            losses.extend(loss_block.tolist())
            grad_norms.extend(np.asarray(gnorm_b).tolist())
            dm_host = jax.tree.map(np.asarray, dm_b)
            for i in range(hi - pos):
                diagnostics.append(jax.tree.map(lambda v: float(v[i]), dm_host))
            pos = hi
            maybe_select(pos, carry[0], carry[4])
        self.params, _grad_acc, opt_state, _opt_step, self.ema_params, \
            step_sizes, persistent, _ = carry
        # always score the final params so select_fn covers the whole run
        sel_last[0] = -(10**9)
        maybe_select(total_steps, self.params, self.ema_params)
        return np.asarray(losses), np.asarray(grad_norms), diagnostics
