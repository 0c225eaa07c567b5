"""SMC / PDDS sampler and replica exchange, as fused scans.

Re-design of sde_sampler/additions/ebm_mle.py:11-398:

  smc_sampler — anneal over noise levels high→low; per level: optional PDDS
  reverse-kernel transition with forward/backward transition-prob weights
  (ebm_mle.py:89-107), ESS-gated resampling (systematic by default, replacing
  torch.multinomial), MALA/ULA warmup + sampling with per-chain step-size
  adaptation. One lax.scan over levels, inner scans over MCMC steps.

  re_sampler — replica exchange across all levels simultaneously: chains laid
  out as one (levels·batch) super-batch for the local kernels, even/odd
  level-pair swap proposals every swap_frequency steps (ebm_mle.py:219,266).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.resample import multinomial_resample, systematic_resample
from .kernels import (
    MCMCState,
    heuristics_step_size,
    mala_step,
    precond_mala_step,
    precond_ula_step,
    ula_step,
)


def _mcmc_scan(key, state: MCMCState, log_prob_and_grad, n_steps: int,
               use_ula: bool, target_acceptance: float,
               precond_matrix=None, precond_chol=None, collect: bool = False):
    """n_steps of (precond-)MALA/ULA with adaptation; optionally collect x."""
    use_precond = precond_matrix is not None

    def body(st, k):
        if use_ula:
            if use_precond:
                st = precond_ula_step(k, st, log_prob_and_grad, precond_matrix, precond_chol)
            else:
                st = ula_step(k, st, log_prob_and_grad)
            acc = jnp.zeros(())
        else:
            if use_precond:
                st, log_acc = precond_mala_step(k, st, log_prob_and_grad,
                                                precond_matrix, precond_chol)
            else:
                st, log_acc = mala_step(k, st, log_prob_and_grad)
            if target_acceptance > 0.0:
                st = st._replace(step_size=heuristics_step_size(
                    st.step_size, log_acc, target_acceptance=target_acceptance))
            acc = jnp.exp(jnp.minimum(0.0, log_acc)).mean()
        return st, (st.x, acc) if collect else acc

    keys = jax.random.split(key, n_steps) if n_steps > 0 else jnp.zeros((0, 2), jnp.uint32)
    if n_steps == 0:
        return state, (None, jnp.zeros((0,)))
    state, out = jax.lax.scan(body, state, keys)
    if collect:
        xs, accs = out
        return state, (xs, accs)
    return state, (None, out)


def smc_sampler(
    key: jax.Array,
    x_init: jnp.ndarray,
    times: jnp.ndarray,
    log_prob_and_grads: Callable,
    n_warmup_mcmc_steps: int,
    n_mcmc_steps: int,
    step_sizes_per_noise: jnp.ndarray,
    per_noise_init: bool = False,
    reweight_threshold: float = 1.0,
    use_pdds_weights: bool = False,
    sde=None,
    target_acceptance: float = 0.75,
    precond_matrix_per_noise=None,
    precond_matrix_chol_per_noise=None,
    use_ula: bool = False,
    resampler: str = "systematic",
):
    """Annealed-Langevin / SMC / PDDS sampling (ebm_mle.py:11).

    Args mirror the reference; times (L,) are noise levels iterated from
    index L-1 down to 0; log_prob_and_grads(t, x) evaluates the annealed
    density. Returns (samples (L, n_mcmc, B, D), updated step sizes (L, ...),
    diags {ess (L,), local_acc (L,)}).
    """
    if per_noise_init and reweight_threshold > 0.0:
        raise ValueError("Can't use per_noise_init in SMC mode.")
    if use_pdds_weights and sde is None:
        raise ValueError("Can't use PDDS weights without the SDE object.")
    L = times.shape[0]
    use_precond = precond_matrix_per_noise is not None
    resample_fn = systematic_resample if resampler == "systematic" else multinomial_resample

    if per_noise_init:
        batch = x_init.shape[1]
    else:
        batch = x_init.shape[0]

    # per-level xs for the scan, iterated in reversed level order
    rev = jnp.arange(L - 1, -1, -1)
    xs_levels = {
        "time": times[rev],
        "step_size": step_sizes_per_noise[rev],
        "level_pos": jnp.arange(L),  # 0 = first processed (= level L-1)
    }
    if per_noise_init:
        xs_levels["x_init"] = x_init[rev]
    if use_precond:
        xs_levels["pm"] = precond_matrix_per_noise[rev]
        xs_levels["pc"] = precond_matrix_chol_per_noise[rev]

    x0 = x_init[-1] if per_noise_init else x_init
    lp0, g0 = log_prob_and_grads(times[-1], x0)

    def level_body(carry, inp):
        x_prev, lp_prev, g_prev, log_w, k = carry
        t = inp["time"]
        step_size = inp["step_size"]
        is_first = inp["level_pos"] == 0
        pm = inp.get("pm")
        pc = inp.get("pc")
        cur_lpg = lambda y: log_prob_and_grads(t, y)

        if per_noise_init:
            x = inp["x_init"]
        else:
            x = x_prev
        # re-evaluate at the CURRENT level's time (ebm_mle.py:85): the
        # importance increment is lp_t(x) − lp_{t_prev}(x)
        lp, g = cur_lpg(x)

        k, k_pdds, k_res, k_warm, k_main = jax.random.split(k, 5)

        # --- PDDS reverse-kernel move + transition weights ----------------
        if use_pdds_weights:
            def pdds_move(x, lp, g):
                t_next = inp["t_next"]
                z = jax.random.normal(k_pdds, x.shape)
                x_new = sde.ei_integration_step(
                    x_prev, sde.terminal_t - t_next, sde.terminal_t - t, g_prev, z)
                lp_b = -0.5 * jnp.sum(z**2, axis=-1)
                mf, vf = sde.transition_params(t, t_next)
                lp_f = -0.5 * jnp.sum((mf * x_new - x_prev) ** 2 / vf, axis=-1)
                lp_new, g_new = cur_lpg(x_new)
                return x_new, lp_new, g_new, lp_f - lp_b

            def keep(x, lp, g):
                return x, lp, g, jnp.zeros_like(lp)

            x, lp, g, lw_trans = jax.lax.cond(is_first, keep, pdds_move, x, lp, g)
        else:
            lw_trans = jnp.zeros_like(lp)

        # --- reweight + ESS-gated resampling ------------------------------
        if reweight_threshold > 0.0:
            if use_pdds_weights:
                # accumulate onto the carried weights like the non-PDDS
                # branch: when ESS stays above threshold and no resampling
                # happens, weights must carry across levels or the SMC
                # estimator is biased (the reference's PDDS branch drops
                # them, ebm_mle.py:106-107 `log_weights = ...` vs `+=`;
                # defect not replicated)
                log_w_new = log_w + (lp - lp_prev) + lw_trans
            else:
                log_w_new = log_w + (lp - lp_prev)
            log_w_new = jnp.where(is_first, jnp.zeros_like(log_w_new), log_w_new)
            w = jax.nn.softmax(log_w_new)
            ess = (1.0 / jnp.sum(w**2)) / batch
            do_resample = (ess < reweight_threshold) & (~is_first)

            def resample(args):
                x, lp, g, lw = args
                idx = resample_fn(k_res, log_w_new)
                return x[idx], lp[idx], g[idx], jnp.zeros_like(lw)

            x, lp, g, log_w_new = jax.lax.cond(
                do_resample, resample, lambda a: a, (x, lp, g, log_w_new))
        else:
            log_w_new = log_w
            ess = jnp.ones(())

        # --- MCMC warmup + sampling ---------------------------------------
        state = MCMCState(x=x, log_prob=lp, grad=g,
                          step_size=step_size,
                          precond_grad=_maybe_precond(pm, g))
        state, _ = _mcmc_scan(k_warm, state, cur_lpg, n_warmup_mcmc_steps,
                              use_ula, target_acceptance, pm, pc, collect=False)
        state, (samples, accs) = _mcmc_scan(k_main, state, cur_lpg, n_mcmc_steps,
                                            use_ula, target_acceptance, pm, pc,
                                            collect=True)
        out = {"samples": samples, "step_size": state.step_size,
               "ess": ess, "local_acc": accs.mean()}
        return (state.x, state.log_prob, state.grad, log_w_new, k), out

    if use_pdds_weights:
        # the "next" (previous-iteration) time for each processed level
        xs_levels["t_next"] = jnp.concatenate([times[-1:], times[rev][:-1]])

    carry0 = (x0, lp0, g0, jnp.zeros((batch,)), key)
    _, outs = jax.lax.scan(level_body, carry0, xs_levels)

    # outputs are in processed (reversed) order; flip back to level order
    samples = jnp.flip(outs["samples"], axis=0)
    new_step_sizes = jnp.flip(outs["step_size"], axis=0)
    diags = {"ess": jnp.flip(outs["ess"]), "local_acc": jnp.flip(outs["local_acc"])}
    return samples, new_step_sizes, diags


def _maybe_precond(pm, g):
    if pm is None:
        return None
    return jnp.einsum("...ij,...j->...i", pm, g)


def make_re_pairings(num_noise_levels: int):
    """Even/odd adjacent level pairs for replica exchange (ebm_mle.py:196).

    Computed with numpy — the pairings are static metadata, safe under jit.
    """
    import numpy as np

    arr = np.arange(num_noise_levels)
    mask_a = (arr % 2 == 0) & (arr + 1 < num_noise_levels)
    a = jnp.asarray(np.stack([arr[mask_a], arr[mask_a] + 1], axis=-1))
    mask_b = (arr % 2 == 1) & (arr + 1 < num_noise_levels)
    b = jnp.asarray(np.stack([arr[mask_b], arr[mask_b] + 1], axis=-1))
    return [a, b]


def re_step(key, x, log_prob_x, grad_x, log_prob_and_grads, times, idx_i, idx_j):
    """Vectorized even/odd replica-exchange swap (ebm_mle.py:219).

    x (L, B, D); times (L,); idx_i/idx_j (P,) adjacent level pairs.
    Swaps accepted per (pair, chain) with prob min(1, e^{Δ}).
    """
    p_i_i, p_j_j = log_prob_x[idx_i], log_prob_x[idx_j]
    g_i_i, g_j_j = grad_x[idx_i], grad_x[idx_j]
    p_i_j, g_i_j = _eval_levels(log_prob_and_grads, times[idx_i], x[idx_j])
    p_j_i, g_j_i = _eval_levels(log_prob_and_grads, times[idx_j], x[idx_i])
    log_acc = (p_i_j + p_j_i) - (p_i_i + p_j_j)
    accept = jnp.log(jax.random.uniform(key, log_acc.shape)) < log_acc
    re_acc = accept.mean()
    acc_col = accept[..., None]
    x_i_old, x_j_old = x[idx_i], x[idx_j]
    x = x.at[idx_i].set(jnp.where(acc_col, x_j_old, x_i_old))
    x = x.at[idx_j].set(jnp.where(acc_col, x_i_old, x_j_old))
    log_prob_x = log_prob_x.at[idx_i].set(jnp.where(accept, p_i_j, p_i_i))
    log_prob_x = log_prob_x.at[idx_j].set(jnp.where(accept, p_j_i, p_j_j))
    grad_x = grad_x.at[idx_i].set(jnp.where(acc_col, g_i_j, g_i_i))
    grad_x = grad_x.at[idx_j].set(jnp.where(acc_col, g_j_i, g_j_j))
    return x, log_prob_x, grad_x, re_acc


def _eval_levels(log_prob_and_grads, ts, xs):
    """Evaluate (P, B, D) states at per-level times by flattening to one
    super-batch (the N4 'levels×chains flattened' pattern, ebm_mle.py:310)."""
    P, B, D = xs.shape
    t_flat = jnp.repeat(ts, B)
    lp, g = log_prob_and_grads(t_flat, xs.reshape(-1, D))
    return lp.reshape(P, B), g.reshape(P, B, D)


def re_sampler(
    key: jax.Array,
    x_init: jnp.ndarray,
    times: jnp.ndarray,
    log_prob_and_grads: Callable,
    swap_frequency: int,
    n_warmup_mcmc_steps: int,
    n_mcmc_steps: int,
    step_sizes_per_noise: jnp.ndarray,
    per_noise_init: bool = False,
    target_acceptance: float = 0.75,
    precond_matrix_per_noise=None,
    precond_matrix_chol_per_noise=None,
    use_ula: bool = False,
    init_state: tuple | None = None,
    start_step: int = 0,
):
    """Replica exchange across all levels simultaneously (ebm_mle.py:266).

    log_prob_and_grads(t_flat (N,), x_flat (N, D)) evaluates the annealed
    density at per-sample times. Returns (samples (L, n_mcmc, B, D), step
    sizes (L, B, 1...), diags, final_state) — final_state enables persistent
    replicas across trainer iterations (carried by the EBM-MLE host loop).
    """
    L = times.shape[0]
    if per_noise_init:
        batch = x_init.shape[1]
        D = x_init.shape[-1]
        x = x_init.reshape(-1, D)
    else:
        batch = x_init.shape[0]
        D = x_init.shape[-1]
        x = jnp.tile(x_init, (L, 1))
    t_flat = jnp.repeat(times, batch)
    use_precond = precond_matrix_per_noise is not None
    pm = pc = None
    if use_precond:
        # per-level (L, D, D) matrices expanded per chain to match the
        # flattened (L*B, D) super-batch the kernels see; (L*B, D, D) also
        # accepted directly
        def _expand(mat):
            mat = jnp.asarray(mat)
            if mat.ndim == 3 and mat.shape[0] == L:
                mat = jnp.broadcast_to(mat[:, None], (L, batch, D, D))
            return mat.reshape(-1, D, D)

        pm = _expand(precond_matrix_per_noise)
        pc = _expand(precond_matrix_chol_per_noise)

    local_lpg = lambda y: log_prob_and_grads(t_flat, y)
    if init_state is None:
        lp, g = local_lpg(x)
    else:
        x, lp, g = init_state
    ss = jnp.asarray(step_sizes_per_noise).reshape(L, -1)  # (L, 1) or (L, B)
    if ss.shape[1] not in (1, batch):
        raise ValueError("step_sizes_per_noise must be (L,), (L,1) or (L,B)")
    step_sizes = jnp.broadcast_to(ss[..., None], (L, batch, 1)).reshape(-1, 1)

    pairs = make_re_pairings(L)
    n_pairs = max(int(pairs[0].shape[0]), int(pairs[1].shape[0]))
    # pad the odd pairing to the same length with self-pairs (no-op swaps)
    pair_arr = jnp.stack([
        _pad_pairs(pairs[0], n_pairs), _pad_pairs(pairs[1], n_pairs)], axis=0)

    def body(carry, inp, collect: bool = True):
        x, lp, g, ss, k = carry
        step_id = inp
        k, k_swap, k_local = jax.random.split(k, 3)
        do_swap = (step_id % swap_frequency) == 0
        swap_parity = (step_id // swap_frequency) % 2

        def swap_branch(args):
            x, lp, g, ss = args
            xr = x.reshape(L, batch, D)
            lpr = lp.reshape(L, batch)
            gr = g.reshape(L, batch, D)
            idx = pair_arr[swap_parity]
            xr, lpr, gr, acc = re_step(k_swap, xr, lpr, gr, log_prob_and_grads,
                                       times, idx[:, 0], idx[:, 1])
            return (xr.reshape(-1, D), lpr.reshape(-1), gr.reshape(-1, D), ss), acc

        def local_branch(args):
            x, lp, g, ss = args
            st = MCMCState(x=x, log_prob=lp, grad=g, step_size=ss,
                           precond_grad=_maybe_precond(pm, g))
            if use_ula:
                if use_precond:
                    st = precond_ula_step(k_local, st, local_lpg, pm, pc)
                else:
                    st = ula_step(k_local, st, local_lpg)
                acc = jnp.ones(())
            else:
                if use_precond:
                    st, log_acc = precond_mala_step(k_local, st, local_lpg, pm, pc)
                else:
                    st, log_acc = mala_step(k_local, st, local_lpg)
                if target_acceptance > 0.0:
                    st = st._replace(step_size=heuristics_step_size(
                        st.step_size, log_acc, target_acceptance=target_acceptance))
                acc = jnp.exp(jnp.minimum(0.0, log_acc)).mean()
            return (st.x, st.log_prob, st.grad, st.step_size), acc

        (x, lp, g, ss), acc = jax.lax.cond(do_swap, swap_branch, local_branch,
                                           (x, lp, g, ss))
        # warmup must not emit the population: a per-step (L, batch, D)
        # scan output over n_warmup steps materializes
        # n_warmup·L·batch·D·4 bytes of discarded state (34 GB at the
        # competing protocol's 4096×128×1024×16 — a real-TPU HBM OOM)
        out = (x.reshape(L, batch, D), acc) if collect else acc
        return (x, lp, g, ss, k), out

    steps = jnp.arange(start_step, start_step + n_warmup_mcmc_steps + n_mcmc_steps)
    carry = (x, lp, g, step_sizes, key)
    # warmup phase (no sample collection)
    if n_warmup_mcmc_steps > 0:
        carry, _ = jax.lax.scan(functools.partial(body, collect=False),
                                carry, steps[:n_warmup_mcmc_steps])
    carry, (samples, accs) = jax.lax.scan(body, carry, steps[n_warmup_mcmc_steps:])
    x, lp, g, ss, _ = carry
    samples = jnp.swapaxes(samples, 0, 1)  # (L, n_mcmc, B, D)
    diags = {"acc": accs}
    final_state = (x, lp, g)
    return samples, ss.reshape(L, batch, 1), diags, final_state


def _pad_pairs(p, n):
    if p.shape[0] == n:
        return p
    pad = jnp.zeros((n - p.shape[0], 2), p.dtype)
    return jnp.concatenate([p, pad], axis=0)
