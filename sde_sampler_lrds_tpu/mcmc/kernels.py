"""Batched MCMC kernels: MALA / ULA / RWMH and preconditioned variants.

Re-design of sde_sampler/additions/mcmc.py:54-293 as pure functional,
vmap/scan-friendly kernels: state in, state out, explicit PRNG keys,
``jnp.where`` acceptance instead of boolean-mask in-place writes (the N4
native-equivalent piece of SURVEY.md §2.3). Per-chain step sizes adapt via
the reference's log-space acceptance-targeting heuristic.

State caches (log_prob, grad) so each step costs exactly one target
log_prob_and_grad evaluation.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class MCMCState(NamedTuple):
    """Carried chain state: positions (B, D), cached log-probs (B,), cached
    scores (B, D), per-chain step sizes (B, 1), optional preconditioned
    scores (B, D)."""

    x: jnp.ndarray
    log_prob: jnp.ndarray
    grad: jnp.ndarray
    step_size: jnp.ndarray
    precond_grad: jnp.ndarray | None = None

    @classmethod
    def init(cls, x, log_prob_and_grad: Callable, step_size,
             precond_matrix=None):
        lp, g = log_prob_and_grad(x)
        step_size = jnp.broadcast_to(jnp.asarray(step_size, x.dtype),
                                     (x.shape[0],) + (1,) * (x.ndim - 1))
        pg = None
        if precond_matrix is not None:
            pg = _apply_precond(precond_matrix, g)
        return cls(x=x, log_prob=lp, grad=g, step_size=step_size, precond_grad=pg)


def _apply_precond(m, g):
    return jnp.einsum("...ij,...j->...i", m, g)


def heuristics_step_size(step_size, log_acc, target_acceptance: float = 0.75,
                         factor: float = 1.01, tol: float = 0.05):
    """Per-chain multiplicative step-size adaptation in log space
    (mcmc.py:54): grow when acceptance is above target, shrink when below."""
    shape = (-1,) + (1,) * (step_size.ndim - 1)
    la = jnp.reshape(log_acc, shape)
    log_t = math.log(target_acceptance)
    up = (la - log_t) > math.log1p(tol)
    down = (log_t - la) > -math.log1p(-tol)
    return jnp.where(up, step_size * factor,
                     jnp.where(down, step_size / factor, step_size))


def _langevin_proposal(key, state: MCMCState, drift):
    noise = jax.random.normal(key, state.x.shape, state.x.dtype)
    return state.x + state.step_size * drift + jnp.sqrt(2.0 * state.step_size) * noise


def mala_step(key, state: MCMCState, log_prob_and_grad: Callable):
    """Metropolis-adjusted Langevin step (mcmc.py:75).

    Returns (new_state, log_acc (B,))."""
    k_prop, k_acc = jax.random.split(key)
    y = _langevin_proposal(k_prop, state, state.grad)
    lp_y, g_y = log_prob_and_grad(y)
    ss = state.step_size
    axes = tuple(range(1, state.x.ndim))
    # q(y|x) = N(x + ss*grad, 2*ss I)  ->  log q = -||.||^2 / (4*ss)
    fwd = -jnp.sum((y - state.x - ss * state.grad) ** 2, axis=axes) / (4 * ss[:, 0])
    bwd = -jnp.sum((state.x - y - ss * g_y) ** 2, axis=axes) / (4 * ss[:, 0])
    log_acc = (lp_y + bwd) - (state.log_prob + fwd)
    accept = jnp.log(jax.random.uniform(k_acc, log_acc.shape)) < log_acc
    acc_col = accept.reshape((-1,) + (1,) * (state.x.ndim - 1))
    new = state._replace(
        x=jnp.where(acc_col, y, state.x),
        log_prob=jnp.where(accept, lp_y, state.log_prob),
        grad=jnp.where(acc_col, g_y, state.grad))
    return new, log_acc


def precond_mala_step(key, state: MCMCState, log_prob_and_grad: Callable,
                      precond_matrix, precond_matrix_chol):
    """Preconditioned MALA with the Prop-1 optimized MH ratio of
    arXiv:2305.14442 (mcmc.py:137)."""
    k_prop, k_acc = jax.random.split(key)
    ss = state.step_size
    noise = jax.random.normal(k_prop, state.x.shape, state.x.dtype)
    y = state.x + ss * state.precond_grad + jnp.sqrt(2.0 * ss) * \
        jnp.einsum("...ij,...j->...i", precond_matrix_chol, noise)
    lp_y, g_y = log_prob_and_grad(y)
    pg_y = _apply_precond(precond_matrix, g_y)
    axes = tuple(range(1, state.x.ndim))
    log_acc = lp_y - state.log_prob
    log_acc += 0.5 * jnp.sum((state.x - y - 0.5 * ss * pg_y) * g_y, axis=axes)
    log_acc -= 0.5 * jnp.sum((y - state.x - 0.5 * ss * state.precond_grad) * state.grad, axis=axes)
    accept = jnp.log(jax.random.uniform(k_acc, log_acc.shape)) < log_acc
    acc_col = accept.reshape((-1,) + (1,) * (state.x.ndim - 1))
    new = state._replace(
        x=jnp.where(acc_col, y, state.x),
        log_prob=jnp.where(accept, lp_y, state.log_prob),
        grad=jnp.where(acc_col, g_y, state.grad),
        precond_grad=jnp.where(acc_col, pg_y, state.precond_grad))
    return new, log_acc


def ula_step(key, state: MCMCState, log_prob_and_grad: Callable):
    """Unadjusted Langevin step (mcmc.py:189)."""
    y = _langevin_proposal(key, state, state.grad)
    lp_y, g_y = log_prob_and_grad(y)
    return state._replace(x=y, log_prob=lp_y, grad=g_y)


def precond_ula_step(key, state: MCMCState, log_prob_and_grad: Callable,
                     precond_matrix, precond_matrix_chol):
    """Preconditioned ULA (mcmc.py:224)."""
    ss = state.step_size
    noise = jax.random.normal(key, state.x.shape, state.x.dtype)
    y = state.x + ss * state.precond_grad + jnp.sqrt(2.0 * ss) * \
        jnp.einsum("...ij,...j->...i", precond_matrix_chol, noise)
    lp_y, g_y = log_prob_and_grad(y)
    return state._replace(x=y, log_prob=lp_y, grad=g_y,
                          precond_grad=_apply_precond(precond_matrix, g_y))


def rwmh_step(key, state: MCMCState, log_prob: Callable):
    """Random-walk Metropolis-Hastings step (mcmc.py:256)."""
    k_prop, k_acc = jax.random.split(key)
    y = state.x + state.step_size * jax.random.normal(k_prop, state.x.shape, state.x.dtype)
    lp_y = jnp.reshape(log_prob(y), (-1,))
    log_acc = lp_y - state.log_prob
    accept = jnp.log(jax.random.uniform(k_acc, log_acc.shape)) < log_acc
    acc_col = accept.reshape((-1,) + (1,) * (state.x.ndim - 1))
    new = state._replace(x=jnp.where(acc_col, y, state.x),
                         log_prob=jnp.where(accept, lp_y, state.log_prob))
    return new, log_acc


def run_chain(key, state: MCMCState, log_prob_and_grad: Callable, n_steps: int,
              kernel: str = "mala", target_acceptance: float = 0.75,
              precond_matrix=None, precond_matrix_chol=None,
              collect: bool = True):
    """Scan n_steps of a kernel with step-size adaptation.

    Returns (final_state, samples (n_steps, B, D) or None).
    """
    use_precond = precond_matrix is not None

    def body(carry, k):
        st = carry
        if kernel == "mala":
            if use_precond:
                st, log_acc = precond_mala_step(k, st, log_prob_and_grad,
                                                precond_matrix, precond_matrix_chol)
            else:
                st, log_acc = mala_step(k, st, log_prob_and_grad)
            if target_acceptance > 0.0:
                st = st._replace(step_size=heuristics_step_size(
                    st.step_size, log_acc, target_acceptance=target_acceptance))
        elif kernel == "ula":
            if use_precond:
                st = precond_ula_step(k, st, log_prob_and_grad,
                                      precond_matrix, precond_matrix_chol)
            else:
                st = ula_step(k, st, log_prob_and_grad)
        elif kernel == "rwmh":
            st, log_acc = rwmh_step(k, st, lambda y: log_prob_and_grad(y)[0])
            if target_acceptance > 0.0:
                st = st._replace(step_size=heuristics_step_size(
                    st.step_size, log_acc, target_acceptance=target_acceptance))
        else:
            raise ValueError(f"Unknown kernel {kernel!r}")
        return st, (st.x if collect else None)

    keys = jax.random.split(key, n_steps)
    final, samples = jax.lax.scan(body, state, keys)
    return final, samples
