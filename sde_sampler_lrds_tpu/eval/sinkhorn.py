"""Entropy-regularized p-Wasserstein (Sinkhorn) distance, memory-tiled.

TPU re-design of sde_sampler/eval/sinkhorn.py:11-194, which relies on pykeops
JIT-compiled CUDA LazyTensor reductions (the N2 native-equivalent component
of SURVEY.md §2.3). Here the n×m cost matrix is never materialized: row/col
log-sum-exp reductions are computed over blocks inside ``lax.map``, so peak
memory is O(block·m) while the MXU does the pairwise-distance inner products.
The scaling loop is a ``lax.while_loop`` with the reference's stopping rule.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp


def _pairwise_m(xb: jnp.ndarray, y: jnp.ndarray, p: int) -> jnp.ndarray:
    """Cost block M_ij = ||x_i - y_j||_p^p-style distances (block, m).

    p == 2 uses the |x|² + |y|² − 2x·y expansion so the inner product rides
    the MXU; p == 1 falls back to explicit differences.
    """
    if p == 1:
        return jnp.abs(xb[:, None, :] - y[None, :, :]).sum(-1)
    if p == 2:
        sq = (xb**2).sum(-1)[:, None] + (y**2).sum(-1)[None, :] \
            - 2.0 * xb @ y.T
        return jnp.sqrt(jnp.maximum(sq, 0.0))
    # p-norm needs |Δ|^p — a signed power is NaN-prone for odd p
    return (jnp.abs(xb[:, None, :] - y[None, :, :]) ** p).sum(-1) ** (1.0 / p)


class Sinkhorn:
    """Sinkhorn distance with uniform or importance weights.

    Matches the reference semantics: eps-scaled log-domain updates,
    max_iters cap, stop_thresh on the dual increments, n_max subsampling.
    """

    def __init__(self, p: int = 2, eps: float = 1e-3, max_iters: int = 100,
                 stop_thresh: float = 1e-5, n_max: int | None = None,
                 block_size: int = 512, eps_annealing: bool = True,
                 eps_start: float = 1.0, backend: str = "xla", **kwargs):
        if not isinstance(p, int) or p <= 0:
            raise ValueError(f"p must be an integer greater than 0, got {p}")
        if eps <= 0:
            raise ValueError("Entropy regularization term eps must be > 0")
        if backend not in ("xla", "native", "auto", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        self.p = p
        self.eps = eps
        self.max_iters = max_iters
        self.stop_thresh = stop_thresh
        self.n_max = n_max
        self.block_size = block_size
        # 'xla' = tiled lax.map reductions (the default and the fastest
        # tier on TPU — measured round 5, docs/PERF.md §2); 'pallas' = the
        # experimental fused TPU tile kernel (ops/sinkhorn_lse: cost tile +
        # online LSE in VMEM; exact numeric parity but ~10 % slower than
        # the XLA tier on v5e, kept for a future VPU-bound rework;
        # interpret-mode off-TPU); 'native' = the JIT-built C++/OpenMP
        # host library (eval/native, the pykeops-parity tier); 'auto' =
        # xla on a TPU backend, else native when it builds, else xla.
        self.backend = backend
        # ε-scaling: warm-start the duals through a geometric ε schedule.
        # At ε=1e-3 in f32 the raw iteration collapses to alternating hard
        # mins and stalls far from the optimum (the reference's pykeops
        # version has the same failure mode); annealing converges to the
        # true OT cost at the same per-iteration price.
        self.eps_annealing = eps_annealing
        self.eps_start = eps_start

    @property
    def config(self) -> dict:
        """Serializable settings, recorded in experiment result dumps so
        paper-table comparisons are apples-to-apples. With the default
        ``eps_annealing=True`` the values are NOT drop-in comparable to the
        reference pykeops pipeline (which runs raw ε=1e-3 updates and stalls
        in f32); set ``eps_annealing=False`` to reproduce its semantics."""
        return {"p": self.p, "eps": self.eps, "max_iters": self.max_iters,
                "stop_thresh": self.stop_thresh, "n_max": self.n_max,
                "eps_annealing": self.eps_annealing,
                "eps_start": self.eps_start, "backend": self.backend,
                "reference_comparable": not self.eps_annealing}

    def _blocked_lse(self, x, y, dual, eps, transpose: bool):
        """logsumexp_j[(-M_ij + dual_j)/eps] over blocks of rows.

        transpose=False reduces over y (per-x row); True reduces over x.
        """
        a, b = (x, y) if not transpose else (y, x)
        n = a.shape[0]
        bs = min(self.block_size, n)
        pad = (-n) % bs
        a_pad = jnp.pad(a, ((0, pad), (0, 0)))
        blocks = a_pad.reshape(-1, bs, a.shape[-1])

        def one_block(ab):
            m = _pairwise_m(ab, b, self.p)
            return jax.scipy.special.logsumexp((-m + dual[None, :]) / eps, axis=1)

        out = jax.lax.map(one_block, blocks).reshape(-1)
        return out[:n]

    def _lse(self, x, y, dual, eps, transpose: bool, use_pallas: bool):
        if use_pallas:
            from ..ops.sinkhorn_lse import pallas_lse

            a, b = (x, y) if not transpose else (y, x)
            return pallas_lse(a, b, dual, eps, p=self.p)
        return self._blocked_lse(x, y, dual, eps, transpose)

    def compute(self, x, y, w_x=None, w_y=None, use_pallas: bool = False):
        n, m = x.shape[0], y.shape[0]
        if w_x is None:
            w_x = jnp.ones((n,)) / n
        if w_y is None:
            w_y = jnp.ones((m,)) / m
        w_x = jnp.reshape(w_x, (-1,))
        w_y = jnp.reshape(w_y, (-1,))
        log_a = jnp.log(w_x)
        log_b = jnp.log(w_y)

        u0 = jnp.zeros_like(w_x)
        v0 = self.eps * jnp.log(w_y)

        if self.eps_annealing and self.eps_start > self.eps:
            # geometric schedule eps_start -> eps over the first ~2/3 of the
            # budget, then polish at the target eps
            n_anneal = max(int(self.max_iters * 2 / 3), 1)
            decay = (self.eps / self.eps_start) ** (1.0 / n_anneal)
            eps_sched = jnp.maximum(
                self.eps_start * decay ** jnp.arange(self.max_iters), self.eps)
        else:
            eps_sched = jnp.full((self.max_iters,), self.eps)

        def cond(state):
            _, _, err, it = state
            return (err > self.stop_thresh) & (it < self.max_iters)

        def body(state):
            u, v, _, it = state
            eps = eps_sched[it]
            u_new = eps * (log_a - self._lse(x, y, v, eps, False, use_pallas))
            v_new = eps * (log_b - self._lse(x, y, u_new, eps, True, use_pallas))
            err = jnp.maximum(jnp.max(jnp.abs(u - u_new)), jnp.max(jnp.abs(v - v_new)))
            # never stop while still annealing
            err = jnp.where(eps > self.eps, jnp.inf, err)
            return u_new, v_new, err, it + 1

        u, v, _, _ = jax.lax.while_loop(cond, body, (u0, v0, jnp.inf, 0))

        if use_pallas:
            from ..ops.sinkhorn_lse import pallas_transport_cost

            return pallas_transport_cost(x, y, u, v, self.eps, p=self.p)

        # distance = sum_ij P_ij M_ij, accumulated blockwise
        bs = min(self.block_size, n)
        pad = (-n) % bs
        x_pad = jnp.pad(x, ((0, pad), (0, 0)))
        u_pad = jnp.pad(u, (0, pad), constant_values=-jnp.inf)
        xb = x_pad.reshape(-1, bs, x.shape[-1])
        ub = u_pad.reshape(-1, bs)

        def block_dist(args):
            xblk, ublk = args
            mblk = _pairwise_m(xblk, y, self.p)
            pblk = jnp.exp((-mblk + ublk[:, None] + v[None, :]) / self.eps)
            return jnp.sum(pblk * mblk)

        return jnp.sum(jax.lax.map(block_dist, (xb, ub)))

    def compute_native(self, x, y, w_x=None, w_y=None):
        """Host C++/OpenMP path (eval/native). Returns None if unavailable."""
        import numpy as np

        from .native import sinkhorn_native

        x = np.asarray(x)
        y = np.asarray(y)
        n, m = x.shape[0], y.shape[0]
        log_a = np.log(np.full((n,), 1.0 / n) if w_x is None
                       else np.asarray(w_x, np.float64).reshape(-1))
        log_b = np.log(np.full((m,), 1.0 / m) if w_y is None
                       else np.asarray(w_y, np.float64).reshape(-1))
        return sinkhorn_native(
            x, y, log_a, log_b, p=self.p, eps=self.eps,
            eps_start=self.eps_start, anneal=self.eps_annealing,
            max_iters=self.max_iters, stop_thresh=self.stop_thresh)

    def __call__(self, x, y, w_x=None, w_y=None):
        if self.n_max is not None:
            # renormalize truncated weights: balanced Sinkhorn needs equal
            # marginal mass, and a truncated softmax sums to <1 by a
            # side-dependent amount (the reference instead raises on
            # unequal sums, sinkhorn.py:126-133)
            x, y = x[: self.n_max], y[: self.n_max]
            if w_x is not None:
                w_x = w_x[: self.n_max]
                w_x = w_x / w_x.sum()
            if w_y is not None:
                w_y = w_y[: self.n_max]
                w_y = w_y / w_y.sum()
        on_tpu = jax.default_backend() == "tpu"
        # 'auto' no longer picks the Pallas tier on TPU: the round-5
        # uncontended measurement (docs/PERF.md §2, scripts/sinkhorn_bench)
        # has the XLA tier faster at every size and tile config — the
        # kernel stays opt-in/experimental via backend='pallas'.
        if self.backend == "pallas":
            return self.compute(x, y, w_x=w_x, w_y=w_y, use_pallas=True)
        if self.backend == "auto" and on_tpu:
            return self.compute(x, y, w_x=w_x, w_y=w_y)
        if self.backend in ("native", "auto"):
            val = self.compute_native(x, y, w_x=w_x, w_y=w_y)
            if val is not None:
                return val
            if self.backend == "native":
                raise RuntimeError(
                    "native Sinkhorn backend unavailable (no g++ or build "
                    "failed); use backend='xla' or 'auto'")
        return self.compute(x, y, w_x=w_x, w_y=w_y)
