"""Pallas TPU kernel for the Sinkhorn log-sum-exp reduction.

The Sinkhorn scaling loop (eval/sinkhorn.py, the N2 native-equivalent of
SURVEY.md §2.3 — reference: pykeops LazyTensor CUDA reductions,
sde_sampler/eval/sinkhorn.py:112-170) spends its time in

    lse_i = logsumexp_j [ (-M_ij + dual_j) / eps ],   M_ij = ||x_i - y_j||_p

The blocked-XLA path materializes each (block, m) cost block in HBM and
reads it back for the reduction; at the reference eval scale (n = m = 8192)
that is ~16 MiB of HBM traffic per block per iteration while the actual
math is a rank-d matmul. This kernel fuses the cost computation and the
reduction: the grid tiles (rows × cols), each (bn, bm) cost tile is
computed in VMEM (p = 2 rides the MXU via the |x|²+|y|²−2x·yᵀ expansion)
and immediately folded into a running (max, sumexp) accumulator held in
VMEM scratch — the flash-attention online-LSE pattern — so the cost matrix
never exists in HBM at all.

Masking: callers pad rows/cols to tile multiples; padded *columns* are
neutralized by padding ``dual`` with −inf (their logits become −inf exactly
as in the unpadded reduction), padded *rows* produce garbage that the
wrapper slices off.

The same tiling computes the final transport cost
Σ_ij exp((−M_ij + u_i + v_j)/eps)·M_ij (``transport_cost``), accumulated
per row tile and summed on the host side of the pallas_call.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def _cost_tile(xb, yb, p: int):
    """(bn, bm) p-norm distance tile. p == 2 uses the MXU expansion."""
    if p == 2:
        sq = (xb * xb).sum(-1)[:, None] + (yb * yb).sum(-1)[None, :] \
            - 2.0 * jnp.dot(xb, yb.T, preferred_element_type=jnp.float32)
        return jnp.sqrt(jnp.maximum(sq, 0.0))
    if p == 1:
        return jnp.abs(xb[:, None, :] - yb[None, :, :]).sum(-1)
    return (jnp.abs(xb[:, None, :] - yb[None, :, :]) ** p).sum(-1) ** (1.0 / p)


def _lse_kernel(p: int, n_col_tiles: int,
                eps_ref, x_ref, y_ref, dual_ref, o_ref, m_scr, s_scr):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, _NEG_INF, jnp.float32)
        s_scr[:] = jnp.zeros(s_scr.shape, jnp.float32)

    cost = _cost_tile(x_ref[:], y_ref[:], p)                    # (bn, bm)
    # dual arrives lane-major (1, bm): broadcasting it against the cost tile
    # directly avoids an in-kernel (bm,1)->(1,bm) relayout that crashes the
    # Mosaic compiler outright when it is the kernel's only row-vector
    # operand (tpu_compile_helper exit 1; bisected on v5e, round 4 — the
    # same expression compiles fine inside _cost_sum_kernel where a
    # sublane-major u term is also present).
    logits = (dual_ref[:] - cost) / eps_ref[0]
    tile_max = jnp.max(logits, axis=1, keepdims=True)           # (bn, 1)
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, tile_max)
    # exp(-inf - -inf) guard: a tile whose every logit is -inf (all-padded
    # columns) must contribute 0, not NaN
    shift = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    s_scr[:] = s_scr[:] * jnp.exp(jnp.where(jnp.isfinite(m_old),
                                            m_old - shift, _NEG_INF)) \
        + jnp.sum(jnp.exp(logits - shift), axis=1, keepdims=True)
    m_scr[:] = m_new

    @pl.when(j == n_col_tiles - 1)
    def _emit():
        m, s = m_scr[:], s_scr[:]
        o_ref[:] = jnp.where(jnp.isfinite(m), m + jnp.log(s), _NEG_INF)


def _cost_sum_kernel(p: int, n_col_tiles: int,
                     eps_ref, x_ref, y_ref, u_ref, v_ref, o_ref, acc_scr):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    cost = _cost_tile(x_ref[:], y_ref[:], p)
    # u is sublane-major (bn, 1); v arrives lane-major (1, bm) so no
    # in-kernel relayout is needed (see _lse_kernel)
    logits = (u_ref[:] + v_ref[:] - cost) / eps_ref[0]
    # padded rows carry u = -inf, padded cols v = -inf -> exp(.) = 0
    acc_scr[:] = acc_scr[:] + jnp.sum(jnp.exp(logits) * cost, axis=1,
                                      keepdims=True)

    @pl.when(j == n_col_tiles - 1)
    def _emit():
        o_ref[:] = acc_scr[:]


def _pad_rows(a, mult):
    pad = (-a.shape[0]) % mult
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return a


def _tile_sizes(p: int, d: int, bn: int, bm: int) -> tuple[int, int]:
    """p ≠ 2 broadcasts a (bn, bm, d) difference tensor inside the kernel;
    shrink the tile so it stays well under the VMEM budget."""
    if p != 2:
        while bn * bm * d * 4 > (2 << 20) and bm > 128:
            bm //= 2
        while bn * bm * d * 4 > (2 << 20) and bn > 8:
            bn //= 2
    return bn, bm


def pallas_lse(x, y, dual, eps, p: int = 2, bn: int = 256, bm: int = 2048,
               interpret: bool | None = None):
    """Fused logsumexp_j[(−M_ij + dual_j)/eps] over all rows of x.

    x: (n, d), y: (m, d), dual: (m,), eps: scalar (traced OK).
    Returns (n,) float32. Rows/cols are padded to tile multiples inside;
    padded columns are masked via dual = −inf.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    bn, bm = _tile_sizes(p, x.shape[1], bn, bm)
    bn = min(bn, _round_up(n, 8))
    bm = min(bm, _round_up(y.shape[0], 128))
    x = _pad_rows(jnp.asarray(x, jnp.float32), bn)
    y_p = _pad_rows(jnp.asarray(y, jnp.float32), bm)
    # lane-major (1, m_pad) layout — see the relayout note in _lse_kernel
    dual = _pad_rows(jnp.asarray(dual, jnp.float32).reshape(-1, 1), bm)
    dual = jnp.where(
        jnp.arange(dual.shape[0])[:, None] < y.shape[0], dual, _NEG_INF)
    dual = dual.reshape(1, -1)
    n_pad, m_pad = x.shape[0], y_p.shape[0]
    grid = (n_pad // bn, m_pad // bm)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_lse_kernel, p, grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # eps
            pl.BlockSpec((bn, x.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, x.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bn, 1), jnp.float32),
                        pltpu.VMEM((bn, 1), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(eps, jnp.float32).reshape(1), x, y_p, dual)
    return out[:n, 0]


def pallas_transport_cost(x, y, u, v, eps, p: int = 2, bn: int = 256,
                          bm: int = 2048, interpret: bool | None = None):
    """Σ_ij exp((−M_ij + u_i + v_j)/eps)·M_ij, fused and tiled.

    Padded rows/cols are masked by padding u/v with −inf.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m = x.shape[0], y.shape[0]
    bn, bm = _tile_sizes(p, x.shape[1], bn, bm)
    bn = min(bn, _round_up(n, 8))
    bm = min(bm, _round_up(m, 128))
    x_p = _pad_rows(jnp.asarray(x, jnp.float32), bn)
    y_p = _pad_rows(jnp.asarray(y, jnp.float32), bm)
    u_p = _pad_rows(jnp.asarray(u, jnp.float32).reshape(-1, 1), bn)
    v_p = _pad_rows(jnp.asarray(v, jnp.float32).reshape(-1, 1), bm)
    u_p = jnp.where(jnp.arange(u_p.shape[0])[:, None] < n, u_p, _NEG_INF)
    v_p = jnp.where(jnp.arange(v_p.shape[0])[:, None] < m, v_p, _NEG_INF)
    v_p = v_p.reshape(1, -1)
    grid = (x_p.shape[0] // bn, y_p.shape[0] // bm)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_cost_sum_kernel, p, grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # eps
            pl.BlockSpec((bn, x.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, x.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x_p.shape[0], 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bn, 1), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(eps, jnp.float32).reshape(1), x_p, y_p, u_p, v_p)
    return jnp.sum(out[:n, 0])


def _round_up(v: int, mult: int) -> int:
    return ((v + mult - 1) // mult) * mult
