"""Whole-trajectory fused Pallas TPU kernel for RDS evaluation sampling.

The N1 hot loop (SURVEY.md §2.3; reference per-step Python loops at
sde_sampler/losses/oc.py:252,478,618) is already one remat'd ``lax.scan`` in
this repo, but at the reference's eval scale (batch 8192 × dim 8, K = 100)
the scan is *overhead*-bound, not compute-bound: each step costs ~30 µs of
XLA per-iteration kernel launches and HBM round-trips on tiny tensors while
the actual math is <1 µs. This kernel runs the ENTIRE K-step trajectory in
one Pallas program per batch tile — state ``x`` (D, B_t) in the transposed
(features-on-sublanes, batch-on-lanes) layout, the RND accumulator, and all
schedule tables stay resident in VMEM, the control MLP's matmuls hit the
MXU back-to-back, and Gaussian noise is drawn on-core (TPU PRNG +
Box–Muller), so nothing touches HBM between steps. Batch-on-lanes is the
load-bearing layout choice: at this workload's D (2–100) a (B, D) state
pads D → 128 lanes, wasting ≤64× of every VPU op and 16× of every
trajectory buffer (see _traj_kernel).

Scope (the flagship RDS eval path; everything else falls back to the scan):
  * loss: EM / EI / DDPM ReferenceSDELoss in evaluation mode (Ito RND,
    KL running cost ½‖u‖², no LV detachment — eval never detaches);
    one generalized per-step update covers all three integrators:
      rnd += c_cost·½‖u‖² + c_dot·(u·z)
      x    = a_x·x + a_ref·ref_score + a_u·u + a_z·z
    with (a_x, a_ref, a_u, a_z, c_cost, c_dot) precomputed per step
    (EM: losses/oc.py:252-296; EI: :431-568; DDPM: :571-651).
  * control: FourierMLP (optionally inside ClippedCtrl's elementwise clip),
    f32 params, no angle encoding. The per-step TimeEmbed output depends
    only on the (static) time grid, so it is precomputed OUTSIDE as a
    (K, H) table — bit-identical to the scan path's batch-1 broadcast.
  * reference: tabulated Gaussian / GMM noised-marginal score
    (solvers/oc.py GaussianReferenceCtrl/GMMReferenceCtrl) — diagonal
    covariances fold to per-step (log-weight constants, means, inverse
    variances) tables; FULL covariances ride the eigendecomposition
    (cov_c = P_c diag(eig) P_cᵀ noises to the SAME eigenbasis under a
    linear SDE, sde/linear.py:191), so the kernel adds two (B,D)×(D,D)
    MXU matmuls per component per step against static rotation tables —
    this is the φ⁴ / logreg experiment configuration (experiments/
    common.py:389 passes eigendecomposed tuples; raw full matrices are
    eigendecomposed once at plan-build time).

The terminal cost log p_ref(x_T) − log ρ(x_T) stays outside (one batched
call, identical to the scan path).

Determinism note: with ``noise`` provided (testing), the kernel is
bit-comparable to the scan path fed the same noise. In production mode the
noise comes from the on-core PRNG, which is a *different* stream than
jax.random — distributionally identical, sample-wise different.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# plan construction (host side, cheap)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FusedTrajCfg:
    """Static (hashable) kernel configuration."""
    k_steps: int
    dim: int
    channels: int
    n_hidden: int
    n_comp: int
    clip: float | None
    activation: Callable
    block_b: int
    # eigendecomposed full-covariance reference: ref_iv holds inverse
    # eigen-variances and the kernel rotates through ref_p / ref_pt
    full_cov: bool = False
    # control-MLP matmuls in bfloat16 (FourierMLP.compute_dtype semantics:
    # weights/biases/activations bf16, output cast back to f32; the state
    # update, RND accumulation, and reference score stay f32)
    bf16: bool = False


def _fourier_mlp_tables(ctrl_module, params, t_grid):
    """Extract (cfg fields, weight arrays, time-embed table) from a
    FourierMLP control, optionally wrapped in ClippedCtrl. Returns None if
    the module is not the supported shape."""
    from ..models.mlp import FourierMLP, TimeEmbed
    from ..models.reparam import ClippedCtrl, ScoreCtrl

    clip = None
    base = ctrl_module
    # ScoreCtrl subclasses ClippedCtrl but adds a target-score term the
    # kernel does not implement — match ClippedCtrl exactly, not subclasses.
    if type(base) is ClippedCtrl:
        clip = base.clip_model
        base = base.base_model
    if type(base) is not FourierMLP:
        return None
    if base.use_angle_encoding:
        return None
    if base.compute_dtype is not None and base.compute_dtype != jnp.bfloat16:
        return None
    bf16 = base.compute_dtype == jnp.bfloat16
    mm_dt = jnp.bfloat16 if bf16 else jnp.float32
    if base.dim_out is not None and base.dim_out != base.dim:
        return None
    p = params.get("params", params)
    if "base_model" in p:
        p = p["base_model"]
    n_dense = base.num_layers
    names = [f"Dense_{i}" for i in range(n_dense)]
    if any(n not in p for n in names) or "TimeEmbed_0" not in p:
        return None
    embed_mod = TimeEmbed(dim_out=base.channels, channels=base.channels,
                          activation=base.activation,
                          compute_dtype=base.compute_dtype)
    embed = embed_mod.apply({"params": p["TimeEmbed_0"]}, t_grid)
    embed = jnp.asarray(embed, mm_dt)  # (K, H)
    w0 = p["Dense_0"]["kernel"].astype(mm_dt)         # (D, H)
    b0 = p["Dense_0"]["bias"].astype(mm_dt)[None, :]  # (1, H)
    hidden = [p[f"Dense_{i}"] for i in range(1, n_dense - 1)]
    # n_hidden = 0: ship one zero dummy layer so array shapes match the
    # (max(n_h, 1), ...) BlockSpecs; the kernel's static loop never reads it
    wh = (jnp.stack([h["kernel"] for h in hidden]).astype(mm_dt)
          if hidden else jnp.zeros((1, base.channels, base.channels), mm_dt))
    bh = (jnp.stack([h["bias"][None, :] for h in hidden]).astype(mm_dt)
          if hidden else jnp.zeros((1, 1, base.channels), mm_dt))
    w_out = p[names[-1]]["kernel"].astype(mm_dt)          # (H, D)
    b_out = p[names[-1]]["bias"].astype(mm_dt)[None, :]   # (1, D)
    fields = dict(dim=base.dim, channels=base.channels,
                  n_hidden=len(hidden), clip=clip,
                  activation=base.activation, bf16=bf16)
    arrays = dict(embed=embed, w0=w0, b0=b0, wh=wh, bh=bh,
                  w_out=w_out, b_out=b_out)
    return fields, arrays


def _factored_reference_tables(reference_ctrl, t_grid, dim):
    """Per-step tables for an eigendecomposed full-covariance reference
    (cov_c = P_c diag(eig_c) P_cᵀ, sde/linear.py _factored_noised_mog): the
    noised covariance keeps the SAME eigenbasis — P_c diag(s²(eig+σ²)) P_cᵀ
    — so the kernel only needs the static rotation matrices plus per-step
    inverse eigen-variances, and the score is two (B,D)×(D,D) MXU matmuls
    per component per step."""
    if hasattr(reference_ctrl, "var_init"):          # GaussianReferenceCtrl
        var = reference_ctrl.var_init
        if not isinstance(var, tuple):
            if jnp.ndim(var) != 2:                   # diag: cheaper path
                return None
            var = jnp.linalg.eigh(var)               # one-time host eigh
        eig, p = var
        eig, p = jnp.atleast_2d(eig), (p[None] if p.ndim == 2 else p)
        means = jnp.atleast_2d(reference_ctrl.x_init)
        w = jnp.ones((means.shape[0],))
    elif hasattr(reference_ctrl, "variances"):       # GMMReferenceCtrl
        var = reference_ctrl.variances
        if not isinstance(var, tuple):
            if jnp.ndim(var) != 3:                   # diag: cheaper path
                return None
            var = jnp.linalg.eigh(var)
        eig, p = var
        means = reference_ctrl.means
        w = reference_ctrl.weights
    else:
        return None
    c, d = means.shape
    if d != dim or eig.shape != (c, d) or p.shape != (c, d, d):
        return None
    sde = reference_ctrl.sde
    s_t = jax.vmap(sde.s)(t_grid).reshape(-1, 1, 1)              # (K, 1, 1)
    sig2 = jax.vmap(sde.sigma_sq)(t_grid).reshape(-1, 1, 1)
    denom = s_t**2 * (eig[None] + sig2)                          # (K, C, D)
    k = t_grid.shape[0]
    w = (w / w.sum()).reshape(1, c)
    const = (jnp.log(w) - 0.5 * d * _LOG_2PI
             - 0.5 * jnp.sum(jnp.log(denom), axis=-1))           # (K, C)
    m = jnp.broadcast_to(s_t.reshape(k, 1, 1) * means[None], (k, c, d))
    pt = jnp.swapaxes(p, -1, -2)
    return dict(ref_const=jnp.broadcast_to(const, (k, c)).astype(jnp.float32),
                ref_m=m.reshape(k, c * d).astype(jnp.float32),
                ref_iv=(1.0 / denom).reshape(k, c * d).astype(jnp.float32),
                ref_p=p.reshape(c * d, d).astype(jnp.float32),
                ref_pt=pt.reshape(c * d, d).astype(jnp.float32))


def _reference_tables(reference_ctrl, t_grid, dim):
    """Fold a tabulated diagonal Gaussian/GMM reference into per-step
    (softmax constants, means, inverse variances). Returns None if the
    reference is not diagonal-tabulated."""
    if not hasattr(reference_ctrl, "precompute"):
        return None
    factored = _factored_reference_tables(reference_ctrl, t_grid, dim)
    if factored is not None:
        return factored
    tab = reference_ctrl.precompute(t_grid)
    if len(tab) == 2:  # GaussianReferenceCtrl: (loc, var)
        loc, var = tab
        if isinstance(var, tuple):
            return None
        k = t_grid.shape[0]
        m = jnp.broadcast_to(jnp.asarray(loc, jnp.float32).reshape(k, 1, -1),
                             (k, 1, dim))
        if var.ndim >= 3:
            return None  # full covariance
        v = jnp.broadcast_to(jnp.asarray(var, jnp.float32).reshape(k, 1, -1),
                             (k, 1, dim))
        w = jnp.ones((k, 1), jnp.float32)
    elif len(tab) == 3:  # GMMReferenceCtrl: (w, m, v)
        w, m, v = tab
        if isinstance(v, tuple) or v.ndim > 3:
            return None  # full covariance
        k, c = m.shape[0], m.shape[1]
        m = jnp.asarray(m, jnp.float32)
        v = jnp.broadcast_to(
            jnp.asarray(v, jnp.float32).reshape(k, c, -1), m.shape)
        w = jnp.asarray(w, jnp.float32).reshape(k, c)
    else:
        return None
    k, c, d = m.shape
    w = w / w.sum(axis=-1, keepdims=True)
    # logits_c(x) = const_c - ½ Σ_d (x_d - m_cd)² / v_cd  — exactly
    # log w̃_c + log N(x; m_c, diag v_c) (targets/gauss.py log_prob_gaussian)
    const = (jnp.log(w) - 0.5 * d * _LOG_2PI
             - 0.5 * jnp.sum(jnp.log(v), axis=-1))            # (K, C)
    return dict(ref_const=const.astype(jnp.float32),
                ref_m=m.reshape(k, c * d),
                ref_iv=(1.0 / v).reshape(k, c * d))


def _step_coeffs(loss, ts, ito: bool = True):
    """Per-step (a_x, a_ref, a_u, a_z, c_cost, c_dot) for the loss's
    integrator — see module docstring. Returns (coefs, t_ctrl, has_ref).
    ``ito`` zeroes the RND's u·z term for losses that make it optional
    (DDS: compute_ito_int); the state-update noise coefficient a_z is
    unaffected."""
    from ..losses.dds import ExponentialIntegratorSDELoss
    from ..losses.dis import DiscreteTimeReversalLossEI
    from ..losses.rds import EIReferenceSDELoss, EMReferenceSDELoss

    s_arr, t_arr = ts[:-1], ts[1:]
    t_ctrl = ts[-1] - s_arr
    has_ref = True
    if isinstance(loss, EIReferenceSDELoss):  # covers DDPM subclass
        omega = loss._omega(s_arr, t_arr)
        a_x, a_s, a_z = loss._step_coeffs(s_arr, t_arr)
        coefs = (a_x, a_s, a_s, a_z, omega, jnp.sqrt(omega))
    elif type(loss) is EMReferenceSDELoss:
        if not hasattr(loss.sde, "drift_coeff_t"):
            return None, None, False
        dt = t_arr - s_arr
        sqdt = jnp.sqrt(dt)
        diff = loss.sde.diff_coeff_t(t_ctrl)
        drift_k = loss.sde.drift_coeff_t(t_ctrl)
        if loss.use_rescaling:
            # u is the raw control: x += (−f + g²·ref + g·u)dt + g·dB,
            # rnd += ½‖u‖²dt + u·dB  (losses/oc.py:252-296)
            coefs = (1.0 - drift_k * dt, diff**2 * dt, diff * dt,
                     diff * sqdt, dt, sqdt)
        else:
            # effective control g·u: fold the g factors into the
            # coefficients so the kernel still consumes the raw MLP output
            coefs = (1.0 - drift_k * dt, diff**2 * dt, diff**2 * dt,
                     diff * sqdt, diff**2 * dt, diff * sqdt)
    elif type(loss) is DiscreteTimeReversalLossEI:
        # discrete DIS (losses/oc.py:897): EI kernel, no reference score
        omega = loss.sde.omega(s_arr, t_arr)
        a_x, a_s, a_z = loss.sde.ei_step_coeffs(s_arr, t_arr)
        zero = jnp.zeros_like(omega)
        coefs = (a_x, zero, a_s, a_z, omega, jnp.sqrt(omega))
        has_ref = False
    elif type(loss) is ExponentialIntegratorSDELoss:
        # original DDS (losses/oc.py:1310): forward clock, Vargas update
        t_ctrl = s_arr
        beta = jnp.clip(loss.alpha * jnp.sqrt(t_arr - s_arr), 0.0, 1.0)
        alpha_k = jnp.sqrt(1.0 - beta**2)
        zero = jnp.zeros_like(beta)
        c_dot = loss.sigma * beta if ito else zero
        coefs = (alpha_k, zero, beta**2 * loss.sigma**2,
                 loss.sigma * beta, beta**2 * loss.sigma**2, c_dot)
        has_ref = False
    else:
        return None, None, False
    coefs = jnp.stack([jnp.broadcast_to(c, s_arr.shape).astype(jnp.float32)
                       for c in coefs], axis=-1)              # (K, 6)
    return coefs, t_ctrl, has_ref


def build_plan(loss, ctrl_module, params, ts, block_b: int = 2048,
               ito: bool = True):
    """Build (cfg, arrays) for ``fused_simulate`` or return None when the
    (loss, control, reference) triple is outside the kernel's scope.
    Reference-free losses (DDS, discrete DIS) ship a one-component dummy
    table with zero inverse variances — the kernel's reference score is
    identically zero and its a_ref coefficient is zero anyway."""
    coefs, t_ctrl, has_ref = _step_coeffs(loss, ts, ito=ito)
    if coefs is None:
        return None
    mlp = _fourier_mlp_tables(ctrl_module, params, t_ctrl)
    if mlp is None:
        return None
    fields, arrays = mlp
    # a loss family that *can* carry a reference but is configured without
    # one (e.g. PIS: reference process = the uncontrolled SDE, terminal
    # reference log-prob only) runs on the zero dummy table like the
    # reference-free families
    if has_ref and getattr(loss, "reference_ctrl", None) is None:
        has_ref = False
    if has_ref:
        ref = _reference_tables(loss.reference_ctrl, t_ctrl, fields["dim"])
        if ref is None:
            return None
    else:
        k, d = int(ts.shape[0] - 1), fields["dim"]
        ref = dict(ref_const=jnp.zeros((k, 1), jnp.float32),
                   ref_m=jnp.zeros((k, d), jnp.float32),
                   ref_iv=jnp.zeros((k, d), jnp.float32))
    cfg = FusedTrajCfg(k_steps=int(ts.shape[0] - 1), block_b=block_b,
                       n_comp=ref["ref_const"].shape[1],
                       full_cov="ref_p" in ref, **fields)
    arrays = dict(coefs=coefs, **arrays, **ref)
    return cfg, arrays


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _traj_kernel(cfg: FusedTrajCfg, use_noise_input: bool, return_traj: bool,
                 *refs):
    """Kernel body in the TRANSPOSED layout: state x is (D, B_t) — features
    on sublanes, batch on lanes. At the workload's small dims (D = 2–100)
    the reference (B_t, D) layout padded every elementwise op's lane axis
    D → 128 (≤64× wasted VPU lanes and a 16× VMEM inflation of the
    (K, B_t, D) trajectory blocks — the round-3 102 MB scoped-vmem OOM,
    docs/bench_r3_manual.stderr.txt); with batch on lanes every VPU op and
    every trajectory buffer is fully dense. Measured on v5e: 2.9 µs/step
    /2048-tile for the full body vs ~19 µs before (docs/PERF.md §fused).

    Per-step schedule vectors (time embed; reference const/means/invvars)
    are read as one row of a (K, R) table and rotated to an (R, 1) column
    with a one-tile ``swapaxes`` relayout — measured 0.23 µs/step, the
    cheapest supported per-step gather on this backend (dynamic lane
    slicing crashes Mosaic; one-hot MXU gathers cost 8–23 µs/step)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xs_out_ref = None
    if return_traj:
        *refs, xs_out_ref = refs
    (x0_ref, coef_ref, embed_ref, w0t_ref, b0t_ref, wht_ref, bht_ref,
     woutt_ref, boutt_ref, reftbl_ref, *refs) = refs
    p_ref = pt_ref = None
    if cfg.full_cov:
        p_ref, pt_ref, *refs = refs
    if use_noise_input:
        noise_ref, x_out_ref, rnd_out_ref = refs
    else:
        seed_ref, x_out_ref, rnd_out_ref = refs
        # decorrelate batch tiles; each tile draws its own stream
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    d, c, act = cfg.dim, cfg.n_comp, cfg.activation
    b_t = cfg.block_b
    mm_dt = jnp.bfloat16 if cfg.bf16 else jnp.float32

    def body(k, carry):
        x, rnd = carry                                 # (D, B_t), (1, B_t)
        if return_traj:  # pre-step state x_k (the flat LV path's input)
            xs_out_ref[pl.ds(k, 1), :, :] = x.reshape(1, d, b_t)
        # per-step schedule columns: one row read + one-tile relayout each
        cols = jnp.swapaxes(reftbl_ref[pl.ds(k, 1), :], 0, 1)  # (C+2CD, 1)
        e = jnp.swapaxes(embed_ref[pl.ds(k, 1), :], 0, 1)      # (H, 1)
        # ---- control u = clip(FourierMLP(t_k, x)) ------------------------
        # cfg.bf16: matmuls/activations in bfloat16 (compute_dtype
        # semantics); u is cast back to f32 before the state/RND math.
        # Weights arrive pre-transposed: h_col = W0ᵀ x_col (+ b + e).
        h = jnp.dot(w0t_ref[:], x.astype(mm_dt),
                    preferred_element_type=mm_dt) + b0t_ref[:] + e
        for i in range(cfg.n_hidden):
            h = jnp.dot(wht_ref[i], act(h),
                        preferred_element_type=mm_dt) + bht_ref[i]
        u = jnp.dot(woutt_ref[:], act(h),
                    preferred_element_type=mm_dt) + boutt_ref[:]
        u = u.astype(jnp.float32)
        if cfg.clip is not None:
            u = jnp.clip(u, -cfg.clip, cfg.clip)
        # ---- reference score of the noised (diag / eigen-full) MoG -------
        # column-table slices: [const (C) | means (C·D) | invvars (C·D)]
        logits, grads = [], []
        for j in range(c):
            diff = x - cols[c + j * d:c + (j + 1) * d]            # (D, B)
            ivj = cols[c + c * d + j * d:c + c * d + (j + 1) * d]
            if cfg.full_cov:
                # rotate into the component's (time-invariant) eigenbasis,
                # scale by the per-step inverse eigen-variances, rotate
                # back; column layout swaps the P/Pᵀ roles of the row form
                # (y_col = Pᵀ diff_col, g_col = P ys_col)
                y = jnp.dot(pt_ref[j * d:(j + 1) * d, :], diff,
                            preferred_element_type=jnp.float32)
                ys = y * ivj
                logits.append(cols[j:j + 1]
                              - 0.5 * jnp.sum(y * ys, axis=0, keepdims=True))
                g = jnp.dot(p_ref[j * d:(j + 1) * d, :], ys,
                            preferred_element_type=jnp.float32)
            else:
                g = diff * ivj
                logits.append(cols[j:j + 1]
                              - 0.5 * jnp.sum(diff * g, axis=0,
                                              keepdims=True))
            grads.append(g)
        if c == 1:
            ref_score = -grads[0]
        else:
            resp = jax.nn.softmax(jnp.concatenate(logits, axis=0), axis=0)
            ref_score = -sum(resp[j:j + 1] * grads[j] for j in range(c))
        # ---- noise --------------------------------------------------------
        if use_noise_input:
            z = noise_ref[pl.ds(k, 1), :, :].reshape(d, b_t)
        else:
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((2 * d, b_t)), jnp.uint32)
            # Mosaic has no uint32->f32 convert; >>8 clears the sign bit,
            # so bitcast to int32 (same width, value-preserving here) and
            # convert from there.
            f = (pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
                 * (1.0 / (1 << 24)))
            u1 = 1.0 - f[:d]                                      # (0, 1]
            u2 = f[d:]
            z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                (2.0 * math.pi) * u2)
        # ---- RND + state update (generalized integrator step) -------------
        a_x, a_ref, a_u = coef_ref[k, 0], coef_ref[k, 1], coef_ref[k, 2]
        a_z, c_cost, c_dot = coef_ref[k, 3], coef_ref[k, 4], coef_ref[k, 5]
        rnd = rnd + c_cost * 0.5 * jnp.sum(u * u, axis=0, keepdims=True) \
                  + c_dot * jnp.sum(u * z, axis=0, keepdims=True)
        x = a_x * x + a_ref * ref_score + a_u * u + a_z * z
        return x, rnd

    x0 = x0_ref[:]
    rnd0 = jnp.zeros((1, b_t), jnp.float32)
    x_t, rnd = jax.lax.fori_loop(0, cfg.k_steps, body, (x0, rnd0))
    x_out_ref[:] = x_t
    rnd_out_ref[:] = rnd


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _fused_traj(cfg: FusedTrajCfg, arrays: dict, x0, seed_or_noise,
                use_noise_input: bool, return_traj: bool = False):
    """Host-side wrapper: the public contract stays row-major — x0 (B, D),
    noise (K, B, D), returns x_T (B,), rnd (B,), xs (K, B, D) — and the
    transposition to the kernel's (D, B) lane-dense layout happens here
    (cheap bandwidth-bound XLA transposes at the jit boundary). ``arrays``
    keeps build_plan's row-major tables, so the custom-VJP mirrors and the
    cotangent pytree structure are layout-agnostic; the transposed weight
    views below are traced jnp and differentiate through."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = x0.shape
    k, h, c = cfg.k_steps, cfg.channels, cfg.n_comp
    n_h, b_t = cfg.n_hidden, cfg.block_b
    # Pad a non-tile-multiple batch up to the next tile boundary instead of
    # shrinking the tile to a divisor (which collapsed e.g. the default
    # eval batch 6000 to tiny programs): padded lanes simulate an extra
    # <1-tile of throwaway trajectories (lanes are independent in the
    # kernel) and are sliced off below.
    pad = -b % b_t
    bp = b + pad
    x0_t = jnp.pad(jnp.swapaxes(x0, 0, 1), ((0, 0), (0, pad)))   # (D, Bp)
    if use_noise_input:
        seed_or_noise = jnp.pad(jnp.swapaxes(seed_or_noise, 1, 2),
                                ((0, 0), (0, 0), (0, pad)))      # (K, D, Bp)
    # pre-transposed weight columns + one combined per-step reference table
    # [const (C) | means (C·D) | invvars (C·D)] read row-wise in the kernel
    w0t = jnp.swapaxes(arrays["w0"], 0, 1)                       # (H, D)
    b0t = jnp.swapaxes(arrays["b0"], 0, 1)                       # (H, 1)
    wht = jnp.swapaxes(arrays["wh"], 1, 2)
    bht = jnp.swapaxes(arrays["bh"], 1, 2)                       # (nh, H, 1)
    woutt = jnp.swapaxes(arrays["w_out"], 0, 1)                  # (D, H)
    boutt = jnp.swapaxes(arrays["b_out"], 0, 1)                  # (D, 1)
    reftbl = jnp.concatenate(
        [arrays["ref_const"], arrays["ref_m"], arrays["ref_iv"]], axis=1)
    r_cols = c + 2 * c * d
    grid = (bp // b_t,)
    bcast = lambda *blk: pl.BlockSpec(blk, lambda i: (0,) * len(blk),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((d, b_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
        bcast(k, h),                           # time-embed table
        bcast(h, d), bcast(h, 1),              # W0ᵀ, b0
        bcast(max(n_h, 1), h, h), bcast(max(n_h, 1), h, 1),   # hidden
        bcast(d, h), bcast(d, 1),              # W_outᵀ, b_out
        bcast(k, r_cols),                      # combined reference table
    ]
    if cfg.full_cov:
        in_specs += [bcast(c * d, d), bcast(c * d, d)]        # P, Pᵀ stacks
    if use_noise_input:
        in_specs.append(pl.BlockSpec((k, d, b_t), lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM))
    else:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    out_specs = [pl.BlockSpec((d, b_t), lambda i: (0, i),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, b_t), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((d, bp), jnp.float32),
                 jax.ShapeDtypeStruct((1, bp), jnp.float32)]
    if return_traj:
        out_specs.append(pl.BlockSpec((k, d, b_t), lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((k, d, bp), jnp.float32))
    operands = [x0_t, arrays["coefs"], arrays["embed"], w0t, b0t, wht, bht,
                woutt, boutt, reftbl]
    if cfg.full_cov:
        operands += [arrays["ref_p"], arrays["ref_pt"]]
    out = pl.pallas_call(
        functools.partial(_traj_kernel, cfg, use_noise_input, return_traj),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(*operands, seed_or_noise)
    x_t, rnd = jnp.swapaxes(out[0], 0, 1)[:b], out[1][0, :b]
    xs = jnp.swapaxes(out[2], 1, 2)[:, :b] if return_traj else None
    return x_t, rnd, xs


def fused_simulate(cfg: FusedTrajCfg, arrays: dict, key, x0,
                   terminal_unnorm_log_prob, reference_log_prob=None,
                   initial_log_prob=None, noise: jnp.ndarray | None = None):
    """Run the fused trajectory and add the boundary costs — the fused
    equivalent of ``simulate(..., change_sde_ctrl=False)`` in eval mode:
    RDS/DDS add ``log p_ref(x_T)`` (losses/rds.py, losses/dds.py),
    discrete DIS starts from ``log p_0(x_0)`` (losses/dis.py, train=False);
    every family subtracts the terminal ``log ρ(x_T)``. ``noise``
    (K, B, D), when given, replaces the on-core PRNG for bit-comparable
    testing against the scan path."""
    b = x0.shape[0]
    x0 = jnp.asarray(x0, jnp.float32)
    if noise is not None:
        # host-fed noise streams a (K, D, block_b) block per tile — same
        # VMEM pressure as the return_traj output, so the same cap applies
        # (one stream here; _cap_block_for_traj budgets two). Uncapped this
        # was a real-TPU scoped-vmem OOM at K=100, B=8192: 26 MiB > 16 MiB.
        cfg = _cap_block_for_streams(cfg, b, n_streams=1)
        x_t, rnd, _ = _fused_traj(cfg, arrays, x0,
                                  jnp.asarray(noise, jnp.float32), True)
    else:
        cfg = adapt_block(cfg, b)
        seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
        x_t, rnd, _ = _fused_traj(cfg, arrays, x0, seed, False)
    if initial_log_prob is not None:
        rnd = rnd + initial_log_prob(x0)
    if reference_log_prob is not None:
        rnd = rnd + reference_log_prob(x_t)
    rnd = rnd - terminal_unnorm_log_prob(x_t)
    return x_t, rnd


def _cap_block_for_streams(cfg: FusedTrajCfg, batch: int,
                           n_streams: int) -> FusedTrajCfg:
    """Cap block_b so ``n_streams`` resident (K, D, block_b) f32 blocks —
    host-fed noise and/or the return_traj xs output — fit in VMEM
    (~16 MiB/core) alongside the state/table buffers: n·K·D·block_b·4 stays
    under a ~10 MiB budget (grid iteration count is free; block size is
    not). In the transposed layout the budget math is exact: batch is the
    lane axis, so the buffers carry no hidden D → 128 lane padding (the
    round-3 OOM: the (K, block_b, D=8) blocks cost 16× their nominal bytes
    and blew the 16 MiB scoped-vmem limit)."""
    budget_rows = max((10 << 20) // (n_streams * 4 * cfg.k_steps * cfg.dim),
                      128)
    if cfg.block_b > budget_rows:
        cfg = dataclasses.replace(cfg, block_b=1 << (budget_rows.bit_length() - 1))
    return adapt_block(cfg, batch)


def _cap_block_for_traj(cfg: FusedTrajCfg, batch: int) -> FusedTrajCfg:
    """return_traj=True with host-fed noise: two streams (noise + xs)."""
    return _cap_block_for_streams(cfg, batch, n_streams=2)


def fused_traj_states(cfg: FusedTrajCfg, arrays: dict, x0,
                      noise: jnp.ndarray):
    """Gradient-free trajectory states for the flat LV training path
    (losses/rds.py lv_flat_call): pre-step states xs (K, B, D) and the
    terminal x_T, simulated under provided noise with everything
    stop-gradiented (the flat LV cost math needs no trajectory gradient —
    its simulation control is detached by definition)."""
    cfg = _cap_block_for_traj(cfg, x0.shape[0])
    arrays = jax.lax.stop_gradient(arrays)
    x0 = jax.lax.stop_gradient(jnp.asarray(x0, jnp.float32))
    noise = jax.lax.stop_gradient(jnp.asarray(noise, jnp.float32))
    x_t, _, xs = _fused_traj(cfg, arrays, x0, noise, True, True)
    return xs, x_t


# ---------------------------------------------------------------------------
# differentiable fused trajectory (KL training)
# ---------------------------------------------------------------------------
# The KL loss attaches the simulated control, so unlike LV the trajectory
# itself carries parameter gradient and the flat restructuring does not
# apply. Instead: custom_vjp whose FORWARD is the fused Pallas kernel (with
# the per-step states saved as residuals — the kernel already emits them for
# the flat LV path) and whose BACKWARD is one reverse lax.scan implementing
# the exact adjoint of the generalized integrator step
#
#   x_{k+1} = a_x·x_k + a_ref·r(x_k) + a_u·u_k + a_z·z_k,  u_k = U(t_k, x_k)
#   rnd    += c_cost·½‖u_k‖² + c_dot·u_k·z_k
#
#   λ_k = a_x·λ_{k+1} + a_ref·(∂r/∂x)ᵀλ_{k+1} + (∂u/∂x)ᵀ g_u
#   g_u = r̄·(c_cost·u_k + c_dot·z_k) + a_u·λ_{k+1}
#
# with the per-step (∂u/∂·)ᵀ pulled through jax.vjp of a pure-jnp mirror of
# the kernel's control MLP, so table cotangents flow back to the params that
# built them (build_plan is differentiable jnp). The reference tables are
# frozen in RDS — their cotangents are zero by construction. Compared to
# jax.grad of the remat'd scan this removes the forward recomputation AND
# runs the forward at kernel speed; value/gradient parity is tested per
# integrator family (tests/test_fused_traj.py).

_MLP_KEYS = ("embed", "w0", "b0", "wh", "bh", "w_out", "b_out")


def _mirror_mlp(cfg: FusedTrajCfg, core: dict, e_row, x):
    """Pure-jnp mirror of the kernel's control evaluation at one step.
    ``core`` holds the non-time-indexed tables; ``e_row`` is the (H,)
    time-embed row for this step."""
    act = cfg.activation
    h = jnp.dot(x, core["w0"]) + core["b0"] + e_row[None, :]
    for i in range(cfg.n_hidden):
        h = jnp.dot(act(h), core["wh"][i]) + core["bh"][i]
    u = jnp.dot(act(h), core["w_out"]) + core["b_out"]
    if cfg.clip is not None:
        u = jnp.clip(u, -cfg.clip, cfg.clip)
    return u


def _mirror_ref_score(cfg: FusedTrajCfg, aux: dict, row_c, row_m, row_iv, x):
    """Pure-jnp mirror of the kernel's noised-MoG reference score at one
    step (diag or eigendecomposed-full covariances)."""
    d, c = cfg.dim, cfg.n_comp
    logits, grads = [], []
    for j in range(c):
        diff = x - row_m[j * d:(j + 1) * d][None, :]
        if cfg.full_cov:
            y = jnp.dot(diff, aux["ref_p"][j * d:(j + 1) * d, :])
            ys = y * row_iv[j * d:(j + 1) * d][None, :]
            logits.append(row_c[j] - 0.5 * jnp.sum(y * ys, axis=-1))
            g = jnp.dot(ys, aux["ref_pt"][j * d:(j + 1) * d, :])
        else:
            g = diff * row_iv[j * d:(j + 1) * d][None, :]
            logits.append(row_c[j] - 0.5 * jnp.sum(diff * g, axis=-1))
        grads.append(g)
    if c == 1:
        return -grads[0]
    resp = jax.nn.softmax(jnp.stack(logits, axis=-1), axis=-1)
    return -sum(resp[:, j:j + 1] * grads[j] for j in range(c))


def _kl_forward_all(cfg: FusedTrajCfg, mesh, arrays, x0, noise):
    """(x_T, rnd, xs) through the fused kernel; per shard under shard_map
    on a multi-device mesh (a pallas_call does not SPMD-partition a sharded
    operand itself). Values only — the custom VJP wraps the caller, so no
    differentiation ever passes through the shard_map."""
    if mesh is None or mesh.size == 1:
        run_cfg = _cap_block_for_traj(cfg, x0.shape[0])
        return _fused_traj(run_cfg, arrays, x0, noise, True, True)

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import data_axis

    def local(arrays, x0, zs):
        run_cfg = _cap_block_for_traj(cfg, x0.shape[0])
        return _fused_traj(run_cfg, arrays, x0, zs, True, True)

    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P(), P(data_axis), P(None, data_axis)),
                         out_specs=(P(data_axis), P(data_axis),
                                    P(None, data_axis)),
                         check_vma=False)(arrays, x0, noise)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_kl_traj(cfg: FusedTrajCfg, mesh, arrays: dict, x0, noise):
    """Differentiable fused trajectory: (x_T, running rnd) under provided
    per-step standard normals, with gradients flowing to the control tables
    in ``arrays`` (and through them to the params that built them).
    ``mesh=None`` runs single-device; a Mesh runs the forward kernel per
    shard (the adjoint scan is plain jnp and shards under jit as usual)."""
    x_t, rnd, _ = _kl_forward_all(cfg, mesh, jax.lax.stop_gradient(arrays),
                                  jnp.asarray(x0, jnp.float32),
                                  jnp.asarray(noise, jnp.float32))
    return x_t, rnd


def _fused_kl_fwd(cfg, mesh, arrays, x0, noise):
    arrays_v = jax.lax.stop_gradient(arrays)
    x0 = jnp.asarray(x0, jnp.float32)
    noise = jnp.asarray(noise, jnp.float32)
    x_t, rnd, xs = _kl_forward_all(cfg, mesh, arrays_v, x0, noise)
    return (x_t, rnd), (arrays_v, xs, noise)


def _fused_kl_bwd(cfg, mesh, res, cot):
    arrays, xs, noise = res
    x_bar_t, rnd_bar = cot                      # (B, D), (B,)
    core = {k: arrays[k] for k in _MLP_KEYS if k != "embed"}
    core = {k: v.astype(jnp.float32) for k, v in core.items()}
    embed = arrays["embed"].astype(jnp.float32)                  # (K, H)
    aux = {k: v for k, v in arrays.items() if k not in _MLP_KEYS}
    rb = rnd_bar[:, None]

    def body(carry, inp):
        lam, core_bar = carry
        x_k, z_k, coef_k, e_k, row_c, row_m, row_iv = inp
        a_x, a_ref, a_u = coef_k[0], coef_k[1], coef_k[2]
        a_z, c_cost, c_dot = coef_k[3], coef_k[4], coef_k[5]
        u, pull = jax.vjp(
            lambda c, e, xx: _mirror_mlp(cfg, c, e, xx), core, e_k, x_k)
        g_u = rb * (c_cost * u + c_dot * z_k) + a_u * lam
        core_bar_k, e_bar, x_bar_mlp = pull(g_u)
        _, ref_pull = jax.vjp(
            lambda xx: _mirror_ref_score(cfg, aux, row_c, row_m, row_iv, xx),
            x_k)
        (x_bar_ref,) = ref_pull(a_ref * lam)
        z_bar = rb * c_dot * u + a_z * lam
        lam = a_x * lam + x_bar_ref + x_bar_mlp
        core_bar = jax.tree.map(jnp.add, core_bar, core_bar_k)
        return (lam, core_bar), (e_bar, z_bar)

    core_bar0 = jax.tree.map(jnp.zeros_like, core)
    inputs = (xs, noise, aux["coefs"], embed,
              aux["ref_const"], aux["ref_m"], aux["ref_iv"])
    (lam0, core_bar), (e_bars, z_bars) = jax.lax.scan(
        body, (x_bar_t, core_bar0), inputs, reverse=True)
    arrays_bar = {k: jnp.zeros_like(v) for k, v in arrays.items()}
    arrays_bar.update({k: v.astype(arrays[k].dtype)
                       for k, v in core_bar.items()})
    arrays_bar["embed"] = e_bars.astype(arrays["embed"].dtype)
    return arrays_bar, lam0, z_bars


fused_kl_traj.defvjp(_fused_kl_fwd, _fused_kl_bwd)


def fused_simulate_sharded(mesh, cfg: FusedTrajCfg, arrays: dict, key, x0,
                           terminal_unnorm_log_prob, reference_log_prob=None,
                           initial_log_prob=None):
    """``fused_simulate`` composed with the data-parallel mesh: a
    ``pallas_call`` does not SPMD-partition a sharded operand, so run the
    kernel per shard under ``shard_map`` — every device executes the whole
    K-step trajectory on its local batch rows against replicated tables,
    and the boundary costs stay elementwise per shard. Per-device PRNG
    streams decorrelate by folding the device's axis index into the key."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import data_axis

    def local(arrays, key, x0):
        key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        if jax.default_backend() != "tpu":
            # interpret mode lacks the on-core PRNG: host-drawn per-shard
            zs = jax.random.normal(key, (cfg.k_steps, *x0.shape))
            return fused_simulate(cfg, arrays, None, x0,
                                  terminal_unnorm_log_prob,
                                  reference_log_prob, initial_log_prob,
                                  noise=zs)
        return fused_simulate(cfg, arrays, key, x0,
                              terminal_unnorm_log_prob, reference_log_prob,
                              initial_log_prob)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, and the kernel is purely per-shard anyway
    return jax.shard_map(local, mesh=mesh,
                     in_specs=(P(), P(), P(data_axis)),
                     out_specs=(P(data_axis), P(data_axis)),
                     check_vma=False)(arrays, key, x0)


def fused_traj_states_sharded(mesh, cfg: FusedTrajCfg, arrays: dict, x0,
                              noise: jnp.ndarray):
    """``fused_traj_states`` under ``shard_map``: batch rows of x0/noise
    sharded over the data axis, trajectory states returned with the same
    batch sharding (the flat LV cost evaluation downstream is elementwise
    over batch rows, so no resharding follows)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import data_axis

    def local(arrays, x0, noise):
        return fused_traj_states(cfg, arrays, x0, noise)

    return jax.shard_map(local, mesh=mesh,
                     in_specs=(P(), P(data_axis), P(None, data_axis)),
                     out_specs=(P(None, data_axis), P(data_axis)),
                     check_vma=False)(arrays, x0, noise)


def adapt_block(cfg: FusedTrajCfg, batch: int) -> FusedTrajCfg:
    """Clamp block_b to the batch, rounded up to the f32 LANE multiple of
    128 (batch is the kernel's lane axis in the transposed layout).
    Batches that are not a tile multiple are NOT shrunk to a divisor —
    ``_fused_traj`` pads the last partial tile and slices it back off, so
    a 6000-row eval still runs full 2048-lane tiles rather than hundreds
    of tiny programs."""
    b_t = min(cfg.block_b, (batch + 127) // 128 * 128)
    if b_t != cfg.block_b:
        cfg = dataclasses.replace(cfg, block_b=b_t)
    return cfg
