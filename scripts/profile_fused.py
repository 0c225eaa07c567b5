"""On-TPU attribution profile for the fused trajectory kernel (N1).

VERDICT r4: the fused eval wins (2.10 ms vs scan 2.95 ms at B=8192, K=100,
D=8) but sits ~2x above PERF.md's ~1 ms shaped-matmul ceiling, with nobody
having measured where the extra millisecond goes. This script measures it by
ablation, each row timed steady-state (median of --reps after a warmup):

  noise    on-core PRNG+Box-Muller vs host-fed noise (isolates the VPU
           transcendental cost PERF.md names as suspect #1)
  K-sweep  per-step marginal cost + fixed overhead split (linear fit)
  B-sweep  tile-count scaling (grid serialization suspect)
  block_b  tile-size sweep at fixed batch
  bf16     control matmuls in bfloat16 inside the kernel
  ref      gmm-table reference vs reference-free (per-step table relayout)

Optionally captures a jax.profiler trace of the default configuration
(--trace_dir). Prints one JSON line per row; run it standalone on the TPU
(contention-free) and paste the table into docs/PERF.md §1.
"""
import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from sde_sampler_lrds_tpu.losses import EIReferenceSDELoss
from sde_sampler_lrds_tpu.models import ClippedCtrl, FourierMLP
from sde_sampler_lrds_tpu.ops.fused_traj import (adapt_block, build_plan,
                                                 fused_simulate)
from sde_sampler_lrds_tpu.solvers.oc import GMMReferenceCtrl
from sde_sampler_lrds_tpu.sde import VP, get_timesteps
from sde_sampler_lrds_tpu.targets import IsotropicGauss, ManyModes
from sde_sampler_lrds_tpu.utils.cache import enable_compilation_cache


def build(dim=8, k_steps=100, bf16=False, ref="gmm", block_b=8192):
    target = ManyModes(n_modes=4, dim=dim, var=0.5, n_reference_samples=1)
    prior = IsotropicGauss(dim=dim, loc=0.0, scale=1.0)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    dt = jnp.bfloat16 if bf16 else None
    ctrl = ClippedCtrl(base_model=FourierMLP(dim=dim, zero_init=True,
                                             compute_dtype=dt),
                       clip_model=1e4)
    ts = get_timesteps(0.0, 1.0, steps=k_steps)
    ref_ctrl = None
    if ref == "gmm":
        means = target.loc
        ref_ctrl = GMMReferenceCtrl(sde, means, jnp.full(means.shape, 0.5),
                                    jnp.ones(means.shape[0]) / means.shape[0])
    loss = EIReferenceSDELoss(sde=sde, method="lv", max_rnd=1e8,
                              reference_ctrl=ref_ctrl)
    params = ctrl.init(jax.random.PRNGKey(0), jnp.zeros(()),
                       jnp.zeros((1, dim)))
    plan = build_plan(loss, ctrl, params, ts, block_b=block_b)
    assert plan is not None, "config out of fused scope"
    cfg, arrays = plan
    term = lambda x: target.unnorm_log_prob(x)
    # boundary terms run once per trajectory (not per step) — their cost is
    # noise here, so a plain Gaussian log-prob suffices for every row
    ref_lp = lambda x: prior.log_prob(x)
    return cfg, arrays, term, ref_lp, dim


def time_row(label, cfg, arrays, term, ref_lp, dim, batch, reps,
             use_key=True):
    try:
        return _time_row(label, cfg, arrays, term, ref_lp, dim, batch, reps,
                         use_key)
    except Exception as e:  # keep profiling the other rows
        print(json.dumps({"row": label, "batch": batch,
                          "error": repr(e)[:300]}), flush=True)
        return None


def _time_row(label, cfg, arrays, term, ref_lp, dim, batch, reps,
              use_key=True):
    cfg_b = adapt_block(cfg, batch)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, dim))
    noise = None if use_key else jax.random.normal(
        jax.random.PRNGKey(2), (cfg.k_steps, batch, dim))
    key = jax.random.PRNGKey(3) if use_key else None

    def run(i):
        k = jax.random.fold_in(key, i) if use_key else None
        return fused_simulate(cfg_b, arrays, k, x0, term, ref_lp, noise=noise)

    jax.block_until_ready(run(0))  # compile
    # The axon runtime has a ~23-40 ms per-call host round trip; a
    # blocking per-rep loop measures tunnel latency, not the ~2 ms kernel.
    # Pipeline `reps` async dispatches and block once (bench.py's method),
    # repeated 3x; report the best pipeline average as the device time.
    pipelines = []
    for p in range(3):
        t0 = time.perf_counter()
        outs = [run(1 + p * reps + i) for i in range(reps)]
        jax.block_until_ready(outs)
        pipelines.append((time.perf_counter() - t0) / reps)
    med = min(pipelines)
    row = {"row": label, "batch": batch, "k": cfg.k_steps,
           "block_b": cfg_b.block_b,
           "pipelined_ms": round(med * 1e3, 4),
           "pipeline_runs_ms": [round(t * 1e3, 4) for t in pipelines]}
    print(json.dumps(row), flush=True)
    return med


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--trace_dir", type=str, default=None)
    args = p.parse_args()
    enable_compilation_cache()
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    cfg, arrays, term, ref_lp, dim = build()

    # baseline + noise ablation
    time_row("base_prng", cfg, arrays, term, ref_lp, dim, 8192, args.reps)
    time_row("host_noise", cfg, arrays, term, ref_lp, dim, 8192, args.reps,
             use_key=False)

    # K sweep (fixed overhead split)
    for k in (25, 50, 200):
        c2, a2, t2, r2, _ = build(k_steps=k)
        time_row(f"k{k}", c2, a2, t2, r2, dim, 8192, args.reps)

    # B sweep (tile-grid scaling; block_b=8192 so B/8192 = #tiles)
    for b in (2048, 4096, 16384, 32768):
        time_row(f"b{b}", cfg, arrays, term, ref_lp, dim, b, args.reps)

    # block_b sweep at fixed batch 8192
    for bb in (512, 1024, 2048, 4096):
        c3, a3, t3, r3, _ = build(block_b=bb)
        time_row(f"block{bb}", c3, a3, t3, r3, dim, 8192, args.reps)

    # bf16 controls
    c4, a4, t4, r4, _ = build(bf16=True)
    time_row("bf16", c4, a4, t4, r4, dim, 8192, args.reps)

    # reference-free (table relayout cost)
    c5, a5, t5, r5, _ = build(ref="none")
    time_row("no_ref", c5, a5, t5, r5, dim, 8192, args.reps)

    if args.trace_dir:
        x0 = jax.random.normal(jax.random.PRNGKey(1), (8192, dim))
        with jax.profiler.trace(args.trace_dir):
            for i in range(5):
                jax.block_until_ready(fused_simulate(
                    adapt_block(cfg, 8192), arrays,
                    jax.random.fold_in(jax.random.PRNGKey(9), i), x0,
                    term, ref_lp))
        print(json.dumps({"trace": args.trace_dir}), flush=True)


if __name__ == "__main__":
    main()
