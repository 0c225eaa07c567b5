"""Multi-chip scaling benchmark (SURVEY.md §7 milestone M2).

Mirrors bench.py's flagship configuration (VP-RDS, GMM reference, EI
integrator, LV loss, 100-step trajectories) but shards the particle axis
over a `jax.sharding.Mesh` of all available devices and reports weak-scaling
efficiency: per-device batch is held fixed, so perfect scaling doubles
throughput with the device count.

Runs unmodified on real multi-chip hardware (default: all local devices)
and, for harness validation without chips, on a virtual CPU mesh:

    python bench_multichip.py --virtual 8

Prints ONE JSON line:
  {"metric": "rds_multichip_throughput", "n_devices": N,
   "value": <sde_steps*samples/sec on the N-device mesh>,
   "per_device": value/N, "scaling_efficiency": value/(N*single_device)}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

K_STEPS = 100


def build_sampler(mesh, eval_batch: int):
    """Flagship RDS sampler + jitted sharded trajectory-sampling closure."""
    import jax

    from sde_sampler_lrds_tpu.losses import EIReferenceSDELoss
    from sde_sampler_lrds_tpu.models import ClippedCtrl, FourierMLP
    from sde_sampler_lrds_tpu.parallel.mesh import constrain_batch
    from sde_sampler_lrds_tpu.sde import VP, get_timesteps
    from sde_sampler_lrds_tpu.solvers import RDS
    from sde_sampler_lrds_tpu.solvers.base import TrainConfig
    from sde_sampler_lrds_tpu.targets import IsotropicGauss, ManyModes

    dim = 8
    target = ManyModes(n_modes=4, dim=dim, var=0.5, n_reference_samples=1000)
    prior = IsotropicGauss(dim=dim, loc=0.0, scale=1.0)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    ctrl = ClippedCtrl(base_model=FourierMLP(dim=dim, zero_init=True),
                       clip_model=1e4)
    ts = get_timesteps(0.0, 1.0, steps=K_STEPS)
    cfg = TrainConfig(train_steps=8, train_batch_size=eval_batch,
                      eval_batch_size=eval_batch, lr=3e-3,
                      eval_interval=10_000, log_interval=1000)
    solver = RDS(target, prior, sde, ctrl, EIReferenceSDELoss,
                 {"method": "lv", "max_rnd": 1e8}, train_ts=ts, cfg=cfg,
                 mesh=mesh)
    solver.change_reference_type("gmm", means=target.loc,
                                 variances=target.scale**2,
                                 weights=target.mixture_weights)
    solver.setup()

    params = solver.state.ema_params
    ctrl_fn = solver.ctrl_fn(params)
    args = solver.loss_call_args()

    @jax.jit
    def sample(key):
        k_p, k_s = jax.random.split(key)
        x0 = prior.sample(k_p, (eval_batch,))
        x0 = constrain_batch(x0, mesh)
        x, rnd, _ = solver.loss.simulate(k_s, ts, x0, ctrl_fn, **args)
        return x, rnd

    return solver, sample


def timed_throughput(sample, eval_batch: int, n_calls: int, reps: int) -> float:
    """Pipelined best-of-reps throughput (amortizes dispatch latency —
    see bench.py; essential over the remote-tunnel runtime)."""
    import jax

    out = sample(jax.random.PRNGKey(10))
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        outs = [sample(jax.random.PRNGKey(11 + i)) for i in range(n_calls)]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / n_calls)
    return eval_batch * K_STEPS / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force an N-device virtual CPU mesh (harness "
                         "validation without multi-chip hardware)")
    ap.add_argument("--per-device-batch", type=int, default=8192)
    ap.add_argument("--n-calls", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--train-steps", type=int, default=8,
                    help="sharded train steps to run (and time) per mesh")
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}")
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    from sde_sampler_lrds_tpu.parallel import get_mesh

    n_devices = len(jax.devices())
    results = {}
    # single-device reference, then the full mesh (weak scaling: batch ∝ N)
    for n in sorted({1, n_devices}):
        mesh = get_mesh(n)
        batch = args.per_device_batch * n
        solver, sample = build_sampler(mesh, batch)
        # sharded training-step timing (the M2 train path, not just eval);
        # one untimed warmup step pays the jit compile so the figure is
        # steady-state throughput, matching the eval path's warmup call
        m = None
        if args.train_steps:
            solver.step(jax.random.PRNGKey(99))
            jax.block_until_ready(solver.state.params)
        t0 = time.time()
        for i in range(args.train_steps):
            m = solver.step(jax.random.PRNGKey(100 + i))
        jax.block_until_ready(solver.state.params)
        train_sps = (args.train_steps * batch * K_STEPS / (time.time() - t0)
                     if args.train_steps else 0.0)
        tput = timed_throughput(sample, batch, args.n_calls, args.reps)
        results[n] = {"eval": tput, "train": train_sps,
                      "loss": float(m["train/loss"]) if m is not None else None}
        # fused kernel-per-shard eval (ops/fused_traj + shard_map): timed on
        # real TPU meshes only — interpret mode on the virtual CPU mesh is
        # a correctness tier, not a perf tier
        if jax.default_backend() == "tpu":
            fused = solver.fused_eval_sampler()
            if fused is not None:
                results[n]["eval_fused"] = timed_throughput(
                    fused, batch, args.n_calls, args.reps)
        print(f"[mesh {n}] eval {tput:.3e} "
              f"fused {results[n].get('eval_fused', float('nan')):.3e} "
              f"train {train_sps:.3e} "
              f"sde_steps*samples/s (batch {batch})", file=sys.stderr)

    tput_n = results[n_devices]["eval"]
    tput_1 = results[1]["eval"]
    eff = tput_n / (n_devices * tput_1) if n_devices > 1 else 1.0
    print(json.dumps({
        "metric": "rds_multichip_throughput",
        "n_devices": n_devices,
        "value": round(tput_n, 1),
        "unit": "sde_steps*samples/sec",
        "per_device": round(tput_n / n_devices, 1),
        "single_device": round(tput_1, 1),
        "scaling_efficiency": round(eff, 4),
        "train_steps_samples_per_sec": round(results[n_devices]["train"], 1),
        **({"fused": round(results[n_devices]["eval_fused"], 1)}
           if "eval_fused" in results[n_devices] else {}),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
