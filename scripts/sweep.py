"""Job-level parallel sweep launcher.

Re-design of the reference's hydra joblib/SLURM multirun launchers
(conf/launcher/joblib.yaml, conf/launcher/slurm*.yaml, utils/hydra.py:15-99):
sweeps are embarrassingly parallel independent jobs, each a subprocess of
scripts/main.py with its own out_dir.

Grid syntax: ``--sweep key=a,b,c`` expands the cross product over
scripts/main.py flags; dotted keys (``--sweep train.lr=1e-3,3e-4``) route
through the ``--set`` override surface, so every config axis is sweepable.

Device placement: ``--device-slots N`` partitions the host's accelerators
into N slots and pins job i to slot i%N via TPU_VISIBLE_DEVICES /
CUDA_VISIBLE_DEVICES, so concurrent jobs never contend for a chip (the
one-process-per-chip tier of the reference's joblib launcher). With
``--device-slots 0`` (default) jobs share the default device — right for
CPU smoke sweeps.

Launchers: ``--launcher local`` (thread pool over subprocesses) or
``--launcher slurm`` which writes a self-contained sbatch array script to
{out_root}/sweep.sbatch (one array task per grid point) and submits it when
sbatch exists — the multi-host tier (conf/launcher/slurm.yaml).

Every sweep writes {out_root}/summary.json: per-job returncode, out_dir,
overrides, and the final metrics line — the multirun aggregation the
reference leaves to wandb.

Example:
  python scripts/sweep.py --jobs 2 --base "--solver vp_rds --target two_modes \
      --train-steps 2000" --sweep seed=0,1,2 --sweep loss-method=kl,lv
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import queue
import shlex
import shutil
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def expand_grid(sweeps: list[str]):
    keys, values = [], []
    for s in sweeps:
        if "=" not in s:
            raise SystemExit(f"--sweep item {s!r} must look like "
                             f"ns.key=v1,v2,... (missing '=')")
        k, v = s.split("=", 1)
        keys.append(k)
        values.append(v.split(","))
    for combo in itertools.product(*values):
        yield dict(zip(keys, combo))


def job_cmd(main_py: Path, base: list[str], overrides: dict, out_dir: str):
    """Build the main.py argv for one grid point; dotted keys go via --set."""
    cmd = [sys.executable, str(main_py), *base, "--out-dir", out_dir]
    sets = []
    for k, v in overrides.items():
        if "." in k:
            sets.append(f"{k}={v}")
        else:
            cmd += [f"--{k}", v]
    if sets:
        cmd += ["--set", *sets]
    return cmd


def slot_env(slot: int, n_slots: int) -> dict:
    """Env pinning job -> accelerator slot (one process per chip).

    TPU_VISIBLE_DEVICES restricts the libtpu chip set per process (the
    supported way to split a multi-chip host between processes);
    CUDA_VISIBLE_DEVICES covers GPU hosts. CPU-only hosts ignore both.
    """
    env = dict(os.environ)
    if n_slots > 0:
        env["TPU_VISIBLE_DEVICES"] = str(slot)
        env["CUDA_VISIBLE_DEVICES"] = str(slot)
        # each process needs its own coordinator port when chips are split;
        # overwrite unconditionally — an inherited value would make every
        # concurrent slot job share one coordinator, defeating the isolation
        # the slot leasing guarantees
        env["TPU_MESH_CONTROLLER_ADDRESS"] = f"localhost:{8476 + slot}"
        env["TPU_MESH_CONTROLLER_PORT"] = str(8476 + slot)
    return env


def run_name(i: int, overrides: dict) -> str:
    name = "_".join(f"{k.replace('.', '-')}{v}" for k, v in overrides.items())
    return name or f"job{i}"


def launch_local(main_py, base, runs, args):
    results = []
    # slots are LEASED from a pool, not derived from the job index: with
    # more grid points than slots, index-derived slots would hand a chip
    # that is still busy to the next job (two processes on one device)
    slot_pool = queue.Queue()
    for s in range(max(args.device_slots, 1)):
        slot_pool.put(s)

    def launch(i_overrides):
        i, overrides = i_overrides
        name = run_name(i, overrides)
        out_dir = f"{args.out_root}/{name}"
        cmd = job_cmd(main_py, base, overrides, out_dir)
        slot = slot_pool.get() if args.device_slots > 0 else 0
        try:
            print("launching:", " ".join(cmd),
                  f"[slot {slot}]" if args.device_slots else "")
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  env=slot_env(slot, args.device_slots))
        finally:
            if args.device_slots > 0:
                slot_pool.put(slot)
        return {"name": name, "out_dir": out_dir, "overrides": overrides,
                "returncode": proc.returncode,
                "stderr_tail": proc.stderr[-800:] if proc.returncode else ""}

    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        for rec in pool.map(launch, enumerate(runs)):
            status = "ok" if rec["returncode"] == 0 \
                else f"FAILED ({rec['returncode']})"
            print(f"{rec['name']}: {status}")
            results.append(rec)
    return results


def launch_slurm(main_py, base, runs, args):
    """Write (and submit, when sbatch exists) a job-array sbatch script."""
    out_root = Path(args.out_root)
    out_root.mkdir(parents=True, exist_ok=True)
    lines = ["#!/bin/bash",
             f"#SBATCH --array=0-{len(runs) - 1}%{args.jobs}",
             f"#SBATCH --output={out_root}/slurm_%a.out",
             "#SBATCH --ntasks=1",
             f"#SBATCH --cpus-per-task={args.slurm_cpus}",
             "case $SLURM_ARRAY_TASK_ID in"]
    for i, overrides in enumerate(runs):
        cmd = job_cmd(main_py, base, overrides,
                      f"{args.out_root}/{run_name(i, overrides)}")
        lines.append(f"  {i}) {shlex.join(cmd)} ;;")
    lines += ["esac"]
    script = out_root / "sweep.sbatch"
    script.write_text("\n".join(lines) + "\n")
    print(f"wrote {script} ({len(runs)} array tasks)")
    if shutil.which("sbatch") and not args.slurm_no_submit:
        subprocess.run(["sbatch", str(script)], check=True)
    else:
        print("sbatch not found (or --slurm-no-submit): submit manually")
    return [{"name": run_name(i, ov), "out_dir": f"{args.out_root}/{run_name(i, ov)}",
             "overrides": ov, "returncode": None} for i, ov in enumerate(runs)]


def collect_summary(results, out_root: Path) -> dict:
    for rec in results:
        metrics_file = Path(rec["out_dir"]) / "metrics.jsonl"
        if metrics_file.exists():
            lines = metrics_file.read_text().splitlines()
            rec["final_metrics"] = json.loads(lines[-1]) if lines else {}
    summary = {"n_jobs": len(results),
               "n_failed": sum(1 for r in results if r["returncode"]
                               not in (0, None)),
               "jobs": results}
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "summary.json").write_text(json.dumps(summary, indent=2))
    return summary


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", type=str, default="", help="flags shared by all jobs")
    ap.add_argument("--sweep", action="append", default=[],
                    help="key=v1,v2,... (dotted keys route via --set)")
    ap.add_argument("--jobs", type=int, default=1, help="concurrent jobs")
    ap.add_argument("--out-root", type=str, default="logs/sweep")
    ap.add_argument("--launcher", default="local", choices=["local", "slurm"])
    ap.add_argument("--device-slots", type=int, default=0,
                    help="pin job i to accelerator i%%N (0 = share default)")
    ap.add_argument("--slurm-cpus", type=int, default=4)
    ap.add_argument("--slurm-no-submit", action="store_true")
    args = ap.parse_args()

    main_py = Path(__file__).parent / "main.py"
    base = shlex.split(args.base)
    runs = list(expand_grid(args.sweep)) or [{}]

    if args.launcher == "slurm":
        results = launch_slurm(main_py, base, runs, args)
    else:
        results = launch_local(main_py, base, runs, args)
    summary = collect_summary(results, Path(args.out_root))
    failed = summary["n_failed"]
    print(f"sweep done: {summary['n_jobs']} jobs, {failed} failed "
          f"(summary: {args.out_root}/summary.json)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
