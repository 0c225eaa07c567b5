"""Job-level parallel sweep launcher.

Re-design of the reference's hydra joblib/SLURM multirun launchers
(conf/launcher/*.yaml, utils/hydra.py:15-99): sweeps are embarrassingly
parallel independent jobs. On a TPU pod each job owns a slice (or the
process-local chip set); locally they run as subprocesses. Grid syntax:
``--sweep key=a,b,c`` expands the cross product over scripts/main.py flags.

Example:
  python scripts/sweep.py --jobs 2 --base "--solver vp_rds --target two_modes \
      --train-steps 2000" --sweep seed=0,1,2 --sweep loss-method=kl,lv
"""
from __future__ import annotations

import argparse
import itertools
import shlex
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def expand_grid(sweeps: list[str]):
    keys, values = [], []
    for s in sweeps:
        k, v = s.split("=", 1)
        keys.append(k)
        values.append(v.split(","))
    for combo in itertools.product(*values):
        yield dict(zip(keys, combo))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=str, default="", help="flags shared by all jobs")
    ap.add_argument("--sweep", action="append", default=[], help="key=v1,v2,...")
    ap.add_argument("--jobs", type=int, default=1, help="concurrent jobs")
    ap.add_argument("--out-root", type=str, default="logs/sweep")
    args = ap.parse_args()

    main_py = Path(__file__).parent / "main.py"
    base = shlex.split(args.base)
    runs = list(expand_grid(args.sweep)) or [{}]

    def launch(i_overrides):
        i, overrides = i_overrides
        name = "_".join(f"{k}{v}" for k, v in overrides.items()) or f"job{i}"
        cmd = [sys.executable, str(main_py), *base,
               "--out-dir", f"{args.out_root}/{name}"]
        for k, v in overrides.items():
            cmd += [f"--{k}", v]
        print("launching:", " ".join(cmd))
        return name, subprocess.run(cmd, capture_output=True, text=True).returncode

    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        for name, rc in pool.map(launch, enumerate(runs)):
            print(f"{name}: {'ok' if rc == 0 else f'FAILED ({rc})'}")


if __name__ == "__main__":
    main()
