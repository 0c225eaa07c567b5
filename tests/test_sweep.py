"""Parallel sweep launcher tests (scripts/sweep.py).

The reference's multirun tier is hydra's joblib/SLURM launchers
(conf/launcher/joblib.yaml, utils/hydra.py:15-99); ours is a subprocess
job-array launcher. These run a real 2-point sweep with --jobs 2 (two
concurrent CLI trainings), check distinct out_dirs + merged summary.json,
and check the sbatch script writer without submitting.
"""
import json
import subprocess
import sys
from pathlib import Path
import pytest

REPO = Path(__file__).parents[1]
SWEEP = REPO / "scripts" / "sweep.py"

TINY_BASE = ("--device cpu --solver vp_rds --target two_modes --dim 2 "
             "--steps 8 --train-steps 4 --train-batch-size 32 "
             "--eval-batch-size 128 --eval-interval 1000000 --log-interval 2")


@pytest.mark.slow
def test_sweep_parallel_jobs_and_summary(tmp_path):
    out_root = tmp_path / "sweep"
    proc = subprocess.run(
        [sys.executable, str(SWEEP), "--jobs", "2", "--base", TINY_BASE,
         "--sweep", "seed=3,4", "--out-root", str(out_root)],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:] + proc.stdout[-2000:]
    summary = json.loads((out_root / "summary.json").read_text())
    assert summary["n_jobs"] == 2 and summary["n_failed"] == 0
    out_dirs = {j["out_dir"] for j in summary["jobs"]}
    assert len(out_dirs) == 2
    for j in summary["jobs"]:
        assert j["returncode"] == 0
        assert j["final_metrics"].get("step") == 4
        assert any(k.startswith("eval/") for k in j["final_metrics"])
        assert (Path(j["out_dir"]) / "metrics.jsonl").exists()


@pytest.mark.slow
def test_sweep_dotted_keys_route_via_set(tmp_path):
    out_root = tmp_path / "dotted"
    proc = subprocess.run(
        [sys.executable, str(SWEEP), "--jobs", "2", "--base", TINY_BASE,
         "--sweep", "train.lr=0.001,0.0003", "--out-root", str(out_root)],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:] + proc.stdout[-2000:]
    summary = json.loads((out_root / "summary.json").read_text())
    lrs = set()
    for j in summary["jobs"]:
        resolved = json.loads((Path(j["out_dir"]) / "resolved.json").read_text())
        lrs.add(resolved["train"]["lr"])
    assert lrs == {0.001, 0.0003}


@pytest.mark.slow
def test_sweep_slurm_script_writer(tmp_path):
    out_root = tmp_path / "slurm"
    proc = subprocess.run(
        [sys.executable, str(SWEEP), "--launcher", "slurm", "--jobs", "2",
         "--slurm-no-submit", "--base", TINY_BASE,
         "--sweep", "seed=0,1,2", "--out-root", str(out_root)],
        capture_output=True, text=True, cwd=REPO, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    script = (out_root / "sweep.sbatch").read_text()
    assert "#SBATCH --array=0-2%2" in script
    assert script.count("main.py") == 3
    assert "--seed 0" in script and "--seed 2" in script


@pytest.mark.slow
def test_device_slots_are_leased_not_index_derived(tmp_path):
    """Regression: with more grid points than slots, slot = i % n_slots
    could hand a still-busy chip to the next job. Slots must be leased
    from a pool so two running jobs never share TPU_VISIBLE_DEVICES."""
    import importlib.util
    import os
    import time

    spec = importlib.util.spec_from_file_location("sweep_mod", SWEEP)
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)

    stub = tmp_path / "stub_main.py"
    log = tmp_path / "slots.log"
    stub.write_text(
        "import os, sys, time\n"
        "t0 = time.time(); time.sleep(0.4); t1 = time.time()\n"
        f"open({str(log)!r}, 'a').write(\n"
        "    f\"{os.environ.get('TPU_VISIBLE_DEVICES')} {t0} {t1}\\n\")\n")

    class A:
        out_root = str(tmp_path / "out")
        jobs = 3
        device_slots = 2

    runs = [{"seed": str(i)} for i in range(5)]
    results = sweep.launch_local(str(stub), [], runs, A())
    assert all(r["returncode"] == 0 for r in results)
    rows = [ln.split() for ln in log.read_text().splitlines()]
    assert len(rows) == 5
    assert {r[0] for r in rows} <= {"0", "1"}
    by_slot = {}
    for slot, t0, t1 in rows:
        by_slot.setdefault(slot, []).append((float(t0), float(t1)))
    for slot, spans in by_slot.items():
        spans.sort()
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 <= b0 + 1e-3, f"slot {slot} double-booked"
