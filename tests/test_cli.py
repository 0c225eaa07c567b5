"""End-to-end CLI smoke tests (scripts/main.py).

The reference's run surface is the hydra CLI (scripts/main.py:24-121); ours
is argparse. These drive the real subprocess entry point on tiny budgets:
run artifacts (config.json, metrics.jsonl, checkpoint), checkpoint resume,
and the failure path (error.txt + non-zero exit).
"""
import json
import subprocess
import sys
from pathlib import Path
import pytest

REPO = Path(__file__).parents[1]
MAIN = REPO / "scripts" / "main.py"

TINY = [
    "--device", "cpu", "--steps", "8", "--train-steps", "6",
    "--train-batch-size", "32", "--eval-batch-size", "128",
    "--eval-interval", "1000000", "--log-interval", "2", "--seed", "3",
    "--target", "two_modes", "--dim", "2",
]


def run_cli(extra, out_dir):
    cmd = [sys.executable, str(MAIN), *TINY, "--out-dir", str(out_dir), *extra]
    return subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                          timeout=600)


@pytest.mark.slow
def test_cli_run_writes_artifacts(tmp_path):
    out = tmp_path / "run"
    proc = run_cli(["--solver", "vp_rds"], out)
    assert proc.returncode == 0, proc.stderr[-2000:]
    cfg = json.loads((out / "config.json").read_text())
    assert cfg["solver"] == "vp_rds"
    lines = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert any("train/loss" in l for l in lines)
    assert not (out / "error.txt").exists()
    assert list((out / "ckpt").glob("ckpt*.msgpack")), "final checkpoint missing"


@pytest.mark.slow
def test_cli_resume_from_checkpoint(tmp_path):
    out = tmp_path / "resume"
    proc = run_cli(["--solver", "vp_rds"], out)
    assert proc.returncode == 0, proc.stderr[-2000:]
    proc2 = run_cli(["--solver", "vp_rds", "--resume", "--train-steps", "10"], out)
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "resumed from step 6" in (proc2.stderr + proc2.stdout)


@pytest.mark.slow
def test_cli_set_overrides(tmp_path):
    """--set dotted overrides (the hydra-override analogue) reach every
    config axis; resolved.json records the effective config."""
    out = tmp_path / "ovr"
    proc = run_cli(["--solver", "vp_rds", "--set", "train.lr=0.001",
                    "sde.diff_coeff_sq_max=20.0", "train.steps_per_call=2",
                    "loss.max_rnd=1000000.0"], out)
    assert proc.returncode == 0, proc.stderr[-2000:]
    r = json.loads((out / "resolved.json").read_text())
    assert r["train"]["lr"] == 0.001
    assert r["train"]["steps_per_call"] == 2
    assert r["sde"]["class"] == "VP"
    assert r["sde"]["diff_coeff_sq_max"] == 20.0


@pytest.mark.slow
def test_cli_set_rejects_bad_namespace(tmp_path):
    out = tmp_path / "badns"
    proc = run_cli(["--solver", "vp_rds", "--set", "nosuch.lr=1"], out)
    assert proc.returncode != 0
    assert "--set expects NS.KEY=VALUE" in proc.stderr


@pytest.mark.slow
def test_cli_failure_writes_error_txt(tmp_path):
    out = tmp_path / "fail"
    proc = subprocess.run(
        [sys.executable, str(MAIN), "--device", "cpu", "--target",
         "no_such_target", "--out-dir", str(out)],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert proc.returncode == 1
    err = (out / "error.txt").read_text()
    assert "Traceback" in err


@pytest.mark.slow
def test_cli_set_param_schedule(tmp_path):
    """--set train.param_schedule installs a dotted-attribute hyperparameter
    schedule (conf/utils/scheduler.yaml analogue): the scheduled loss knob
    decays at its milestone during a real run and the decayed value is
    visible in metrics.jsonl."""
    out = tmp_path / "sched"
    spec = "{'loss.sde_ctrl_noise': {'milestones': [4], 'gamma': 0.1}}"
    proc = run_cli(["--solver", "vp_rds", "--loss-method", "lv", "--set",
                    f"train.param_schedule={spec}", "loss.sde_ctrl_noise=0.5"],
                   out)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    sched = [(l["step"], l["sched/loss.sde_ctrl_noise"]) for l in lines
             if "sched/loss.sde_ctrl_noise" in l]
    assert sched, "scheduled value never logged"
    # the schedule advances AFTER each optimizer step (torch convention), so
    # the log at the milestone step already shows the decayed value
    before = [v for s, v in sched if s < 4]
    after = [v for s, v in sched if s >= 4]
    assert before and all(abs(v - 0.5) < 1e-9 for v in before), sched
    assert after and all(abs(v - 0.05) < 1e-9 for v in after), sched
