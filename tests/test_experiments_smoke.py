"""Experiment-driver smoke: every driver parses --help cleanly.

The reference's 13 drivers rotted (sample_toy_competing.py:6 imports a
missing `distr.funnel` — SURVEY §2.6); this guards ours against the same
class of import/argparse rot without running any training.
"""
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parents[1]
DRIVERS = sorted(p for p in (REPO / "experiments").glob("*.py")
                 if p.name != "common.py")


def test_all_drivers_present():
    # the reference ships 13 experiment scripts + benchmark_utils; we ship
    # 16 drivers + common.py (SURVEY §2.2)
    assert len(DRIVERS) >= 16, [p.name for p in DRIVERS]


# each --help subprocess pays a ~4 s jax import on the 1-CPU CI budget, so
# the full 17-driver sweep is @slow; one representative stays default
@pytest.mark.slow
@pytest.mark.parametrize("driver", DRIVERS, ids=lambda p: p.stem)
def test_driver_help(driver):
    _check_driver_help(driver)


def test_driver_help_representative():
    _check_driver_help(REPO / "experiments" / "sample_toy_gmm_mcmc.py")


def _check_driver_help(driver):
    proc = subprocess.run(
        [sys.executable, str(driver), "--help"], capture_output=True,
        text=True, cwd=REPO / "experiments", timeout=300)
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "usage" in proc.stdout.lower()


@pytest.mark.slow
def test_run_vi_progress_file(tmp_path):
    """Each eval pass lands in the sidecar as soon as it completes, so a
    timeout mid-eval no longer loses the whole run."""
    import json

    import jax

    sys.path.insert(0, str(REPO / "experiments"))
    from common import make_target_details, run_vi

    pf = tmp_path / "partial.jsonl"
    run_vi(jax.random.PRNGKey(0), "vp-ref", make_target_details("two_modes", dim=2),
           {"sigma": 1.0},
           {"train_steps": 4, "train_batch_size": 32, "eval_batch_size": 64},
           n_sampling_seeds=3, ref_type="default", integrator_type="ei",
           model_type="base_zero_init", time_type="snr", n_steps=8,
           progress_file=pf, compute_samples_based_metrics=False)
    lines = [json.loads(l) for l in pf.read_text().splitlines()]
    assert len(lines) == 3
    assert all("eval/elbo" in l for l in lines)


@pytest.mark.slow
def test_driver_device_cpu_escape(tmp_path):
    """--device cpu forces the host backend in a driver subprocess (the
    tunnel-down escape hatch, applied by announce()): a tiny end-to-end
    competing run completes and dumps its pickle without touching the
    default (TPU) backend."""
    proc = subprocess.run(
        [sys.executable, "sample_two_modes_competing.py",
         "--solver_type", "dds_orig", "--dim_range", "2",
         "--dataset_size", "500", "--train_steps", "8",
         "--train_batch_size", "32", "--eval_batch_size", "128",
         "--n_sampling_seeds", "1", "--smc_n_warmup_mcmc_steps", "8",
         "--device", "cpu", "--results_path", str(tmp_path)],
        capture_output=True, text=True, cwd=REPO / "experiments",
        timeout=580)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert list(tmp_path.glob("*.pkl")), "driver dumped no result pickle"
