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
