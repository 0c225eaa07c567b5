"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding code paths are exercised on CPU with
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4); all numerics run
in float32 exactly as on TPU.

NOTE: the environment pre-registers the axon TPU-tunnel PJRT plugin via
sitecustomize and pins JAX_PLATFORMS=axon; setting the env var is not enough
(the plugin registration overrides it), so we update jax.config after import.
"""
import os
import sys
from pathlib import Path

# repo root on sys.path regardless of the invoking cwd (tests import
# scripts.train_nice etc. as namespace packages)
sys.path.insert(0, str(Path(__file__).parents[1]))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (long end-to-end trainings)")


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow by default so `pytest -q` stays interactive on
    a 1-CPU box (measured ~7 min; docs/STATUS.md tracks the exact number,
    SURVEY.md §4 the tiering); run them with --runslow or `-m slow`."""
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
