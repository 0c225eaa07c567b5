"""Persistent XLA compilation cache.

The axon TPU backend compiles remotely over a tunnel; cold compiles of the
bench/experiment programs cost tens of seconds to minutes *each* and every
process restart pays them again. JAX's persistent compilation cache stores
the serialized executables on local disk keyed by (HLO, compile options,
backend fingerprint), so re-runs of unchanged programs skip the remote
compile entirely. Call :func:`enable_compilation_cache` once per process
before building any jitted computation (bench.py and experiments/common.py
do). No reference counterpart — torch.compile caching is orthogonal; this
exists because remote-compile latency dominates wall-clock here.
"""
from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = Path.home() / ".cache" / "jax_comp_cache"


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None):
    """Best-effort: turn on JAX's persistent compilation cache.

    Safe to call multiple times; silently a no-op if the running JAX build
    rejects the config knobs (the cache is an optimization, never a
    correctness dependency).
    """
    import jax

    path = Path(cache_dir or os.environ.get("JAX_COMP_CACHE_DIR",
                                            _DEFAULT_DIR))
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # cache everything that took >=1s to compile; the default 60s floor
        # would skip most of the mid-size programs that dominate our runs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - version-dependent knobs
        pass
