"""JIT-built native (C++/OpenMP) host kernels for evaluation metrics.

The reference's only native dependency is pykeops, which JIT-compiles
C++/CUDA reductions for the Sinkhorn metric on first use
(sde_sampler/eval/sinkhorn.py:7, setup.py:21). This package mirrors that
model for the host tier: ``load_sinkhorn_lib()`` compiles
``sinkhorn_cpu.cpp`` with g++ -O3 -fopenmp on first call, caches the shared
object per source hash, and exposes it via ctypes. TPU evaluation keeps
using the tiled-XLA kernel in ``..sinkhorn``; this path serves CPU-only
boxes and post-hoc metric sweeps. Everything degrades gracefully: if no
compiler is available, ``load_sinkhorn_lib()`` returns None and callers
fall back to XLA.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

_SRC = Path(__file__).with_name("sinkhorn_cpu.cpp")
_LIB = None
_LOAD_FAILED = False


def _cache_dir() -> Path:
    root = os.environ.get("SDE_SAMPLER_NATIVE_CACHE")
    if root:
        return Path(root)
    return Path.home() / ".cache" / "sde_sampler_lrds_tpu"


_FLAGS = ["-O3", "-march=native", "-ffast-math", "-fopenmp", "-shared",
          "-fPIC", "-std=c++17"]


def _compiler_tag() -> bytes:
    """Host/compiler fingerprint for the cache key: a -march=native binary
    built on one CPU generation must not be loaded on another (SIGILL on
    shared home dirs), and flag/compiler changes must rebuild."""
    import platform

    try:
        ver = subprocess.run(["g++", "--version"], capture_output=True,
                             text=True, timeout=10).stdout.splitlines()[0]
    except (OSError, subprocess.TimeoutExpired, IndexError):
        ver = "unknown"
    # platform.machine() is just 'x86_64' everywhere — resolve what
    # -march=native actually targets on THIS host so a binary built on one
    # CPU generation is never loaded on another via a shared cache dir.
    try:
        cc = subprocess.run(
            ["g++", "-march=native", "-E", "-v", "-", "-o", os.devnull],
            input="", capture_output=True, text=True, timeout=10)
        march = next((ln.strip() for ln in cc.stderr.splitlines()
                      if "-march=" in ln and "cc1" in ln), "")
    except (OSError, subprocess.TimeoutExpired):
        march = ""
    if not march:  # fallback: the CPU flag set itself
        try:
            with open("/proc/cpuinfo") as f:
                march = next((ln for ln in f if ln.startswith("flags")), "")
        except OSError:
            march = platform.machine()
    return f"{ver}|{march}|{' '.join(_FLAGS)}".encode()


def build_sinkhorn_lib(verbose: bool = False) -> Path | None:
    """Compile the shared library if needed; returns its path or None.

    Concurrent-build safe: each process compiles to a unique mkstemp path
    and publishes with an atomic os.replace, so racing builders can only
    ever install a complete object.
    """
    if not _SRC.exists():
        return None
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src + b"\0" + _compiler_tag()).hexdigest()[:16]
    out = _cache_dir() / f"sinkhorn_cpu_{tag}.so"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    # -ffast-math lets gcc vectorize the exp loops through libmvec (the
    # wrapper clamps log-weights so no input is ±inf/NaN)
    fd, tmp = tempfile.mkstemp(dir=out.parent, suffix=".so.tmp")
    os.close(fd)
    cmd = ["g++", *_FLAGS, str(_SRC), "-o", tmp]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            if verbose:
                print(res.stderr)
            return None
        os.replace(tmp, out)
    except (OSError, subprocess.TimeoutExpired):
        return None
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out


def load_sinkhorn_lib() -> ctypes.CDLL | None:
    """Load (building if necessary) the native Sinkhorn library."""
    global _LIB, _LOAD_FAILED
    if _LIB is not None:
        return _LIB
    if _LOAD_FAILED:
        return None
    path = build_sinkhorn_lib()
    if path is None:
        _LOAD_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        _LOAD_FAILED = True
        return None
    lib.sinkhorn_cpu.restype = ctypes.c_double
    lib.sinkhorn_cpu.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # x, n
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # y, m
        ctypes.c_int,                                     # d
        ctypes.POINTER(ctypes.c_double),                  # log_a
        ctypes.POINTER(ctypes.c_double),                  # log_b
        ctypes.c_int, ctypes.c_double, ctypes.c_double,   # p, eps, eps_start
        ctypes.c_int, ctypes.c_int,                       # anneal, max_iters
        ctypes.c_double, ctypes.c_int64, ctypes.c_int,    # thresh, cache, thr
    ]
    lib.sinkhorn_cpu_num_threads.restype = ctypes.c_int
    lib.sinkhorn_cpu_num_threads.argtypes = []
    _LIB = lib
    return _LIB


def sinkhorn_native(x, y, log_a, log_b, p: int, eps: float, eps_start: float,
                    anneal: bool, max_iters: int, stop_thresh: float,
                    cost_cache_bytes: int = 1 << 30,
                    n_threads: int = 0) -> float | None:
    """Run the native Sinkhorn; returns None when the library is unavailable."""
    import numpy as np

    lib = load_sinkhorn_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    y = np.ascontiguousarray(y, dtype=np.float32)
    # clamp so zero weights reach the kernel as exp-underflow, not -inf
    # (the library is built with -ffast-math, which assumes finite inputs)
    log_a = np.maximum(np.ascontiguousarray(log_a, dtype=np.float64), -700.0)
    log_b = np.maximum(np.ascontiguousarray(log_b, dtype=np.float64), -700.0)
    n, d = x.shape
    m = y.shape[0]
    val = lib.sinkhorn_cpu(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m, d,
        log_a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        log_b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(p), float(eps), float(eps_start), int(bool(anneal)),
        int(max_iters), float(stop_thresh), int(cost_cache_bytes),
        int(n_threads))
    return None if val < 0 else float(val)
