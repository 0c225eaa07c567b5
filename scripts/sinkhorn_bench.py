"""Uncontended Sinkhorn backend measurement (VERDICT r4 weak #1 / next #5).

Round 4 left a contradiction: commit 64b997e claimed a Pallas hardware win
(159 vs 178 ms) while BENCH_r04 and the manual capture both recorded a
~1.4x loss. PERF.md §2 models n = 8192 but the bench ran n = 4096. This
script settles it: standalone process (run with the TPU otherwise idle),
n and d sweeps at the PERF.md scale, an (bn, bm) tile sweep for the Pallas
tier, medians over reps. One JSON line per row.
"""
import argparse
import functools
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from sde_sampler_lrds_tpu.eval.sinkhorn import Sinkhorn
from sde_sampler_lrds_tpu.utils.cache import enable_compilation_cache


def med_time(fn, *a, n_calls=3, reps=5):
    jax.block_until_ready(fn(*a))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(n_calls)]
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / n_calls)
    return statistics.median(times), min(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tile_sweep", action="store_true")
    args = p.parse_args()
    enable_compilation_cache()
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    for n, d in ((4096, 8), (8192, 8), (8192, 100)):
        ka, kb = jax.random.split(jax.random.PRNGKey(5))
        xs_a = jax.random.normal(ka, (n, d))
        xs_b = jax.random.normal(kb, (n, d)) + 0.5
        row = {"n": n, "d": d}
        vals = {}
        for be in ("pallas", "xla"):
            sk = Sinkhorn(eps=1e-3, max_iters=100, backend=be)
            vals[be] = float(sk(xs_a, xs_b))
            med, best = med_time(sk, xs_a, xs_b)
            row[f"{be}_ms"] = round(med * 1e3, 2)
            row[f"{be}_best_ms"] = round(best * 1e3, 2)
        row["abs_diff"] = abs(vals["pallas"] - vals["xla"])
        print(json.dumps(row), flush=True)

    if args.tile_sweep:
        from sde_sampler_lrds_tpu.ops import sinkhorn_lse as sl

        n, d = 8192, 8
        ka, kb = jax.random.split(jax.random.PRNGKey(5))
        xs_a = jax.random.normal(ka, (n, d))
        xs_b = jax.random.normal(kb, (n, d)) + 0.5
        orig = sl.pallas_lse
        for bn, bm in ((256, 2048), (512, 2048), (1024, 2048),
                       (256, 4096), (512, 4096), (1024, 4096),
                       (512, 8192), (1024, 8192), (2048, 8192)):
            sl.pallas_lse = functools.partial(orig, bn=bn, bm=bm)
            try:
                sk = Sinkhorn(eps=1e-3, max_iters=100, backend="pallas")
                med, best = med_time(sk, xs_a, xs_b)
                print(json.dumps({"bn": bn, "bm": bm,
                                  "pallas_ms": round(med * 1e3, 2),
                                  "best_ms": round(best * 1e3, 2)}), flush=True)
            except Exception as e:
                print(json.dumps({"bn": bn, "bm": bm, "error": repr(e)[:120]}),
                      flush=True)
            finally:
                sl.pallas_lse = orig


if __name__ == "__main__":
    main()
