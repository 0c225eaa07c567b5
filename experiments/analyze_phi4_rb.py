"""Post-hoc φ⁴ weight-estimator analysis over dumped result pickles.

Reads `sample_phi_four_ebm_mcmc.py` pickles (which store the first eval
pass's samples since the RB protocol landed) and prints, per seed:
the dataset balance (raw + RB on MALA data), the VI sampler's raw
(indicator) weight across eval seeds, and the Z2-antithetic
Rao-Blackwellized weight (targets/phi_four.py:compute_phi_four_weight_rb)
recomputed from the saved samples. Ground truth is the exact
transfer-matrix weight, ``true_weight_tm`` in ``target.expectations``
(1.0733 at a=0.1, b=0.02, dim=100; targets/phi_four.py:
compute_stats_transfer_matrix). The Laplace-corrected oracle agrees to
0.12% (1.0745) now that its Hessian is fixed; the 1.348 figure earlier
rounds compared against was a Hessian-bug artifact — do not use it.

With ``--distances`` it also computes Sinkhorn/MMD/sliced-KS of the saved
samples against exact FFBS ground truth (the per-eval-seed passes the
drivers skip for wall-time; one pass here is enough).

Usage: python analyze_phi4_rb.py [results_dir=results_rb] [--distances]
"""
import glob
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")


def main(results_dir="results_rb", distances=False, device="cpu"):
    import jax

    from common import apply_device

    apply_device(device)

    import jax.numpy as jnp

    from common import make_target, make_target_details

    rows = []
    targets = {}  # (dim, b) -> target; the TM oracle costs seconds at dim 100
    for f in sorted(glob.glob(f"{results_dir}/*.pkl")):
        d = pickle.load(open(f, "rb"))
        cfg = d["config"]
        for r in d["results"]:
            b = r["params"]["b"]
            tk = (r["params"]["dim"], b)
            if tk not in targets:
                targets[tk] = make_target(make_target_details(
                    "phi_four", dim=tk[0], b=b))
            target = targets[tk]
            m = r["metrics"]
            w = np.asarray(m["eval/weight"])
            row = {
                "seed": cfg["seed"], "b": b,
                "dataset_raw": r.get("dataset_weight_raw"),
                "dataset_rb": r.get("dataset_weight_rb"),
                "vi_raw_mean": w.mean(), "vi_raw_lo": w.min(), "vi_raw_hi": w.max(),
                "fwd_ess": r.get("forward_ess_ebm"),
            }
            wrb = m.get("eval/weight_rb")
            if wrb is not None:
                wrb = np.asarray(wrb)
                row.update(vi_rb_mean=wrb.mean(), vi_rb_lo=wrb.min(),
                           vi_rb_hi=wrb.max())
            if "samples" in m:
                s = jnp.asarray(m["samples"])
                row["vi_rb_recomputed"] = float(
                    target.compute_phi_four_weight_rb(s))
                if distances:
                    from sde_sampler_lrds_tpu.eval.ks import compute_sliced_ks
                    from sde_sampler_lrds_tpu.eval.mmd import mmd_median
                    from sde_sampler_lrds_tpu.eval.sinkhorn import Sinkhorn

                    gt = target.sample(jax.random.PRNGKey(1234), (s.shape[0],))
                    row["sinkhorn"] = float(Sinkhorn()(gt, s))
                    row["mmd"] = float(mmd_median(gt, s))
                    row["ks"] = float(compute_sliced_ks(gt, s))
            rows.append(row)
    if not rows:
        print(f"no pickles under {results_dir}/")
        return
    hdr = ("seed  b      data_raw  data_rb   vi_raw mean[lo,hi]      "
           "vi_rb mean[lo,hi]       recomputed")
    print(hdr)
    for r in rows:
        fm = lambda v: "   --  " if v is None else f"{v:7.3f}"
        rb3 = (f"{r['vi_rb_mean']:7.3f}[{r['vi_rb_lo']:.3f},{r['vi_rb_hi']:.3f}]"
               if "vi_rb_mean" in r else "        --          ")
        dist = ""
        if "sinkhorn" in r:
            dist = (f"  sink {r['sinkhorn']:.3f}  mmd {r['mmd']:.4f}"
                    f"  ks {r['ks']:.3f}")
        print(f"{r['seed']:>4}  {r['b']:<5}  {fm(r['dataset_raw'])} "
              f"{fm(r['dataset_rb'])}  {r['vi_raw_mean']:7.3f}"
              f"[{r['vi_raw_lo']:.3f},{r['vi_raw_hi']:.3f}]  {rb3}  "
              f"{fm(r.get('vi_rb_recomputed'))}{dist}")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("results_dir", nargs="?", default="results_rb")
    p.add_argument("--distances", action="store_true",
                   help="also Sinkhorn/MMD/sliced-KS vs exact FFBS ground truth")
    p.add_argument("--device", choices=("default", "cpu"), default="cpu",
                   help="post-hoc analysis defaults to the host backend so it "
                        "works on tunnel-down hosts; 'default' uses the TPU")
    a = p.parse_args()
    main(a.results_dir, distances=a.distances, device=a.device)
