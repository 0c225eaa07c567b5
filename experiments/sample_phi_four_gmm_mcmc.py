"""LRDS on φ⁴ with Gaussian/GMM references fitted from well-seeded MCMC.

Re-design of the reference experiments/sample_phi_four_gmm_mcmc.py.
"""
import argparse

import jax.numpy as jnp

from common import (add_common_args, announce, dump_results, lrds_run,
                    make_target, make_target_details)

parser = argparse.ArgumentParser()
parser.add_argument("--solver_type", type=str, default="vp-ref",
                    choices=["vp-ref", "pbm-ref"])
parser.add_argument("--ref_type", type=str, default="gmm",
                    choices=["gaussian", "gmm"])
parser.add_argument("--integrator_type", type=str, default="ei")
parser.add_argument("--dim", type=int, default=100)
parser.add_argument("--b_range", type=str, default="0.0,0.02,0.05")
parser.add_argument("--n_components", type=int, default=2)
parser.add_argument("--em_type", type=str, default="full", choices=["diag", "full"])
add_common_args(parser)
args = parser.parse_args()
config = vars(args)
announce(config)

filename = (f"phi_four_gmm_mcmc_ref_{args.ref_type}_solver_{args.solver_type}"
            f"_seed_{args.seed}.pkl")
dump = []
for b in [float(x) for x in args.b_range.split(",")]:
    details = make_target_details("phi_four", dim=args.dim, b=b)
    target = make_target(details)
    x_init = jnp.stack([jnp.ones(args.dim), -jnp.ones(args.dim)])
    dump.append(lrds_run(args, target, details, x_init, args.ref_type,
                         extra_params={"b": b, "dim": args.dim},
                         solver_type=args.solver_type,
                         integrator_type=args.integrator_type,
                         n_gmm_components=args.n_components,
                         em_type=args.em_type, mcmc_step_size=1e-4,
                         # sinkhorn/mmd/ks vs the exact FFBS ground truth are
                         # recomputed post hoc from the dumped samples (the
                         # per-eval-seed n=8192 passes dominate wall time)
                         compute_samples_based_metrics=False))
    dump_results(args.results_path, filename, config, dump)
