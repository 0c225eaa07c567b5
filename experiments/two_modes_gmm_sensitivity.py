"""Sensitivity of LRDS to the number of GMM reference components.

Re-design of the reference experiments/two_modes_gmm_sensitivity.py.
"""
import argparse

import jax

from common import (add_common_args, announce, build_dataset_and_gaussian,
                    dump_results, lrds_run, make_target, make_target_details)

parser = argparse.ArgumentParser()
parser.add_argument("--solver_type", type=str, default="vp-ref",
                    choices=["vp-ref", "pbm-ref"])
parser.add_argument("--integrator_type", type=str, default="ei")
parser.add_argument("--dim", type=int, default=16)
parser.add_argument("--n_components_range", type=str, default="1,2,4,8")
add_common_args(parser, train_steps=2048)
args = parser.parse_args()
config = vars(args)
announce(config)

filename = f"two_modes_gmm_sensitivity_solver_{args.solver_type}_seed_{args.seed}.pkl"
details = make_target_details("two_modes", dim=args.dim)
target = make_target(details)
dump = []
# one MALA dataset for the whole sweep: every cell uses the same seed and
# target, so rebuilding it per n_components was pure duplicate work
_, k_data, _ = jax.random.split(jax.random.PRNGKey(args.seed), 3)
prebuilt = build_dataset_and_gaussian(k_data, target, target.loc,
                                      args.dataset_size)
for n_comp in [int(x) for x in args.n_components_range.split(",")]:
    dump.append(lrds_run(args, target, details, target.loc, "gmm",
                         extra_params={"n_components": n_comp},
                         solver_type=args.solver_type,
                         integrator_type=args.integrator_type,
                         n_gmm_components=n_comp, prebuilt=prebuilt))
    dump_results(args.results_path, filename, config, dump)
