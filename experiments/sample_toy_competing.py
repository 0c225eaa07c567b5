"""2-D toy targets (rings, checkerboard): prior VI methods vs SMC/RE.

Re-design of the reference experiments/sample_toy_competing.py (its `funnel`
branch imports a module deleted from the fork — SURVEY.md §2.6 — so the
supported targets here are the ones that actually run).
"""
import argparse

import jax

from common import (add_common_args, announce, competing_run, dump_results,
                    make_target, make_target_details)

parser = argparse.ArgumentParser()
parser.add_argument("--solver_type", type=str, required=True,
                    choices=["pis_orig", "dds_orig", "dis_orig", "cmcd", "smc", "re"])
parser.add_argument("--target_type", type=str, default="rings",
                    choices=["rings", "checkerboard"])
add_common_args(parser)
args = parser.parse_args()
config = vars(args)
announce(config)

filename = (f"toy_{args.target_type}_solver_type_{args.solver_type}"
            f"_seed_{args.seed}.pkl")
details = make_target_details(args.target_type)
target = make_target(details)
if args.target_type == "rings":
    x_init = target.sample_init_points(jax.random.PRNGKey(args.seed), 4)
else:
    x_init = target.loc
res = competing_run(args, target, details, x_init, filename,
                    extra_params={"target": args.target_type})
dump_results(args.results_path, filename, config, [res])
