"""φ⁴ lattice benchmark: prior VI methods vs SMC/RE across couplings.

Re-design of the reference experiments/sample_phi_four_competing.py — the
inter-well weight metric (eval/weight vs true_weight_cor) is the headline.
"""
import argparse

import jax.numpy as jnp

from common import (add_common_args, announce, competing_run, dump_results,
                    make_target, make_target_details)

parser = argparse.ArgumentParser()
parser.add_argument("--solver_type", type=str, required=True,
                    choices=["pis_orig", "dds_orig", "dis_orig", "cmcd", "smc", "re"])
parser.add_argument("--dim", type=int, default=100)
parser.add_argument("--b_range", type=str, default="0.0,0.02,0.05")
add_common_args(parser, dataset_size=40000)
args = parser.parse_args()
config = vars(args)
announce(config)

filename = f"phi_four_solver_type_{args.solver_type}_seed_{args.seed}.pkl"
dump = []
for b in [float(x) for x in args.b_range.split(",")]:
    details = make_target_details("phi_four", dim=args.dim, b=b)
    target = make_target(details)
    # chains seeded at the two wells
    x_init = jnp.stack([jnp.ones(args.dim), -jnp.ones(args.dim)])
    dump.append(competing_run(args, target, details, x_init, filename,
                              extra_params={"b": b, "dim": args.dim},
                              mcmc_step_size=1e-4))
    dump_results(args.results_path, filename, config, dump)
