"""Bayesian logistic regression posteriors: prior VI methods vs SMC/RE over
the four UCI datasets.

Re-design of the reference experiments/sample_bayesian_logreg_competing.py;
eval/avg_predictive_log_prob is the dataset-specific headline metric.
"""
import argparse

import jax.numpy as jnp

from common import (add_common_args, announce, competing_run, dump_results,
                    make_target, make_target_details)

parser = argparse.ArgumentParser()
parser.add_argument("--solver_type", type=str, required=True,
                    choices=["pis_orig", "dds_orig", "dis_orig", "cmcd", "smc", "re"])
parser.add_argument("--datasets", type=str, default="cancer,credit,ionosphere,sonar")
add_common_args(parser)
args = parser.parse_args()
config = vars(args)
announce(config)

filename = f"bayesian_logreg_solver_type_{args.solver_type}_seed_{args.seed}.pkl"
dump = []
for name in args.datasets.split(","):
    details = make_target_details(name)
    target = make_target(details)
    x_init = jnp.zeros((4, target.dim))  # chains from the prior mode
    dump.append(competing_run(args, target, details, x_init, filename,
                              extra_params={"dataset": name}))
    dump_results(args.results_path, filename, config, dump)
