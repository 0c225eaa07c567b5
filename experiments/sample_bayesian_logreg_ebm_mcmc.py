"""LRDS on Bayesian-logreg posteriors with a learned (tilted-EBM) reference.

Re-design of the reference experiments/sample_bayesian_logreg_ebm_mcmc.py.
"""
import argparse

import jax.numpy as jnp

from common import (add_common_args, announce, dump_results, ebm_run,
                    make_target, make_target_details)

parser = argparse.ArgumentParser()
parser.add_argument("--solver_type", type=str, default="vp-ref",
                    choices=["vp-ref", "pbm-ref"])
parser.add_argument("--integrator_type", type=str, default="ei")
parser.add_argument("--datasets", type=str, default="ionosphere,sonar")
parser.add_argument("--n_components", type=int, default=1)
parser.add_argument("--ebm_epochs", type=int, default=4)
add_common_args(parser)
args = parser.parse_args()
config = vars(args)
announce(config)

filename = f"bayesian_logreg_ebm_mcmc_solver_{args.solver_type}_seed_{args.seed}.pkl"
dump = []
for name in args.datasets.split(","):
    details = make_target_details(name)
    target = make_target(details)
    x_init = jnp.zeros((4, target.dim))
    dump.append(ebm_run(args, target, details, x_init,
                        extra_params={"dataset": name},
                        solver_type=args.solver_type,
                        integrator_type=args.integrator_type,
                        n_gmm_components=args.n_components,
                        ebm_kwargs={"ebm_epochs": args.ebm_epochs}))
    dump_results(args.results_path, filename, config, dump)
