"""Sensitivity of prior methods and RDS to the reference scale σ.

Re-design of the reference experiments/sigma_sensitivity.py: sweep σ around
the moment-matched optimum and record every metric.
"""
import argparse

import jax

from common import (add_common_args, announce, build_dataset_and_gaussian,
                    dump_results, make_target, make_target_details,
                    run_vi, sigma_from_moments)

parser = argparse.ArgumentParser()
parser.add_argument("--solver_type", type=str, default="vp-ref",
                    choices=["pis_orig", "dds_orig", "dis_orig", "vp-ref", "pbm-ref"])
parser.add_argument("--dim", type=int, default=16)
parser.add_argument("--sigma_factors", type=str, default="0.25,0.5,1.0,2.0,4.0")
add_common_args(parser, train_steps=2048)
args = parser.parse_args()
config = vars(args)
announce(config)

filename = f"sigma_sensitivity_solver_{args.solver_type}_seed_{args.seed}.pkl"
details = make_target_details("two_modes", dim=args.dim)
target = make_target(details)
key = jax.random.PRNGKey(args.seed)
key, k_data = jax.random.split(key)
dataset, mean, var, var_diag, times = build_dataset_and_gaussian(
    k_data, target, target.loc, args.dataset_size)
sigma_opt = sigma_from_moments(
    mean, var_diag, target.dim,
    terminal_t=args.terminal_t_pis if args.solver_type == "pis_orig" else None)

is_ref = "ref" in args.solver_type
dump = []
for factor in [float(x) for x in args.sigma_factors.split(",")]:
    key, k_vi = jax.random.split(key)
    _, metrics = run_vi(
        k_vi, args.solver_type, details, {"sigma": factor * sigma_opt},
        {"train_steps": args.train_steps,
         "train_batch_size": args.train_batch_size,
         "eval_batch_size": args.eval_batch_size},
        n_sampling_seeds=args.n_sampling_seeds,
        integrator_type="ei" if is_ref else "em",
        time_type="snr" if is_ref else "uniform",
        model_type="base_zero_init" if is_ref else "target_informed_zero_init",
        n_steps=args.n_steps)
    dump.append({"metrics": metrics, "times": times,
                 "params": {"sigma_factor": factor, "sigma": factor * sigma_opt}})
    dump_results(args.results_path, filename, config, dump)
