"""Sensitivity of LRDS to mis-specified GMM reference weights.

Re-design of the reference experiments/weight_sensitivity.py: perturb the
fitted reference mixture weights and measure mode-weight recovery.
"""
import argparse

import jax
import jax.numpy as jnp

from common import (add_common_args, announce, build_dataset_and_gaussian,
                    dump_results, fit_gmm, make_target, make_target_details,
                    run_vi)

parser = argparse.ArgumentParser()
parser.add_argument("--solver_type", type=str, default="vp-ref",
                    choices=["vp-ref", "pbm-ref"])
parser.add_argument("--integrator_type", type=str, default="ei")
parser.add_argument("--dim", type=int, default=16)
parser.add_argument("--weight_skews", type=str, default="0.1,0.25,0.5,0.75,0.9")
add_common_args(parser, train_steps=2048)
args = parser.parse_args()
config = vars(args)
announce(config)

filename = f"weight_sensitivity_solver_{args.solver_type}_seed_{args.seed}.pkl"
details = make_target_details("two_modes", dim=args.dim)
target = make_target(details)
key = jax.random.PRNGKey(args.seed)
key, k_data = jax.random.split(key)
dataset, mean, var, var_diag, times = build_dataset_and_gaussian(
    k_data, target, target.loc, args.dataset_size)
w_fit, m_fit, v_fit = fit_gmm(2, dataset, em_type="diag")

dump = []
for skew in [float(x) for x in args.weight_skews.split(",")]:
    key, k_vi = jax.random.split(key)
    w = jnp.asarray([skew, 1.0 - skew])
    _, metrics = run_vi(
        k_vi, args.solver_type, details,
        {"sigma": 1.0, "weights_ref": w, "means_ref": m_fit,
         "variances_ref": v_fit},
        {"train_steps": args.train_steps,
         "train_batch_size": args.train_batch_size,
         "eval_batch_size": args.eval_batch_size},
        n_sampling_seeds=args.n_sampling_seeds, ref_type="gmm",
        integrator_type=args.integrator_type, time_type="snr",
        model_type="base_zero_init", n_steps=args.n_steps)
    dump.append({"metrics": metrics, "times": times,
                 "params": {"weight_skew": skew}})
    dump_results(args.results_path, filename, config, dump)
