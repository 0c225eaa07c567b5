"""ManyModes benchmark: prior VI methods vs SMC/RE across mode counts.

Re-design of the reference experiments/sample_many_modes_competing.py
(DIS runs with the vp_20 schedule there; mode-count histograms are kept in
the metrics via eval/emc etc.).
"""
import argparse
import itertools

from common import (add_common_args, announce, competing_run, dump_results,
                    make_target, make_target_details)

parser = argparse.ArgumentParser()
parser.add_argument("--solver_type", type=str, required=True,
                    choices=["pis_orig", "dds_orig", "dis_orig", "cmcd", "smc", "re"])
parser.add_argument("--dim_range", type=str, default="8")
parser.add_argument("--n_modes_range", type=str, default="4,8,16,32,64")
parser.add_argument("--mixture_weight_factor_range", type=str, default="3.0")
parser.add_argument("--var_range", type=str, default="0.5")
add_common_args(parser)
args = parser.parse_args()
config = vars(args)
announce(config)

filename = f"many_modes_solver_type_{args.solver_type}_seed_{args.seed}.pkl"
dims = [int(d) for d in args.dim_range.split(",")]
n_modes_list = [int(m) for m in args.n_modes_range.split(",")]
factors = [float(f) for f in args.mixture_weight_factor_range.split(",")]
variances = [float(v) for v in args.var_range.split(",")]

dump = []
for dim, n_modes, factor, var in itertools.product(dims, n_modes_list, factors, variances):
    details = make_target_details("many_modes", dim=dim, n_modes=n_modes,
                                  mixture_weight_factor=factor, var=var)
    target = make_target(details)
    dump.append(competing_run(
        args, target, details, target.loc, filename,
        extra_params={"dim": dim, "n_modes": n_modes,
                      "mixture_weight_factor": factor, "var": var},
        # the reference runs DIS on vp_20 here and ONLY here
        # (sample_many_modes_competing.py:111)
        dis_vp20=True))
    dump_results(args.results_path, filename, config, dump)
