"""Forward-ESS curve of the MNIST 'nn' (tilted-EBM) reference over training.

The round-4 paper-protocol MNIST run failed on the bound side (norm-ESS =
1/batch, |log Z| err ~3e3 nats) and its own telemetry located the failure in
the REFERENCE, not the sampler: the tilted EBM's forward ESS on held-out
data was 8e-4 at the best of only 15 training epochs. Before burning hours
of 196-d UNet sampler training (reference pipeline: additions/ebm_mle.py:401
-> models/reparam.py:277 -> solver/oc.py:577), this driver isolates the
reference fit: it trains the tilted conv-EBM at a real epoch budget (the
reference's logreg protocol uses 300, sample_bayesian_logreg_ebm_mcmc.py:31)
with a per-epoch forward-ESS trace, including the step-0 point = the plain
per-digit GMM baseline, so the epoch budget and the usefulness of the tilt
are decided by measurement instead of another blind sampler run.

Output: results_mnist/ebm_curve_<target>_seed_<s>.pkl with
{config, gmm_fwd_ess, history [(step, fwd_ess)...], best_step, best_ess}.
"""
import argparse

import jax
import numpy as np

from common import (announce, build_dataset_and_gaussian, dump_results,
                    make_target, make_target_details, stage,
                    train_ebm_reference)
from pathlib import Path

DATA_DIR = Path(__file__).resolve().parents[1] / "data"

parser = argparse.ArgumentParser()
parser.add_argument("--target_type", type=str, default="mnist_zero_one",
                    choices=["mnist_zero_one", "mnist"])
parser.add_argument("--dataset_size", type=int, default=20000)
parser.add_argument("--mcmc_step_size", type=float, default=1e-4)
parser.add_argument("--em_type", type=str, default="full")
parser.add_argument("--ebm_net_arch", type=str, default="mnist_conv")
parser.add_argument("--ebm_epochs", type=int, default=300)
parser.add_argument("--ebm_levels", type=int, default=100)
parser.add_argument("--ebm_batch_size", type=int, default=64)
parser.add_argument("--ebm_lr", type=float, default=1e-4)
parser.add_argument("--ebm_step_size", type=float, default=1e-4)
parser.add_argument("--ebm_n_mcmc_steps", type=int, default=8)
parser.add_argument("--ebm_warmup", type=int, default=1024)
parser.add_argument("--ebm_reg", type=float, default=1e-3)
parser.add_argument("--ebm_t_limit", type=float, default=0.01)
parser.add_argument("--select_size", type=int, default=4096)
parser.add_argument("--results_path", type=str, default="results_mnist")
parser.add_argument("--seed", type=int, default=0)
args = parser.parse_args()
config = vars(args)
announce(config)

details = make_target_details(args.target_type)
target = make_target(details)
digits = (0, 1) if args.target_type == "mnist_zero_one" else tuple(range(10))
means = np.stack([np.load(DATA_DIR / f"mnist_mean_label_{d}.npy").reshape(-1)
                  for d in digits])
x_init = jax.numpy.asarray(2.0 * means - 1.0)

# identical key split to sample_mnist_unet.py so the dataset (and therefore
# the fitted GMM) matches the sampler run that follows this diagnostic
key = jax.random.PRNGKey(args.seed)
_, k_data, k_ebm = jax.random.split(key, 3)
dataset, mean, _var, var_diag, times = build_dataset_and_gaussian(
    k_data, target, x_init, args.dataset_size, step_size=args.mcmc_step_size)

net, extra = train_ebm_reference(
    k_ebm, dataset, mean, var_diag,
    n_gmm_components=len(digits), em_type=args.em_type,
    means_init=np.asarray(x_init), net_arch=args.ebm_net_arch,
    n_levels=args.ebm_levels, ebm_epochs=args.ebm_epochs,
    ebm_batch_size=args.ebm_batch_size, lr=args.ebm_lr,
    step_size=args.ebm_step_size, n_mcmc_steps=args.ebm_n_mcmc_steps,
    initial_n_warmup_mcmc_steps=args.ebm_warmup, reg_val=args.ebm_reg,
    t_limit=args.ebm_t_limit, target=target, select_best=True,
    select_size=args.select_size)

history = extra.get("ebm_select_history", [])
gmm_ess = next((s for st, s in history if st == 0), None)
stage(f"GMM-only fwd ESS {gmm_ess}; best {extra.get('ebm_select_fwd_ess')} "
      f"at step {extra.get('ebm_select_step')}")
for st, sc in history:
    print(f"  step {st:>7d}  fwd_ess {sc:.6f}")

# persist the selected params: the EBM training here is key-identical to
# sample_mnist_unet.py's (same seed split), so the sampler run can load
# this checkpoint with --ebm_params_from instead of re-paying the full
# EBM budget (~80 min at 300 epochs on one chip)
from flax import serialization

out_dir = Path(args.results_path)
out_dir.mkdir(parents=True, exist_ok=True)
params_path = out_dir / f"ebm_params_{args.target_type}_seed_{args.seed}.msgpack"
_, _, sel_params = net
params_path.write_bytes(serialization.to_bytes(sel_params))
stage(f"saved selected EBM params -> {params_path}")

dump_results(args.results_path, f"ebm_curve_{args.target_type}_seed_{args.seed}.pkl",
             config, [{"gmm_fwd_ess": gmm_ess,
                       "history": history,
                       "best_step": extra.get("ebm_select_step"),
                       "best_ess": extra.get("ebm_select_fwd_ess"),
                       "times": {**times, "ebm_train": extra["ebm_train"]}}])
