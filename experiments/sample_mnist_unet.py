"""LRDS on the MNIST MixtureNice target with the UNet control network.

The reference exposes this pipeline through
experiments/benchmark_utils.make_model ('mnist'/'mnist_zero_one' target
names at benchmark_utils.py:44,80-83 with the '*unet_zero_init' model types
at :31-38 -> conf/model/basic_unet.yaml -> models/mnist_unet.py:238) but
ships no standalone driver; this driver closes that end-to-end path: MALA
dataset seeded at the digit-mean images -> fitted reference (Gaussian or
196-d diagonal GMM, one component per digit) -> VP-RDS with the 14x14 UNet
-> digit-classification mode metrics (mode_weight, entropy/KL/TV of the
digit histogram, forgotten modes — distr/nice.py:538-605).
"""
import argparse
from pathlib import Path

import jax
import numpy as np

from common import (add_common_args, announce, build_dataset_and_gaussian,
                    dump_results, lrds_run, make_target, make_target_details,
                    stage, train_ebm_reference)

DATA_DIR = Path(__file__).parents[1] / "data"

parser = argparse.ArgumentParser()
parser.add_argument("--solver_type", type=str, default="vp-ref",
                    choices=["vp-ref", "pbm-ref"])
# 'nn' is the BASELINE.json config-#5 protocol: per-digit GMM tilted by a
# conv energy, trained by RE-based contrastive MLE (the reference pipeline
# additions/ebm_mle.py:401 + models/reparam.py:277 + solver/oc.py:577);
# 'gmm'/'gaussian' are the fitted-reference ablations (round-3 runs).
parser.add_argument("--ref_type", type=str, default="gmm",
                    choices=["gaussian", "gmm", "nn"])
parser.add_argument("--integrator_type", type=str, default="ei")
parser.add_argument("--target_type", type=str, default="mnist_zero_one",
                    choices=["mnist_zero_one", "mnist"])
parser.add_argument("--model_type", type=str, default="unet_zero_init",
                    choices=["unet_zero_init", "base_zero_init"])
parser.add_argument("--mcmc_step_size", type=float, default=1e-4)
# full-covariance per-digit GMM reference by default: MNIST pixels are
# strongly correlated, and (as on phi_four — docs/RESULTS.md) a diagonal
# reference cannot represent them, which starves the control
parser.add_argument("--em_type", type=str, default="full",
                    choices=["diag", "full"])
parser.add_argument("--lr", type=float, default=3e-4)
# multi_step decay (conf/lr_scheduler/multi_step.yaml semantics): x0.3 at
# 1/2 and 3/4 of training — the long-run stabilizer for the 196-d control
parser.add_argument("--lr_decay", type=float, default=0.3)
# EBM ('nn') reference knobs — defaults follow the phi4 EBM protocol
# (sample_phi_four_ebm_mcmc.py) adapted to 196-d images: conv energy,
# forward-ESS checkpoint selection, mild L2 energy regularization
parser.add_argument("--ebm_net_arch", type=str, default="mnist_conv",
                    choices=["mnist_conv", "mlp"])
parser.add_argument("--ebm_epochs", type=int, default=60)
parser.add_argument("--ebm_levels", type=int, default=100)
parser.add_argument("--ebm_batch_size", type=int, default=64)
parser.add_argument("--ebm_lr", type=float, default=1e-4)
parser.add_argument("--ebm_step_size", type=float, default=1e-4)
parser.add_argument("--ebm_n_mcmc_steps", type=int, default=8)
parser.add_argument("--ebm_warmup", type=int, default=1024)
parser.add_argument("--ebm_reg", type=float, default=1e-3)
parser.add_argument("--ebm_t_limit", type=float, default=0.01)
# reuse a checkpoint saved by mnist_ebm_curve.py (key-identical pipeline)
parser.add_argument("--ebm_params_from", type=str, default=None)
add_common_args(parser, dataset_size=20000, train_steps=20000,
                train_batch=256, eval_batch=2048)
args = parser.parse_args()
config = vars(args)
announce(config)

filename = (f"mnist_{args.target_type}_ref_{args.ref_type}"
            f"_model_{args.model_type}_solver_{args.solver_type}"
            f"_seed_{args.seed}.pkl")
details = make_target_details(args.target_type)
target = make_target(details)

# Seed the MALA chains at the digit-mean images mapped into the target's
# normalized [-1, 1] space (MixtureNice._maybe_unnormalize: u = (x+1)/2),
# the MNIST analogue of seeding at known energy minima.
digits = (0, 1) if args.target_type == "mnist_zero_one" else tuple(range(10))
means = np.stack([np.load(DATA_DIR / f"mnist_mean_label_{d}.npy").reshape(-1)
                  for d in digits])
x_init = jax.numpy.asarray(2.0 * means - 1.0)

optim = {"lr": args.lr}
if args.lr_decay and args.lr_decay != 1.0:
    optim["lr_scheduler"] = {
        "name": "multi_step", "gamma": args.lr_decay,
        "milestones": [args.train_steps // 2, (3 * args.train_steps) // 4]}

net = None
prebuilt = None
ebm_diag = {}
if args.ref_type == "nn":
    # the paper-protocol reference: per-digit full-covariance GMM (EM
    # seeded at the digit means) tilted by a zero-init conv energy, trained
    # by RE-based contrastive MLE with forward-ESS checkpoint selection
    key = jax.random.PRNGKey(args.seed)
    _, k_data, k_ebm = jax.random.split(key, 3)
    prebuilt = build_dataset_and_gaussian(
        k_data, target, x_init, args.dataset_size,
        step_size=args.mcmc_step_size)
    dataset, mean, _var, var_diag, times = prebuilt
    net, ebm_extra = train_ebm_reference(
        k_ebm, dataset, mean, var_diag,
        n_gmm_components=len(digits), em_type=args.em_type,
        means_init=np.asarray(x_init), net_arch=args.ebm_net_arch,
        n_levels=args.ebm_levels, ebm_epochs=args.ebm_epochs,
        ebm_batch_size=args.ebm_batch_size, lr=args.ebm_lr,
        step_size=args.ebm_step_size, n_mcmc_steps=args.ebm_n_mcmc_steps,
        initial_n_warmup_mcmc_steps=args.ebm_warmup, reg_val=args.ebm_reg,
        t_limit=args.ebm_t_limit, target=target, select_best=True,
        pretrained_params_path=args.ebm_params_from)
    times.update({k: v for k, v in ebm_extra.items()
                  if isinstance(v, (int, float))})
    ebm_diag = {k: v for k, v in ebm_extra.items()
                if k.startswith("ebm_select")}
    # forward ESS of the learned reference on held-out data — the quality
    # telemetry every ebm_run logs (docs/RESULTS.md)
    from sde_sampler_lrds_tpu.utils.common import normalized_ess

    _sc, _lp, _pp = net
    n_diag = min(4096, dataset.shape[0])
    lw = _lp(_pp, jax.numpy.full((n_diag,), 1e-4), dataset[-n_diag:]) \
        - target.unnorm_log_prob(dataset[-n_diag:])
    ebm_diag["forward_ess_ebm"] = float(normalized_ess(lw))
    stage(f"EBM reference forward ESS on data: "
          f"{ebm_diag['forward_ess_ebm']:.5f}")

res = lrds_run(args, target, details, x_init, args.ref_type,
               extra_params={"target": args.target_type,
                             "model_type": args.model_type},
               solver_type=args.solver_type,
               integrator_type=args.integrator_type,
               model_type=args.model_type,
               n_gmm_components=len(digits),
               em_type=args.em_type,
               mcmc_step_size=args.mcmc_step_size,
               optim_details=optim, net=net, prebuilt=prebuilt)
res.update(ebm_diag)
dump_results(args.results_path, filename, config, [res])
