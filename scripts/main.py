"""CLI training entry point.

Re-design of the reference's hydra CLI (scripts/main.py:24-121) as a plain
argparse surface over the same configuration axes; runs a full
train/eval/checkpoint cycle, streams metrics.jsonl, writes plots, and exits
non-zero on failure after recording the error — the reference's run-level
failure handling (scripts/main.py:113-117).

Solver presets mirror the conf/solver names:
  pis, dds, dis, cmcd, vp_rds, pbm_rds
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

SOLVER_PRESETS = {
    "pis": "pis_orig",
    "dds": "dds_orig",
    "dis": "dis_orig",
    "cmcd": "cmcd",
    "vp_rds": "vp-ref",
    "pbm_rds": "pbm-ref",
}

MODEL_PRESETS = {
    "basic": "base_zero_init",
    "basic_unet": "unet_zero_init",
    "score": "target_informed_zero_init",
    "score_unet": "target_informed_unet_zero_init",
    "langevin_init": "target_informed_langevin_init",
    "lerp": "target_informed_lerp_tempering",
}


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--solver", default="dis", choices=sorted(SOLVER_PRESETS))
    p.add_argument("--target", default="two_modes")
    p.add_argument("--dim", type=int, default=None)
    p.add_argument("--model", default="basic", choices=sorted(MODEL_PRESETS))
    p.add_argument("--loss-method", default="lv", choices=["kl", "lv"])
    p.add_argument("--integrator", default="em", choices=["em", "ei", "ddpm_like"])
    p.add_argument("--time-type", default="uniform", choices=["uniform", "snr"])
    p.add_argument("--ref-type", default="default",
                   choices=["default", "gaussian", "gmm"])
    p.add_argument("--gmm-components", type=int, default=2)
    p.add_argument("--sigma", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=100, help="SDE steps K")
    p.add_argument("--train-steps", type=int, default=10_000)
    p.add_argument("--train-batch-size", type=int, default=512)
    p.add_argument("--eval-batch-size", type=int, default=6000)
    p.add_argument("--eval-interval", type=int, default=500)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--grad-clip", type=float, default=None)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--out-dir", default="logs/run")
    p.add_argument("--plots", action="store_true", help="write marginal plots")
    p.add_argument("--resume", action="store_true", help="resume from latest ckpt")
    p.add_argument("--ckpt-interval", type=int, default=None)
    p.add_argument("--wandb", action="store_true", help="log to wandb if available")
    p.add_argument("--device", default="default", choices=["default", "cpu"],
                   help="cfg.device analogue; 'cpu' forces the host backend "
                        "('default' keeps whatever backend the runtime "
                        "pins — there is no reliable way to force the "
                        "plugin TPU platform by name, so no 'tpu' choice)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   nargs="+", metavar="NS.KEY=VALUE",
                   help="dotted-key config overrides, the hydra-override "
                        "analogue (conf/base.yaml): namespaces train.* "
                        "(any TrainConfig field), solver.*, target.*, "
                        "loss.*, sde.*, model.{base_arch,compute_dtype,"
                        "inference_ctrl_arch}. "
                        "E.g. --set train.lr=1e-3 sde.diff_coeff_sq_max=20")
    return p


_OVERRIDE_NS = ("train", "solver", "target", "loss", "sde", "model")


def parse_overrides(pairs):
    """[['train.lr=1e-3', 'sde.diff_coeff_sq_max=20']] -> per-namespace dicts.

    Values go through ast.literal_eval (ints/floats/bools/tuples) and fall
    back to the raw string, matching hydra's untyped override parsing."""
    import ast

    out = {ns: {} for ns in _OVERRIDE_NS}
    for item in (x for group in pairs for x in group):
        key, sep, val = item.partition("=")
        ns, dot, field = key.partition(".")
        if not sep or not dot or ns not in _OVERRIDE_NS or not field:
            raise SystemExit(
                f"--set expects NS.KEY=VALUE with NS in {_OVERRIDE_NS}; "
                f"got {item!r}")
        try:
            parsed = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            parsed = val
        out[ns][field] = parsed
    return out


def main():
    args = build_parser().parse_args()
    logging.basicConfig(level=logging.INFO)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "error.txt").unlink(missing_ok=True)
    (out_dir / "config.json").write_text(json.dumps(vars(args), indent=2))

    import jax

    if args.device == "cpu":
        # NOTE: the axon sitecustomize pins JAX_PLATFORMS=axon; only the
        # config update reliably forces the host backend.
        jax.config.update("jax_platforms", "cpu")

    from sde_sampler_lrds_tpu.api import (fit_gmm, make_model, make_target_details,
                                          mcmc_sample)
    from sde_sampler_lrds_tpu.eval.plots import get_plots, save_fig
    from sde_sampler_lrds_tpu.utils.wandb import maybe_init_wandb, wandb_log

    try:
        ov = parse_overrides(args.overrides)
        target_kwargs = {} if args.dim is None else {"dim": args.dim}
        target_kwargs.update(ov["target"])
        target_details = make_target_details(args.target, **target_kwargs)
        solver_details = {"sigma": args.sigma, **ov["solver"]}
        solver_type = SOLVER_PRESETS[args.solver]
        training_details = {
            "lr": args.lr,
            "train_steps": args.train_steps,
            "train_batch_size": args.train_batch_size,
            "eval_batch_size": args.eval_batch_size,
            "eval_interval": args.eval_interval,
            "log_interval": args.log_interval,
            "grad_clip": args.grad_clip,
            "seed": args.seed,
            **ov["train"],
        }
        model_ov = dict(ov["model"])
        compute_dtype = model_ov.pop("compute_dtype", None)
        if isinstance(compute_dtype, str):
            import jax.numpy as jnp

            compute_dtype = jnp.dtype(compute_dtype).type
        base_arch = model_ov.pop("base_arch", None)
        # GBS: --set model.inference_ctrl_arch=base_zero_init composes the
        # learned noising control for DIS (reference solver/oc.py:194-208)
        inference_ctrl_arch = model_ov.pop("inference_ctrl_arch", None)
        if model_ov:
            raise ValueError(f"Unknown model.* override(s): {sorted(model_ov)}")
        # Fitted references need a dataset first (the LRDS pipeline).
        if args.ref_type != "default":
            from sde_sampler_lrds_tpu.api import make_target

            tgt = make_target(target_details)
            key = jax.random.PRNGKey(args.seed)
            x_init = getattr(tgt, "loc", None)
            if x_init is None:
                import jax.numpy as jnp

                x_init = jnp.zeros((4, tgt.dim))
            data = mcmc_sample(key, tgt, x_init, dataset_length=20_000)
            if args.ref_type == "gaussian":
                solver_details.update(mean_ref=data.mean(0), var_ref=data.var(0))
            else:
                w, m, v = fit_gmm(args.gmm_components, data)
                solver_details.update(weights_ref=w, means_ref=m, variances_ref=v)

        solver = make_model(
            solver_type=solver_type, ref_type=args.ref_type,
            loss_type=args.loss_method, integrator_type=args.integrator,
            model_type=MODEL_PRESETS[args.model], time_type=args.time_type,
            solver_details=solver_details, target_details=target_details,
            training_details=training_details, n_steps=args.steps,
            use_ema=args.use_ema, out_dir=out_dir,
            sde_details=ov["sde"], loss_details=ov["loss"],
            compute_dtype=compute_dtype, base_arch=base_arch,
            inference_ctrl_arch=inference_ctrl_arch,
            # conf/solver/cmcd.yaml pairs CMCD with the basic model; the api
            # mirrors the reference's inverted check, so take the escape hatch
            force_base_zero_init=(args.solver == "cmcd" and args.model == "basic"))
        if args.ckpt_interval is not None:  # don't clobber --set train.ckpt_interval
            solver.cfg.ckpt_interval = args.ckpt_interval
        # resolved-config dump (the .hydra/config.yaml analogue): the
        # effective TrainConfig + SDE after all --set overrides
        import dataclasses

        resolved = {
            "train": {k: v for k, v in dataclasses.asdict(solver.cfg).items()
                      if isinstance(v, (int, float, str, bool, type(None)))},
            "sde": {"class": type(solver.sde).__name__ if solver.sde else None,
                    **({k: float(v) for k, v in vars(solver.sde).items()
                        if isinstance(v, (int, float))} if solver.sde else {})},
        }
        (out_dir / "resolved.json").write_text(json.dumps(resolved, indent=2))
        wandb_run = maybe_init_wandb(args.wandb, out_dir, vars(args))
        solver.setup()
        if args.resume and solver.load_checkpoint():
            logging.info("resumed from step %d", int(solver.state.step))
        metrics = solver.run()
        if wandb_run is not None:
            wandb_log(wandb_run, metrics, int(solver.state.step))
        solver.store_checkpoint()
        if args.plots:
            key = jax.random.PRNGKey(args.seed + 17)
            results = solver.evaluate(key, return_traj=True)
            plots = get_plots(solver.target, results.samples,
                              weights=results.weights, ts=results.ts,
                              xs=results.xs, marginal_dims=[0, 1])
            for name, fig in plots.items():
                save_fig(fig, out_dir / f"{name.replace('/', '_')}.png")
        logging.info("final metrics: %s",
                     {k: v for k, v in metrics.items() if isinstance(v, float)})
    except Exception as e:
        (out_dir / "error.txt").write_text(traceback.format_exc())
        logging.error("run failed: %s", e)
        sys.exit(1)


if __name__ == "__main__":
    main()
