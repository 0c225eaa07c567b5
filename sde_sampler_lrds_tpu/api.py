"""Public programmatic API: the six-axis `make_model` factory and the
benchmark pipeline helpers.

Re-design of experiments/benchmark_utils.py: the reference's hydra-compose
surface becomes a plain registry, but the public axes are identical
(README.md:59-68):

    solver    ∈ {dds_orig, pis_orig, dis_orig, cmcd, vp-ref, pbm-ref}
    reference ∈ {default, gaussian, gmm, nn}
    loss      ∈ {kl, lv}
    integrator∈ {em, ei, ddpm_like}
    model     ∈ {target_informed_zero_init, target_informed_unet_zero_init,
                 target_informed_langevin_init, target_informed_lerp_tempering,
                 base_zero_init, unet_zero_init}
    time grid ∈ {uniform, snr}

plus mcmc_sample (MALA/RWMH dataset builder), fit_gmm (sklearn EM with a
reg_covar sweep), build_ebm, and the tempering-path SMC/RE baselines.
All validation rules mirror benchmark_utils.make_model:100-159.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .ebm import DAEBM, DiffusionRecoveryLikelihood, MaximumLikelihoodEBM
from .eval.ks import compute_sliced_ks
from .eval.mmd import mmd_median
from .eval.sinkhorn import Sinkhorn
from .losses import (
    ControlledLangevinSDELoss,
    DDPMLikeReferenceSDELoss,
    EIReferenceSDELoss,
    EMReferenceSDELoss,
    ExponentialIntegratorSDELoss,
    TimeReversalLoss,
)
from .mcmc import MCMCState, re_sampler, smc_sampler
from .mcmc.kernels import run_chain
from .models import (
    CancelDriftCtrl,
    ClippedCtrl,
    FourierMLP,
    LerpCtrl,
    ScoreCtrl,
    TimeEmbed,
    remove_reference_ctrl,
    zero_init_bias,
    zero_init_kernel,
)
from .sde import VP, CosineVP, PinnedBM, ScaledBM, get_timesteps
from .solvers import CMCD, DDS, PIS, RDS, Bridge
from .solvers.base import TrainConfig
from .targets import (
    BracketTwoModes,
    Checkerboard,
    Delta,
    Gauss,
    GaussFull,
    IsotropicGauss,
    LogisticRegression,
    ManyModes,
    PhiFour,
    Rings,
    TwoModes,
    TwoModesFull,
)

SOLVER_TYPES = ("dds_orig", "pis_orig", "dis_orig", "cmcd", "vp-ref", "pbm-ref")
MODEL_TYPES = ("target_informed_zero_init", "target_informed_unet_zero_init",
               "target_informed_langevin_init", "target_informed_lerp_tempering",
               "base_zero_init", "unet_zero_init")
TARGET_NAMES = ("two_modes", "bracket_two_modes", "two_modes_full", "many_modes",
                "rings", "checkerboard", "phi_four", "mnist", "mnist_zero_one",
                "cancer", "credit", "ionosphere", "sonar")


def make_target_details(target_name: str, **kwargs) -> dict:
    """Default target hyperparameters (benchmark_utils.py:41).

    Keys beyond the per-target defaults pass through verbatim (so
    `--set target.a=0.2` reaches the constructor instead of being
    silently dropped); unknown keys then fail loudly in make_target."""
    assert target_name in TARGET_NAMES
    details = _make_target_defaults(target_name, **kwargs)
    details.update({k: v for k, v in kwargs.items() if k not in details})
    return details


def _make_target_defaults(target_name: str, **kwargs) -> dict:
    if target_name in ("two_modes", "two_modes_full"):
        return {"name": target_name, "dim": kwargs.get("dim", 5),
                "ill_conditioned": kwargs.get(
                    "ill_conditioned", "not" if target_name == "two_modes" else "medium"),
                "a": kwargs.get("a", 1.0)}
    if target_name == "bracket_two_modes":
        return {"name": target_name, "dim": kwargs.get("dim", 5),
                "a": kwargs.get("a", 0.75)}
    if target_name == "many_modes":
        return {"name": "many_modes", "dim": kwargs.get("dim", 5),
                "n_modes": kwargs.get("n_modes", 4),
                "mixture_weight_factor": kwargs.get("mixture_weight_factor", 3.0),
                "var": kwargs.get("var", 0.5)}
    if target_name == "phi_four":
        return {"name": "phi_four", "dim": kwargs.get("dim", 100),
                "b": kwargs.get("b", 0.0)}
    return {"name": target_name}


def make_target(target_details: dict):
    """Instantiate a target from its details dict (the conf/target registry)."""
    name = target_details["name"]
    kw = {k: v for k, v in target_details.items() if k != "name"}
    if name == "two_modes":
        return TwoModes(n_reference_samples=16384, **kw)
    if name == "two_modes_full":
        return TwoModesFull(n_reference_samples=16384, **kw)
    if name == "bracket_two_modes":
        return BracketTwoModes(n_reference_samples=16384, **kw)
    if name == "many_modes":
        return ManyModes(n_reference_samples=10000, **kw)
    if name == "rings":
        return Rings(**kw)
    if name == "checkerboard":
        return Checkerboard(**kw)
    if name == "phi_four":
        return PhiFour(a=kw.pop("a", 0.1), b=kw.pop("b", 0.0),
                       dim=kw.pop("dim", 100), **kw)
    if name in ("cancer", "credit", "ionosphere", "sonar"):
        return LogisticRegression(data_type=name, **kw)
    if name in ("mnist", "mnist_zero_one"):
        # mixture of per-digit NICE flows; checkpoints are trained by
        # scripts/train_nice.py --per-label (the reference's data/ lacks its
        # own per-digit checkpoints too — SURVEY.md §2.6)
        from .targets.nice import MixtureNice

        digits = (0, 1) if name == "mnist_zero_one" else tuple(range(10))
        return MixtureNice(digits=digits, **kw)
    raise NotImplementedError(f"Target {name} not supported.")


def _time_embed_scale_model(val: float | None = None):
    """TimeEmbed scale net: near-zero output (score models) or ≈val
    (langevin/lerp init) — conf/model/base/time_embed.yaml."""
    bias = zero_init_bias(fan_in=64) if val is None else zero_init_bias(fan_in=64, val=val)
    return TimeEmbed(dim_out=1, num_layers=4, channels=64,
                     last_kernel_init=zero_init_kernel(), last_bias_init=bias)


def make_ctrl(model_type: str, dim: int, target, prior, sde,
              compute_dtype=None, base_arch: str | None = None):
    """Control network per model axis (conf/model/*.yaml).

    `*unet_zero_init` model types build the 14×14 MNIST UNet
    (benchmark_utils.py:31-38 → conf/model/basic_unet.yaml: n_channels=16,
    zero-init last conv); dim must be a perfect square (196 for MNIST).
    `base_arch` selects the MLP family for the non-UNet types:
    'fouriermlp' (default) or 'densenet' (conf/model/base/densenet.yaml).

    compute_dtype=jnp.bfloat16 runs the Dense matmuls at the MXU's native
    precision (params stay f32, outputs cast back to f32); quality on the
    demo protocol is unchanged (docs/RESULTS.md).
    """
    if "unet" in model_type:
        from .models.mnist_unet import Unet

        # fail loudly rather than silently running f32 / the wrong family
        if compute_dtype is not None:
            raise ValueError("compute_dtype is not supported for the UNet "
                             "model types yet (GroupNorm/attention numerics).")
        if base_arch not in (None, "fouriermlp"):
            raise ValueError(f"base_arch={base_arch!r} conflicts with the "
                             f"UNet model type {model_type!r}.")
        side = int(round(math.sqrt(dim)))
        if side * side != dim:
            raise ValueError(
                f"UNet model types need a square dim (got {dim}); the "
                "reference UNet is the 14x14=196 MNIST net (mnist_unet.py:238).")
        base = Unet(n_channels=16, side=side, init_last_layer_with_zeros=True)
    elif base_arch in (None, "fouriermlp"):
        base = FourierMLP(dim=dim, zero_init=True, compute_dtype=compute_dtype)
    elif base_arch == "densenet":
        from .models.mlp import DenseNet

        base = DenseNet(dim=dim, arch=(64, 64), zero_init=True,
                        compute_dtype=compute_dtype)
    else:
        raise ValueError(f"Unknown base_arch {base_arch!r}")
    if model_type in ("base_zero_init", "unet_zero_init"):
        return ClippedCtrl(base_model=base, clip_model=1e4)
    if model_type in ("target_informed_zero_init", "target_informed_unet_zero_init"):
        return ScoreCtrl(base_model=base, clip_model=1e4, clip_score=1e4,
                         target_score=target.score, score_model=_time_embed_scale_model(),
                         detach_score=False, scale_score=1.0)
    if model_type == "target_informed_langevin_init":
        return CancelDriftCtrl(base_model=base, clip_model=1e4, clip_score=1e4,
                               target_score=target.score,
                               score_model=_time_embed_scale_model(val=1.0),
                               detach_score=False, sde=sde)
    if model_type == "target_informed_lerp_tempering":
        return LerpCtrl(base_model=base, clip_model=1e4, clip_score=1e4,
                        target_score=target.score, prior_score=prior.score,
                        score_model=_time_embed_scale_model(val=1.0),
                        detach_score=False, sde=sde, scale_lerp=1.0)
    raise ValueError(f"Unknown model type {model_type}")


def make_model(solver_type: str, ref_type: str, loss_type: str, integrator_type: str,
               model_type: str, time_type: str, solver_details: dict,
               target_details: dict, training_details: dict, optim_details: dict | None = None,
               n_steps: int = 100, force_base_zero_init: bool = False,
               use_ema: bool = False, force_vp20: bool = False,
               force_vp_cosine: bool = False, compute_samples_based_metrics: bool = True,
               force_T_cosine: float | None = None, out_dir=None, mesh=None,
               compute_dtype=None, base_arch: str | None = None,
               sde_details: dict | None = None, loss_details: dict | None = None,
               inference_ctrl_arch: str | None = None):
    """Build a fully configured sampler (benchmark_utils.make_model:96).

    Composability (the hydra-override surface of conf/base.yaml):
      - extra ``training_details`` keys beyond the consumed seven are applied
        to ANY TrainConfig field (e.g. steps_per_call, max_loss, ema_decay);
      - ``sde_details`` kwargs are merged into the SDE constructor of the
        selected solver (e.g. diff_coeff_sq_max=20.0);
      - ``loss_details`` kwargs override the loss defaults (e.g. max_rnd).
    The CLI exposes all of these as ``--set ns.key=value`` dotted overrides
    (scripts/main.py).

    ``inference_ctrl_arch`` (DIS/GBS only) composes a SECOND zero-init
    control net that learns the noising-process drift — the GBS
    configuration of the reference's Bridge (solver/oc.py:185-261, where a
    conf/model entry is instantiated as cfg.inference_ctrl). It takes the
    same model-type enum as ``model_type``; the loss then adds the
    divergence term and the drift_div_int eval correction
    (losses/oc.py:1105-1307). Pair with ``loss_details={'div_estimator':
    'rademacher'}`` for Hutchinson instead of the exact divergence."""
    assert solver_type in SOLVER_TYPES
    assert ref_type in ("default", "gaussian", "gmm", "nn")
    assert loss_type in ("kl", "lv")
    assert integrator_type in ("em", "ei", "ddpm_like")
    assert model_type in MODEL_TYPES
    assert time_type in ("uniform", "snr")
    assert isinstance(solver_details, dict)
    assert isinstance(target_details, dict) and "name" in target_details
    assert isinstance(training_details, dict)

    # -- validation rules (benchmark_utils.py:111-159) ---------------------
    if ("orig" in solver_type) or ("dis" in solver_type) or ("cmcd" in solver_type):
        if not (model_type == "base_zero_init" and force_base_zero_init):
            if solver_type in ("dds_orig", "pis_orig") and model_type not in (
                    "target_informed_zero_init", "target_informed_unet_zero_init"):
                raise ValueError("Only target_informed_zero_init model is supported.")
            if "dis" in solver_type and model_type == "base_zero_init":
                raise ValueError("Model base_zero_init is not supported.")
            # NOTE: mirrors benchmark_utils.py:122-123 verbatim — the check
            # fires ON base_zero_init (despite its message), so the competing
            # drivers run CMCD with the target-informed model; pass
            # force_base_zero_init=True for the conf/solver/cmcd.yaml default.
            if solver_type == "cmcd" and model_type == "base_zero_init":
                raise ValueError("Only base_zero_init is supported for CMCD.")
        if solver_type == "cmcd" and model_type in (
                "target_informed_lerp_tempering",
                "target_informed_langevin_init"):
            # these reparametrizations read sde.terminal_t/drift/diff, but
            # CMCD builds its ControlledLangevinSDE inside setup_models
            # (and rebuilds it on update_prior) — the ctrl would hold
            # sde=None and crash at the first forward pass
            raise ValueError(f"model_type {model_type!r} is not supported "
                             f"for CMCD (needs a static SDE object).")
        if time_type != "uniform":
            raise ValueError("Only uniform time discretisation is supported for orig/cmcd models.")
        if integrator_type != "em":
            raise ValueError("Can't use EI or DDPM-like discretization with orig models.")
        if force_vp20 and solver_type != "dis_orig":
            raise ValueError("Can't use vp_20 for orig models other than DIS.")
        if force_vp_cosine:
            raise ValueError("Can't use vp_cosine for orig models.")
    if "ref" in solver_type:
        if model_type == "target_informed_lerp_tempering":
            raise ValueError("Model target_informed_lerp_tempering is not supported.")
        if solver_type == "pbm-ref" and time_type == "uniform":
            raise ValueError("PBM schedule is unstable with uniform time discretization.")
        if integrator_type == "ddpm_like" and time_type == "uniform":
            raise ValueError("Using the integration scheme from DDPM with uniform times is unstable.")
    if force_vp20 and force_vp_cosine:
        raise ValueError("Can't use vp_20 and vp_cosine at the same time.")
    if solver_type == "pbm-ref" and (force_vp20 or force_vp_cosine):
        raise ValueError("Can't use vp_20 or vp_cosine with PBM.")
    if (ref_type != "default" and "ref" not in solver_type) and solver_type != "cmcd":
        raise ValueError("Only ref models can use a non-default ref.")
    if solver_type == "cmcd" and ref_type not in ("default", "gaussian"):
        raise ValueError("Can't use ref other than gaussian for CMCD.")
    if model_type == "target_informed_langevin_init" and integrator_type in ("ei", "ddpm_like"):
        raise ValueError("Can't use EI or DDPM-like with Langevin score.")
    if inference_ctrl_arch is not None:
        if solver_type != "dis_orig":
            raise ValueError("inference_ctrl_arch (GBS) is only supported for "
                             "dis_orig — the reference composes cfg.inference_ctrl "
                             "only in Bridge (solver/oc.py:194-208).")
        if inference_ctrl_arch not in MODEL_TYPES:
            raise ValueError(f"inference_ctrl_arch must be one of {MODEL_TYPES}; "
                             f"got {inference_ctrl_arch!r}")

    # -- target / prior / sde ---------------------------------------------
    target = make_target(target_details)
    dim = target.dim
    sigma = solver_details.get("sigma", 1.0)

    optim_details = dict(optim_details or {})
    # training_details wins over optim_details for the effective lr (it is
    # the --set train.lr surface); resolve BEFORE building lr_schedule or a
    # train.lr override is silently ignored whenever a scheduler is present
    # (make_optimizer prefers cfg.lr_schedule over cfg.lr)
    lr = training_details.get("lr", optim_details.get("lr", 3e-4))
    lr_schedule = None
    if "lr_scheduler" in optim_details:
        from .solvers.schedulers import make_lr_schedule

        sched_cfg = dict(optim_details["lr_scheduler"])
        lr_schedule = make_lr_schedule(sched_cfg.pop("name"), lr,
                                       training_details["train_steps"], **sched_cfg)
    cfg_kwargs = dict(
        train_steps=training_details["train_steps"],
        train_batch_size=training_details["train_batch_size"],
        eval_batch_size=training_details["eval_batch_size"],
        lr=lr,
        lr_schedule=lr_schedule,
        use_ema=use_ema,
        eval_interval=training_details.get("eval_interval", 10**9),
        log_interval=training_details.get("log_interval", 50),
        grad_clip=training_details.get("grad_clip"),
        seed=training_details.get("seed", 0),
    )
    # any further training_details key targets a TrainConfig field directly
    # (--set train.steps_per_call=8 etc.); training_details wins over the
    # lr/use_ema values coming from optim_details / the use_ema kwarg
    cfg_fields = {f.name for f in dataclasses.fields(TrainConfig)}
    _consumed = ("train_steps", "train_batch_size", "eval_batch_size",
                 "eval_interval", "log_interval", "grad_clip", "seed")
    extra_cfg = {k: v for k, v in training_details.items()
                 if k not in _consumed}
    unknown = set(extra_cfg) - cfg_fields
    if unknown:
        raise ValueError(
            f"Unknown training_details keys {sorted(unknown)}; valid "
            f"TrainConfig fields: {sorted(cfg_fields)}")
    cfg_kwargs.update(extra_cfg)
    cfg = TrainConfig(**cfg_kwargs)

    sde_details = dict(sde_details or {})

    def _sde(cls, **kw):
        kw.update(sde_details)
        return cls(**kw)

    loss_kwargs = {"method": loss_type}
    if loss_type == "lv":
        loss_kwargs["max_rnd"] = 1e8
    loss_kwargs.update(loss_details or {})

    def make_vp():
        if force_vp_cosine:
            return _sde(CosineVP, scale_diff_coeff=sigma)
        if force_vp20:
            return _sde(VP, diff_coeff_sq_min=0.1, diff_coeff_sq_max=20.0,
                        scale_diff_coeff=sigma)
        return _sde(VP, diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0,
                    scale_diff_coeff=sigma)

    t_eps = 1e-4
    if solver_type == "dds_orig":
        prior = IsotropicGauss(dim=dim, scale=sigma)
        end = force_T_cosine if force_T_cosine is not None else 6.4
        ts = get_timesteps(0.0, end, dt=0.05, rescale_t="cosine")
        # setdefault: --set loss.alpha=… overrides must survive this merge
        loss_kwargs.setdefault("alpha", solver_details.get("alpha", 1.0))
        loss_kwargs.setdefault("sigma", sigma)
        solver = DDS(target, prior, None, make_ctrl(model_type, dim, target, prior, None,
                                   compute_dtype=compute_dtype, base_arch=base_arch),
                     ExponentialIntegratorSDELoss, loss_kwargs, train_ts=ts, cfg=cfg,
                     out_dir=out_dir, **({"mesh": mesh} if mesh else {}))
    elif solver_type == "pis_orig":
        prior = Delta(dim=dim, loc=0.0)
        # terminal_t is overridable so --terminal_t_pis stays consistent
        # with the sigma/sqrt(T) moment matching (the reference rescales
        # sigma but hardcodes T=5.0 in conf/sde/bm_pis.yaml — a non-default
        # flag silently mis-scaled its reference process)
        sde = _sde(ScaledBM, diff_coeff=sigma,
                   terminal_t=solver_details.get("terminal_t", 5.0))
        ts = get_timesteps(0.0, sde.terminal_t, steps=n_steps)
        solver = PIS(target, prior, sde, make_ctrl(model_type, dim, target, prior, sde,
                                   compute_dtype=compute_dtype, base_arch=base_arch),
                     EMReferenceSDELoss, loss_kwargs, train_ts=ts, cfg=cfg,
                     out_dir=out_dir, **({"mesh": mesh} if mesh else {}))
    elif solver_type == "dis_orig":
        sde = make_vp() if force_vp20 or force_vp_cosine else _sde(
            VP, diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0,
            scale_diff_coeff=sigma)
        prior = IsotropicGauss(dim=dim, scale=sde.scale_diff_coeff)
        ts = get_timesteps(0.0, sde.terminal_t, steps=n_steps)
        if force_vp_cosine:
            ts = get_timesteps(1e-3, sde.terminal_t, steps=n_steps)
        inf_ctrl = None
        if inference_ctrl_arch is not None:
            inf_ctrl = make_ctrl(inference_ctrl_arch, dim, target, prior, sde,
                                 compute_dtype=compute_dtype, base_arch=base_arch)
        solver = Bridge(target, prior, sde, make_ctrl(model_type, dim, target, prior, sde,
                                   compute_dtype=compute_dtype, base_arch=base_arch),
                        TimeReversalLoss, loss_kwargs, train_ts=ts, cfg=cfg,
                        out_dir=out_dir, inference_ctrl=inf_ctrl,
                        **({"mesh": mesh} if mesh else {}))
    elif solver_type == "cmcd":
        prior = IsotropicGauss(dim=dim, scale=solver_details.get("prior_scale", 5.0))
        ts = get_timesteps(0.0, 1.0, steps=n_steps)
        solver = CMCD(target, prior, None, make_ctrl(model_type, dim, target, prior, None,
                                   compute_dtype=compute_dtype, base_arch=base_arch),
                      ControlledLangevinSDELoss, loss_kwargs, train_ts=ts, cfg=cfg,
                      out_dir=out_dir, **({"mesh": mesh} if mesh else {}))
    else:  # vp-ref / pbm-ref  ->  RDS
        if solver_type == "pbm-ref":
            sde = _sde(PinnedBM,
                       diff_coeff=sigma if ref_type == "default" else math.sqrt(0.2),
                       terminal_t=5.0)
            prior = Delta(dim=dim, loc=0.0)
            start = t_eps if time_type == "snr" else 1e-4
            ts = get_timesteps(start, sde.terminal_t - t_eps, steps=n_steps,
                               sde=sde if time_type == "snr" else None)
        else:
            sde = make_vp()
            prior = IsotropicGauss(dim=dim, scale=sde.scale_diff_coeff)
            if time_type == "snr":
                ts = get_timesteps(t_eps, sde.terminal_t - t_eps, steps=n_steps, sde=sde)
            elif force_vp_cosine:
                ts = get_timesteps(1e-3, sde.terminal_t, steps=n_steps)
            elif integrator_type == "ddpm_like":
                ts = get_timesteps(0.0, sde.terminal_t - 1e-4, steps=n_steps)
            else:
                ts = get_timesteps(0.0, sde.terminal_t, steps=n_steps)
        loss_cls = {"em": EMReferenceSDELoss, "ei": EIReferenceSDELoss,
                    "ddpm_like": DDPMLikeReferenceSDELoss}[integrator_type]
        solver = RDS(target, prior, sde, make_ctrl(model_type, dim, target, prior, sde,
                                   compute_dtype=compute_dtype, base_arch=base_arch),
                     loss_cls, loss_kwargs, train_ts=ts, cfg=cfg, out_dir=out_dir,
                     **({"mesh": mesh} if mesh else {}))

    # -- sample-based metrics ----------------------------------------------
    if compute_samples_based_metrics:
        solver.sample_losses = {
            "sinkhorn": Sinkhorn(),
            "mmd": mmd_median,
            "ks": lambda a, b: compute_sliced_ks(a, b),
        }

    # -- reference install (benchmark_utils.py:229-253) --------------------
    if "ref" in solver_type:
        if ref_type == "gaussian":
            solver.change_reference_type(
                "gaussian", mean=solver_details["mean_ref"], var=solver_details["var_ref"])
        elif ref_type == "gmm":
            solver.change_reference_type(
                "gmm", weights=solver_details["weights_ref"],
                means=solver_details["means_ref"],
                variances=solver_details["variances_ref"])
        elif ref_type == "nn":
            solver.change_reference_type("nn", net=solver_details["net"],
                                         eps=float(ts[0]))
    if solver_type == "cmcd" and ref_type == "gaussian":
        solver.update_prior(mean=solver_details["mean"], var=solver_details["var"])

    # -- Langevin-init under RDS: model only the deviation from the ref ----
    if model_type == "target_informed_langevin_init" and "ref" in solver_type:
        base_ctrl_fn = solver.ctrl_fn

        def wrapped_ctrl_fn(params):
            return remove_reference_ctrl(base_ctrl_fn(params), solver.reference_score_t,
                                         use_rescaling=True, sde=solver.sde)

        solver.ctrl_fn = wrapped_ctrl_fn

    return solver


# ---------------------------------------------------------------------------
# dataset / reference-fitting pipeline
# ---------------------------------------------------------------------------

def mcmc_sample(key, target, x_init, mcmc_type: str = "mala", step_size: float = 1e-3,
                n_chains_per_mode: int = 4, dataset_length: int = 50000,
                n_warmup_steps: int = 512, skip_chain_per_mode: bool = False,
                target_log_prob_and_grad: Callable | None = None,
                adapt_step_size: bool = True, shuffle: bool = True) -> jnp.ndarray:
    """MALA/RWMH dataset builder (benchmark_utils.py:268): chains seeded at
    the provided mode points, adaptive step sizes, post-warmup pooling."""
    if target_log_prob_and_grad is None:
        target_log_prob_and_grad = target.log_prob_and_score
    if skip_chain_per_mode:
        y_init = x_init
    else:
        y_init = jnp.repeat(x_init, n_chains_per_mode, axis=0)
    n_chains = y_init.shape[0]
    n_mcmc_steps = int(dataset_length / n_chains)
    k_run, k_shuf = jax.random.split(key)
    state = MCMCState.init(y_init, target_log_prob_and_grad, step_size)
    kernel = "mala" if mcmc_type == "mala" else "rwmh"
    ta = 0.75 if adapt_step_size else 0.0
    state, _ = run_chain(jax.random.fold_in(k_run, 0), state,
                         target_log_prob_and_grad, n_warmup_steps, kernel=kernel,
                         target_acceptance=ta, collect=False)
    state, samples = run_chain(jax.random.fold_in(k_run, 1), state,
                               target_log_prob_and_grad, n_mcmc_steps, kernel=kernel,
                               target_acceptance=ta, collect=True)
    out = samples.reshape(-1, y_init.shape[-1])
    if shuffle:
        out = jax.random.permutation(k_shuf, out)
    return out


def fit_gmm(n_components: int, dataset, means_init=None, em_type: str = "diag",
            max_iter: int = 1000, backend: str = "jax"):
    """EM with a reg_covar sweep (benchmark_utils.py:336).

    Returns (weights, means, variances) as jnp arrays; variances diagonal
    (K, D) for em_type='diag' or full (K, D, D) for 'full'.

    backend='jax' (default) runs device-resident EM (utils/gmm_fit.py) —
    seconds where sklearn's single-core fit takes minutes at experiment
    scale; backend='sklearn' keeps the reference's exact fitter.
    """
    data = np.asarray(dataset).reshape(-1, np.asarray(dataset).shape[-1])
    last_err = None
    # ascending regularization: weakest first, strongest as last resort
    # (the reference's list swaps each magnitude pair — 5e-5 before 1e-5
    # etc., benchmark_utils.py:338 — an evident typo'd escalation)
    regs = (1e-6, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3, 5e-3, 1e-2, 5e-2)
    # jax backend first, then the sklearn fitter as a genuinely different
    # retry (weight collapse is seeding-dependent, not reg-dependent)
    attempts = [("jax", r) for r in regs] + [("sklearn", r) for r in regs] \
        if backend == "jax" else [(backend, r) for r in regs]
    for attempt_id, (bk, reg_covar) in enumerate(attempts):
        try:
            if bk == "jax":
                from .utils.gmm_fit import fit_gmm_em

                w, m, v, _ = fit_gmm_em(
                    n_components, jnp.asarray(data), means_init=means_init,
                    em_type=em_type, max_iter=max_iter, reg_covar=reg_covar,
                    key=jax.random.PRNGKey(attempt_id))
            else:
                from sklearn.mixture import GaussianMixture

                gmm = GaussianMixture(
                    n_components=n_components, covariance_type=em_type,
                    means_init=None if means_init is None else np.asarray(means_init),
                    reg_covar=reg_covar, max_iter=max_iter).fit(data)
                w, m, v = gmm.weights_, gmm.means_, gmm.covariances_
            w = jnp.asarray(w, jnp.float32)
            m = jnp.asarray(m, jnp.float32)
            v = jnp.asarray(v, jnp.float32)
            if not (bool(jnp.all(jnp.isfinite(w))) and bool(jnp.all(jnp.isfinite(m)))
                    and bool(jnp.all(jnp.isfinite(v)))):
                raise ValueError("non-finite GMM parameters")
            if bool(jnp.any(w < 1e-8)):
                raise ValueError("collapsed GMM component")
            return w, m, v
        except Exception as e:  # pragma: no cover - sweep fallback
            last_err = e
            continue
    raise ValueError(f"Couldn't fit a GMM on this dataset ({last_err}).")


def build_ebm(ebm_type: str, sde, prior, net, target_acceptance: float = 0.75,
              use_snr_adapted_disc: bool = False, perc_keep_mcmc: float = -1.0,
              start_eps: float = 1e-3, end_eps: float = 0.0, n_steps: int = 100,
              **kwargs):
    """EBM trainer factory (benchmark_utils.py:367)."""
    if ebm_type == "drl":
        cls = DiffusionRecoveryLikelihood
    elif ebm_type == "daebm":
        cls = DAEBM
    elif "mle" in ebm_type:
        cls = MaximumLikelihoodEBM
    else:
        raise NotImplementedError(f"EBM type {ebm_type} not found.")
    return cls(sde=sde, prior=prior, net=net, target_acceptance=target_acceptance,
               use_snr_adapted_disc=use_snr_adapted_disc,
               perc_keep_mcmc=perc_keep_mcmc, start_eps=start_eps,
               end_eps=end_eps, n_steps=n_steps, **kwargs)


def define_tempering_utils(mean, var, target_log_prob, target_score=None):
    """Geometric path t·log p₀ + (1−t)·log ρ helpers (benchmark_utils.py:427)."""
    dim = mean.shape[0]
    if jnp.ndim(var) == 2:
        prior = GaussFull(dim=dim, loc=mean, cov=var)
    else:
        prior = Gauss(dim=dim, loc=mean, scale=jnp.sqrt(var))
    if target_score is None:
        target_score = jax.grad(lambda x: jnp.sum(target_log_prob(x)))

    def log_prob_and_grads(t, x):
        t_flat = jnp.reshape(t, (-1,)) if jnp.ndim(t) > 0 else jnp.full((x.shape[0],), t)
        t_col = t_flat[:, None]
        lp = t_flat * prior.log_prob(x) + (1.0 - t_flat) * jnp.reshape(target_log_prob(x), (-1,))
        g = t_col * prior.score(x) + (1.0 - t_col) * target_score(x)
        return lp, g

    return prior, log_prob_and_grads


def run_smc_sampler(key, mean, var, n_steps, step_size, n_particles, n_mcmc_steps,
                    n_warmup_mcmc_steps, target_log_prob, target_score=None,
                    reweight_threshold: float = 1.0, target_acceptance: float = 0.75):
    """SMC baseline on the tempering path. Returns the full level-0 (target,
    t=0) block of shape (n_mcmc_steps, n_particles, dim): the reference's
    ``smc_sampler(...)[0][0]`` (benchmark_utils.py:477) indexes the returned
    TUPLE first and then the level axis, keeping every MCMC slot — the
    competing drivers then pool n_particles·n_mcmc_steps samples per run
    (sample_two_modes_competing.py:153). Round-4 sliced one slot here,
    which inflated the baseline's run count 32x and timed the RE rows out."""
    prior, lpg = define_tempering_utils(mean, var, target_log_prob, target_score)
    times = jnp.linspace(0.0, 1.0, n_steps)
    k_init, k_run = jax.random.split(key)
    x0 = prior.sample(k_init, (n_particles,))
    samples, _, _ = smc_sampler(
        k_run, x0, times, lpg, n_warmup_mcmc_steps=n_warmup_mcmc_steps,
        n_mcmc_steps=n_mcmc_steps,
        step_sizes_per_noise=jnp.full((n_steps, n_particles, 1), step_size),
        reweight_threshold=reweight_threshold, target_acceptance=target_acceptance)
    return samples[0]


def run_re_sampler(key, mean, var, n_steps, step_size, batch_size, swap_frequency,
                   n_mcmc_steps, n_warmup_mcmc_steps, target_log_prob,
                   target_score=None, target_acceptance: float = 0.75):
    """Replica-exchange baseline on the tempering path (benchmark_utils.py:479).
    Returns the level-0 (target) block (n_mcmc_steps, batch_size, dim) —
    every MCMC slot, like the reference's tuple-then-level ``[0][0]``
    (see run_smc_sampler)."""
    prior, lpg = define_tempering_utils(mean, var, target_log_prob, target_score)
    times = jnp.linspace(0.0, 1.0, n_steps)
    k_init, k_run = jax.random.split(key)
    x0 = prior.sample(k_init, (batch_size,))
    samples, _, _, _ = re_sampler(
        k_run, x0, times, lpg, swap_frequency=swap_frequency,
        n_warmup_mcmc_steps=n_warmup_mcmc_steps, n_mcmc_steps=n_mcmc_steps,
        step_sizes_per_noise=jnp.full((n_steps,), step_size),
        target_acceptance=target_acceptance)
    return samples[0]


def score_with_reference_score(score_ref: Callable, score: Callable) -> Callable:
    """ref_score(t,x) − score(t,x), the DRL→RDS shim (benchmark_utils.py:410)."""
    def f(t, x):
        return score_ref(t, x) - score(t, x)
    return f
