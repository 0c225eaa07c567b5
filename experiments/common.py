"""Shared machinery for the benchmark experiment drivers.

Re-design of the protocol shared by the reference's 13 experiments/*.py
scripts (e.g. sample_two_modes_competing.py): build target → MCMC dataset →
fit reference (gaussian / GMM / EBM) → make_model → TrainableWrapper.run →
multi-seed eval metrics → pickle {config, results}. SMC/RE baselines run on
the fitted-Gaussian tempering path with chunked sample-metrics.
"""
from __future__ import annotations

import pickle
import pprint
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from sde_sampler_lrds_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from sde_sampler_lrds_tpu.api import (  # noqa: F401 (re-exported for drivers)
    build_ebm,
    fit_gmm,
    make_model,
    make_target,
    make_target_details,
    mcmc_sample,
    run_re_sampler,
    run_smc_sampler,
)
from sde_sampler_lrds_tpu.eval.ks import compute_sliced_ks
from sde_sampler_lrds_tpu.eval.metrics import get_metrics
from sde_sampler_lrds_tpu.eval.mmd import mmd_median
from sde_sampler_lrds_tpu.eval.sinkhorn import Sinkhorn
from sde_sampler_lrds_tpu.solvers.wrappers import (
    TrainableWrapper,
    list_of_dict_2_dict_of_list,
)

VI_SOLVERS = ("pis_orig", "dds_orig", "dis_orig", "cmcd", "vp-ref", "pbm-ref")
BASELINES = ("smc", "re")


def stage(msg: str):
    """Unbuffered stage-progress line (long TPU runs are otherwise silent)."""
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def build_dataset_and_gaussian(key, target, x_init, dataset_size: int,
                               step_size: float = 1e-3):
    """MALA dataset + fitted Gaussian moments with timers (the experiments'
    standard preamble)."""
    t0 = time.time()
    stage(f"building MALA dataset ({dataset_size} samples)")
    dataset = mcmc_sample(key, target, x_init, step_size=step_size,
                          dataset_length=dataset_size)
    t_mcmc = time.time() - t0
    stage(f"dataset done in {t_mcmc:.1f}s")
    t0 = time.time()
    mean = dataset.mean(axis=0)
    var = jnp.cov(dataset.T)
    var_diag = dataset.var(axis=0)
    t_ref = time.time() - t0
    return dataset, mean, var, var_diag, {"mcmc": t_mcmc, "ref": t_ref}


def sigma_from_moments(mean, var_diag, dim: int, terminal_t: float | None = None):
    """σ_opt = sqrt((‖mean‖² + tr var)/d), / sqrt(T) for PIS
    (sample_two_modes_competing.py:115-117)."""
    import math

    sigma = math.sqrt(float(jnp.sum(mean**2) + var_diag.sum()) / dim)
    if terminal_t is not None:
        sigma /= math.sqrt(terminal_t)
    return sigma


def run_vi(key, solver_type, target_details, solver_details, training_details,
           n_sampling_seeds: int = 16, ref_type: str = "default",
           loss_type: str = "lv", integrator_type: str = "em",
           model_type: str = "target_informed_zero_init", time_type: str = "uniform",
           n_steps: int = 100, keep_samples: bool = False,
           progress_file: str | Path | None = None, **make_model_kwargs):
    """Train a VI sampler and evaluate over n_sampling_seeds eval passes.

    ``keep_samples=True`` stores the first eval pass's sample array in the
    returned metrics dict (key ``"samples"``, host numpy) so estimator-side
    analyses can be rerun post hoc without retraining.

    ``progress_file`` appends each eval pass's scalar metrics as one JSON
    line as soon as it completes — insurance against losing a long run to
    a timeout mid-eval (a 2.5 h MNIST run once died exactly there)."""
    model = make_model(solver_type=solver_type, ref_type=ref_type,
                       loss_type=loss_type, integrator_type=integrator_type,
                       model_type=model_type, time_type=time_type,
                       solver_details=solver_details,
                       target_details=target_details,
                       training_details=training_details, n_steps=n_steps,
                       **make_model_kwargs)
    wrapper = TrainableWrapper(model)
    key, k_run = jax.random.split(key)
    stage(f"training {solver_type} sampler "
          f"({training_details.get('train_steps', '?')} steps)")
    t0 = time.time()
    results = wrapper.run(k_run)
    stage(f"train+eval done in {time.time() - t0:.1f}s; "
          f"{n_sampling_seeds - 1} extra eval seeds")
    def record(metrics):
        if progress_file is not None:
            import json

            Path(progress_file).parent.mkdir(parents=True, exist_ok=True)
            with open(progress_file, "a") as f:
                f.write(json.dumps({k: v for k, v in metrics.items()
                                    if isinstance(v, (int, float))}) + "\n")

    record(results.metrics)
    all_metrics = [results.metrics]
    for s in range(n_sampling_seeds - 1):
        key, k_eval = jax.random.split(key)
        res = wrapper.evaluate(k_eval)
        record(res.metrics)
        all_metrics.append(res.metrics)
    out = list_of_dict_2_dict_of_list(all_metrics)
    if keep_samples and getattr(results, "samples", None) is not None:
        out["samples"] = np.asarray(results.samples)
    # record the exact sinkhorn semantics used, so dumped metrics are only
    # compared to reference-pipeline numbers when reference_comparable
    # (eval/sinkhorn.py Sinkhorn.config; VERDICT r1 #9)
    sk = getattr(model, "sample_losses", {}).get("sinkhorn")
    if sk is not None:
        out["sinkhorn_config"] = sk.config
    return model, out


def run_sampling_baseline(key, kind, target, mean, var, eval_batch_size: int,
                          n_sampling_seeds: int = 16, smc_kwargs=None, re_kwargs=None):
    """SMC / RE tempering-path baselines with chunked sample metrics
    (sample_two_modes_competing.py:148-209)."""
    sinkhorn = Sinkhorn()
    smc_kwargs = {**{"n_steps": 128, "step_size": 1e-4, "n_particles": 1024,
                     "n_mcmc_steps": 32, "n_warmup_mcmc_steps": 1024},
                  **(smc_kwargs or {})}
    re_kwargs = {**{"n_steps": 128, "step_size": 1e-4, "batch_size": 1024,
                    "swap_frequency": 8, "n_mcmc_steps": 32,
                    "n_warmup_mcmc_steps": 4096}, **(re_kwargs or {})}
    # each run yields n_mcmc_steps pooled slots of the whole population at
    # the target level (sample_two_modes_competing.py:152-153, 183-184)
    if kind == "smc":
        per_run = smc_kwargs["n_particles"] * smc_kwargs["n_mcmc_steps"]
    else:
        per_run = re_kwargs["batch_size"] * re_kwargs["n_mcmc_steps"]
    n_runs = max(int((eval_batch_size * n_sampling_seeds) / per_run), 1)
    all_metrics, sampling_time = [], 0.0
    collected = []
    for r in range(n_runs):
        key, k_run, k_gt = jax.random.split(key, 3)
        t0 = time.time()
        if kind == "smc":
            samples = run_smc_sampler(k_run, mean, var,
                                      target_log_prob=target.unnorm_log_prob,
                                      target_score=target.score, **smc_kwargs)
        else:
            samples = run_re_sampler(k_run, mean, var,
                                     target_log_prob=target.unnorm_log_prob,
                                     target_score=target.score, **re_kwargs)
        sampling_time += time.time() - t0
        collected.append(samples.reshape(-1, target.dim))
        pooled = jnp.concatenate(collected, axis=0)
        while pooled.shape[0] >= eval_batch_size:
            chunk, pooled = pooled[:eval_batch_size], pooled[eval_batch_size:]
            # fresh ground-truth draw per chunk — reusing k_gt across the
            # chunks of one run would correlate the per-seed metric noise
            k_gt, k_draw = jax.random.split(k_gt)
            gt = target.sample(k_draw, (chunk.shape[0],))
            metrics = get_metrics(target, chunk, marginal_dims=[0, 1])
            metrics["error/sinkhorn"] = float(sinkhorn(gt, chunk))
            metrics["error/mmd"] = float(mmd_median(gt, chunk))
            metrics["error/ks"] = float(compute_sliced_ks(gt, chunk))
            all_metrics.append(metrics)
        collected = [pooled] if pooled.shape[0] else []
    out = list_of_dict_2_dict_of_list(all_metrics) if all_metrics else {}
    out["eval/sample_time"] = sampling_time / max(n_sampling_seeds, 1)
    out["sinkhorn_config"] = sinkhorn.config
    return out


def dump_results(path: str | Path, filename: str, config: dict, results: list):
    """Pickle {config, results} like every reference driver.

    Written atomically (tmp file + os.replace): the queue scripts run each
    driver under ``timeout``, and a SIGTERM landing mid-pickle.dump must not
    leave a truncated artifact in place of the last good one (ADVICE r4)."""
    import os

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    tmp = path / (filename + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump({"config": clean_config(config), "results": _to_host(results)}, f)
    os.replace(tmp, path / filename)


def clean_config(config: dict) -> dict:
    return {k: v for k, v in config.items() if not callable(v)}


def _to_host(obj):
    if isinstance(obj, dict):
        return {k: _to_host(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_host(v) for v in obj)
    if isinstance(obj, jnp.ndarray):
        return np.asarray(obj)
    return obj


def apply_device(device: str):
    """Force the host backend before the first backend touch.

    ``--device cpu`` escape hatch for tunnel-down hosts: the axon
    sitecustomize pins JAX_PLATFORMS=axon and backend init then hangs when
    the TPU tunnel is dead; only this config update reliably forces CPU
    (same recipe as scripts/main.py). Must run before any jax computation —
    drivers get it via announce(), which they all call right after
    parse_args.
    """
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")


def announce(config: dict):
    apply_device(config.get("device", "default"))
    pprint.pprint({k: v for k, v in config.items() if not callable(v)})


# ---------------------------------------------------------------------------
# generic driver templates
# ---------------------------------------------------------------------------

def add_common_args(parser, dataset_size=40000, train_steps=4096,
                    train_batch=1024, eval_batch=8192):
    parser.add_argument("--results_path", type=str, default="results")
    parser.add_argument("--smc_n_steps", type=int, default=128)
    parser.add_argument("--smc_n_particles", type=int, default=1024)
    parser.add_argument("--smc_n_mcmc_steps", type=int, default=32)
    parser.add_argument("--smc_n_warmup_mcmc_steps", type=int, default=1024)
    parser.add_argument("--re_n_steps", type=int, default=128)
    parser.add_argument("--re_batch_size", type=int, default=1024)
    parser.add_argument("--re_n_mcmc_steps", type=int, default=32)
    parser.add_argument("--re_n_warmup_mcmc_steps", type=int, default=4096)
    parser.add_argument("--re_swap_frequency", type=int, default=8)
    parser.add_argument("--train_steps", type=int, default=train_steps)
    parser.add_argument("--train_batch_size", type=int, default=train_batch)
    parser.add_argument("--eval_batch_size", type=int, default=eval_batch)
    parser.add_argument("--dataset_size", type=int, default=dataset_size)
    parser.add_argument("--terminal_t_pis", type=float, default=5.0)
    parser.add_argument("--n_sampling_seeds", type=int, default=16)
    parser.add_argument("--n_steps", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--device", choices=("default", "cpu"), default="default",
                        help="'cpu' forces the host backend (tunnel-down escape)")
    return parser


def competing_run(args, target, target_details, x_init, filename_stub,
                  extra_params=None, model_type="target_informed_zero_init",
                  mcmc_step_size=1e-3, dis_vp20=False):
    """One (target-config, solver) cell of a *_competing.py driver.

    ``dis_vp20``: run DIS on the vp_20 schedule. ONLY the reference's
    ManyModes competing driver does this (sample_many_modes_competing.py:111);
    every other competing driver leaves DIS on the default vp_10
    (sample_two_modes_competing.py make_model call has no force_vp20).
    Round-4 applied it unconditionally — a protocol deviation on TwoModes."""
    key = jax.random.PRNGKey(args.seed)
    key, k_data, k_vi, k_base = jax.random.split(key, 4)
    dataset, mean, var, var_diag, times = build_dataset_and_gaussian(
        k_data, target, x_init, args.dataset_size, step_size=mcmc_step_size)
    if args.solver_type == "cmcd":
        solver_details = {"mean": mean, "var": var}
    else:
        sigma = sigma_from_moments(
            mean, var_diag, target.dim,
            terminal_t=args.terminal_t_pis if args.solver_type == "pis_orig" else None)
        solver_details = {"sigma": sigma}
        if args.solver_type == "pis_orig":
            # keep the SDE horizon consistent with the sigma/sqrt(T) scaling
            solver_details["terminal_t"] = args.terminal_t_pis
    if args.solver_type in VI_SOLVERS:
        _, all_metrics = run_vi(
            k_vi, args.solver_type, target_details, solver_details,
            {"train_steps": args.train_steps,
             "train_batch_size": args.train_batch_size,
             "eval_batch_size": args.eval_batch_size},
            n_sampling_seeds=args.n_sampling_seeds,
            ref_type="gaussian" if args.solver_type == "cmcd" else "default",
            model_type=model_type,
            n_steps=args.n_steps,
            force_vp20=dis_vp20 and args.solver_type == "dis_orig")
    else:
        all_metrics = run_sampling_baseline(
            k_base, args.solver_type, target, mean, var, args.eval_batch_size,
            n_sampling_seeds=args.n_sampling_seeds,
            smc_kwargs={"n_steps": args.smc_n_steps,
                        "n_particles": args.smc_n_particles,
                        "n_mcmc_steps": args.smc_n_mcmc_steps,
                        "n_warmup_mcmc_steps": args.smc_n_warmup_mcmc_steps,
                        "step_size": 1e-4},
            re_kwargs={"n_steps": args.re_n_steps,
                       "batch_size": args.re_batch_size,
                       "swap_frequency": args.re_swap_frequency,
                       "n_mcmc_steps": args.re_n_mcmc_steps,
                       "n_warmup_mcmc_steps": args.re_n_warmup_mcmc_steps,
                       "step_size": 1e-4})
    return {"metrics": all_metrics, "times": times,
            "params": extra_params or {},
            "gauss_params": {"mean": np.asarray(mean), "var": np.asarray(var)}}


def _progress_file(args):
    """Per-run incremental eval-metrics sidecar under results_path."""
    p = Path(args.results_path) / f"partial_seed{args.seed}.jsonl"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.unlink(missing_ok=True)
    return p


def lrds_run(args, target, target_details, x_init, ref_type, extra_params=None,
             solver_type="vp-ref", integrator_type="ei", time_type="snr",
             model_type="base_zero_init", n_gmm_components=None,
             em_type="diag", net=None, mcmc_step_size=1e-3,
             optim_details=None, prebuilt=None, **model_kwargs):
    """One cell of a *_mcmc_gmm.py / *_ebm_mcmc.py LRDS driver: fit the
    requested reference from the MCMC dataset and train RDS on it.
    ``prebuilt`` takes a ``build_dataset_and_gaussian`` result so sweeps
    over reference hyperparameters reuse one MCMC dataset (the key split
    is unchanged, so the VI stream is identical either way)."""
    key = jax.random.PRNGKey(args.seed)
    key, k_data, k_vi = jax.random.split(key, 3)
    if prebuilt is None:
        prebuilt = build_dataset_and_gaussian(
            k_data, target, x_init, args.dataset_size, step_size=mcmc_step_size)
    dataset, mean, var, var_diag, times = prebuilt
    solver_details = {"sigma": 1.0}
    t0 = time.time()
    if ref_type == "gaussian":
        solver_details.update(mean_ref=mean,
                              var_ref=var if em_type == "full" else var_diag)
    elif ref_type == "gmm":
        w, m, v = fit_gmm(n_gmm_components or 2, dataset, em_type=em_type)
        solver_details.update(weights_ref=w, means_ref=m, variances_ref=v)
    elif ref_type == "nn":
        solver_details.update(net=net)
    times["ref_fit"] = time.time() - t0
    extra_diag = {}
    if hasattr(target, "compute_phi_four_weight_rb"):
        extra_diag["dataset_weight_raw"] = float(
            target.compute_phi_four_weight(jnp.asarray(dataset)))
        extra_diag["dataset_weight_rb"] = float(
            target.compute_phi_four_weight_rb(jnp.asarray(dataset)))
    _, all_metrics = run_vi(
        k_vi, solver_type, target_details, solver_details,
        {"train_steps": args.train_steps,
         "train_batch_size": args.train_batch_size,
         "eval_batch_size": args.eval_batch_size},
        n_sampling_seeds=args.n_sampling_seeds, ref_type=ref_type,
        integrator_type=integrator_type, time_type=time_type,
        model_type=model_type, n_steps=args.n_steps, keep_samples=True,
        progress_file=_progress_file(args),
        **({"optim_details": optim_details} if optim_details else {}),
        **model_kwargs)
    return {"metrics": all_metrics, "times": times, "params": extra_params or {},
            **extra_diag,
            "gauss_params": {"mean": np.asarray(mean), "var": np.asarray(var)}}


def train_ebm_reference(key, dataset, mean, var_diag, n_gmm_components=2,
                        em_type="diag", ebm_type="mle_re", n_levels=32,
                        ebm_epochs=2, ebm_batch_size=64, step_size=1e-2,
                        n_mcmc_steps=8, sde=None, batches_per_call=16,
                        net_layers=4, net_channels=64, t_limit=0.0,
                        lr=3e-4, decay=0.0, perc_keep_mcmc=-1.0,
                        swap_frequency=16, initial_n_warmup_mcmc_steps=64,
                        n_accumulation_steps=1, means_init=None,
                        reg_val=0.0, reweight_loss=False, use_ema=False,
                        use_precond=False, return_trainer=False,
                        target=None, select_best=False, select_size=4096,
                        select_every=None, net_arch="mlp",
                        pretrained_params_path=None):
    """Fit a GMM on the dataset, tilt it with a neural energy, and train the
    EBM by RE-based contrastive MLE (the *_ebm_mcmc.py reference pipeline:
    fit_gmm -> GMMTiltedPotential -> MaximumLikelihoodEBM.train). Returns the
    (score, unnorm_log_prob) callable pair for change_reference_type('nn').

    The extra knobs expose the reference's phi4 protocol
    (sample_phi_four_ebm_mcmc.py:129-173: 6x128 net, t_limit 0.2, 200
    levels, lr 1e-3 + AdamW decay 1e-2, batch 32 with 10-step gradient
    accumulation, perc_keep_mcmc 0.5, initial warmup 4096).

    ``select_best=True`` (needs ``target``) enables forward-ESS checkpoint
    selection: every ``select_every`` steps (default one epoch) the
    reference's forward ESS against the target is scored on ``select_size``
    held-out dataset samples and the best checkpoint is returned instead of
    the final one. This is the variance-control protocol for seed-fragile
    contrastive runs (docs/RESULTS.md, φ⁴): the score peaks between
    under-training (tilt ≈ 0, reference = seeded GMM) and over-training
    (locks onto the dataset's empirical, seed-noisy mode balance)."""
    from sde_sampler_lrds_tpu.models import FourierMLP, GMMTiltedPotential
    from sde_sampler_lrds_tpu.sde import VP
    from sde_sampler_lrds_tpu.targets import Gauss

    dim = dataset.shape[-1]
    sde = sde or VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    w, m, v = fit_gmm(n_gmm_components, dataset, em_type=em_type,
                      means_init=means_init)
    if jnp.ndim(v) == 3:
        # eigendecompose full covariances once: the noised marginals then
        # need no per-sample Cholesky (sde/linear.py _factored_noised_mog),
        # which is ~100x cheaper inside the EBM-MLE MCMC loops
        eig, p = np.linalg.eigh(np.asarray(v))
        v = (jnp.asarray(np.maximum(eig, 1e-8)), jnp.asarray(p))
    if net_arch == "mnist_conv":
        # 14x14-image targets: the conv energy (models/mnist_ebm.MNISTEnergy
        # = MNISTNet features + zero-init scalar head) with the 'sum' tilt;
        # the flat-input 'dot' tilt has no pairing with conv features
        from sde_sampler_lrds_tpu.models import MNISTEnergy

        side = int(round(dim ** 0.5))
        assert side * side == dim, "mnist_conv needs a square image dim"
        base_net, tilt = MNISTEnergy(side=side), "sum"
    else:
        base_net = FourierMLP(dim=dim, num_layers=net_layers,
                              channels=net_channels, zero_init=True)
        tilt = "dot"
    pot = GMMTiltedPotential(
        base_model=base_net,
        sde=sde, weights=w, means=m, variances=v, t_limit=t_limit,
        tilt_type=tilt)
    if pretrained_params_path is not None:
        # reuse a checkpoint saved by mnist_ebm_curve.py: the curve run is
        # key-identical (same seed split, same dataset, same GMM fit), so
        # loading its selected params skips the full EBM budget here
        from flax import serialization

        template = pot.init(jax.random.PRNGKey(0), jnp.zeros((2,)),
                            jnp.zeros((2, dim)))
        params = serialization.from_bytes(
            template, Path(pretrained_params_path).read_bytes())
        stage(f"loaded pretrained EBM params from {pretrained_params_path}")
        score_apply = lambda p, t, x: pot.apply(p, t, x)
        log_prob_apply = lambda p, t, x: pot.apply(p, t, x,
                                                   method="unnorm_log_prob")
        return (score_apply, log_prob_apply, params), {"ebm_train": 0.0}
    prior = Gauss(dim=dim, loc=mean, scale=jnp.sqrt(var_diag))
    sampler = {"mle_re": "replica_exchange", "mle_smc": "smc",
               "mle_cd": "cd"}.get(ebm_type, "replica_exchange")
    trainer = build_ebm("mle", sde, prior, pot, sampler_type=sampler,
                        step_sizes_per_noise=step_size, n_steps=n_levels,
                        perc_keep_mcmc=perc_keep_mcmc,
                        swap_frequency=swap_frequency)
    if use_precond:
        # Precondition the negative-sampling MALA with the per-level noised
        # data covariance s²(t)(Σ_data + σ²(t)I): the heterogeneous scales of
        # e.g. logreg posteriors otherwise force a single scalar step size to
        # the smallest scale (mcmc.py:137 / arXiv:2305.14442). Built in the
        # eigenbasis so the "Cholesky" factor is P·diag(√λ_t) (any square
        # root works for the proposal noise).
        cov = np.cov(np.asarray(dataset).T) + 1e-6 * np.eye(dim)
        eig_c, p_c = np.linalg.eigh(cov)
        t_levels = trainer.times
        s2 = np.asarray(sde.s(t_levels)) ** 2
        sig = np.asarray(sde.sigma_sq(t_levels))
        lam = s2[:, None] * (np.maximum(eig_c, 1e-8)[None] + sig[:, None])
        pm = jnp.asarray(np.einsum("de,le,fe->ldf", p_c, lam, p_c),
                         jnp.float32)
        pchol = jnp.asarray(np.einsum("de,le->lde", p_c, np.sqrt(lam)),
                            jnp.float32)
        trainer.precond_matrix_per_noise = pm
        trainer.precond_matrix_chol_per_noise = pchol
        trainer.use_precond = True
    select_fn = None
    if select_best:
        assert target is not None, "select_best needs the target"
        n_sel = min(select_size, dataset.shape[0])
        # held-out-style fixed slice (the trainer shuffles batches per epoch,
        # so a fixed prefix is as good as a random subset for scoring)
        xs_sel = jnp.asarray(dataset[:n_sel])
        ts_sel = jnp.full((n_sel,), 1e-4)

        from sde_sampler_lrds_tpu.utils.common import normalized_ess

        @jax.jit
        def select_fn(params):
            lw = pot.apply(params, ts_sel, xs_sel, method="unnorm_log_prob") \
                - target.unnorm_log_prob(xs_sel)
            return normalized_ess(lw)

    t0 = time.time()
    stage(f"training EBM reference ({ebm_epochs} epochs, {n_levels} levels, "
          f"batch {ebm_batch_size} x acc {n_accumulation_steps}"
          + (", fwd-ESS selection" if select_best else "") + ")")
    losses, gnorms, diags = trainer.train(
        key, jnp.asarray(dataset), batch_size=ebm_batch_size,
        n_epochs=ebm_epochs, lr=lr, decay=decay,
        initial_n_warmup_mcmc_steps=initial_n_warmup_mcmc_steps,
        n_mcmc_steps=n_mcmc_steps, reg_val=reg_val,
        reweight_loss=reweight_loss, use_ema=use_ema,
        n_accumulation_steps=n_accumulation_steps,
        batches_per_call=batches_per_call,
        select_fn=select_fn, select_every=select_every)
    t_train = time.time() - t0
    stage(f"EBM reference done in {t_train:.1f}s")
    params = trainer.ema_params
    if select_best and trainer.best_params is not None:
        stage(f"selected checkpoint: step {trainer.best_step} "
              f"(fwd ESS {trainer.best_score:.4f})")
        params = trainer.best_params
    # (score_apply, log_prob_apply, params) — the serializable nn-reference
    # form: RDS checkpoints then persist the trained EBM params
    # (solver/oc.py:634-666 parity; see RDS.save_attrs)
    score_apply = lambda p, t, x: pot.apply(p, t, x)
    log_prob_apply = lambda p, t, x: pot.apply(p, t, x, method="unnorm_log_prob")
    extra = {"ebm_train": t_train}
    if select_best and trainer.best_params is not None:
        extra["ebm_select_step"] = trainer.best_step
        extra["ebm_select_fwd_ess"] = trainer.best_score
    if select_best:
        # the full (step, fwd-ESS) trace — the over/under-training curve
        extra["ebm_select_history"] = list(getattr(trainer, "select_history", []))
    if return_trainer:
        extra["trainer"] = trainer
        extra["losses"] = losses
        extra["grad_norms"] = gnorms
    return (score_apply, log_prob_apply, params), extra


def ebm_run(args, target, target_details, x_init, extra_params=None,
            solver_type="vp-ref", integrator_type="ei", time_type="snr",
            n_gmm_components=2, em_type="diag", mcmc_step_size=1e-3,
            ebm_kwargs=None, **model_kwargs):
    """One cell of a *_ebm_mcmc.py driver: NN (tilted-EBM) reference."""
    key = jax.random.PRNGKey(args.seed)
    key, k_data, k_ebm, k_vi = jax.random.split(key, 4)
    dataset, mean, var, var_diag, times = build_dataset_and_gaussian(
        k_data, target, x_init, args.dataset_size, step_size=mcmc_step_size)
    ebm_kwargs = dict(ebm_kwargs or {})
    # seed the GMM EM at the energy minima when the target knows them
    # (reference sample_phi_four_ebm_mcmc.py:109 uses target.x_min); probe
    # only targets that override compute_stats_integration (PhiFour) — the
    # base implementation runs a full Boole quadrature and never sets x_min
    from sde_sampler_lrds_tpu.targets.base import Target as _TargetBase

    if getattr(target, "x_min", None) is None and \
            type(target).compute_stats_integration \
            is not _TargetBase.compute_stats_integration:
        try:
            target.compute_stats_integration()
        except (ValueError, NotImplementedError):
            pass  # targets without a quadrature domain have no known minima
    x_min = getattr(target, "x_min", None)
    if x_min is not None and n_gmm_components % x_min.shape[0] == 0:
        reps = n_gmm_components // x_min.shape[0]
        mi = np.repeat(np.asarray(x_min), reps, axis=0)
        if reps > 1:
            # break the exact duplication: EM preserves symmetry, so
            # identical initial means never separate — jitter the copies
            # by a small data-scaled offset (deterministic in the seed)
            rng = np.random.default_rng(args.seed)
            scale = 0.05 * np.asarray(dataset.std(axis=0))
            mi = mi + rng.normal(size=mi.shape) * scale[None]
        ebm_kwargs.setdefault("means_init", mi)
    ebm_kwargs.setdefault("target", target)  # for select_best fwd-ESS scoring
    net, ebm_times = train_ebm_reference(
        k_ebm, dataset, mean, var_diag, n_gmm_components=n_gmm_components,
        em_type=em_type, **ebm_kwargs)
    ebm_times.pop("trainer", None)
    times.update({k: v for k, v in ebm_times.items()
                  if isinstance(v, (int, float))})
    # forward ESS of the learned reference on dataset samples — the
    # reference-quality diagnostic of sample_phi_four_ebm_mcmc.py:212-230
    _score_apply, _lp_apply, _net_params = net
    net_log_prob = lambda t, x: _lp_apply(_net_params, t, x)
    n_diag = min(8192, dataset.shape[0])
    xs_d = dataset[:n_diag]
    from sde_sampler_lrds_tpu.utils.common import normalized_ess

    lw = net_log_prob(jnp.full((n_diag,), 1e-4), xs_d) \
        - target.unnorm_log_prob(xs_d)
    fwd_ess = float(normalized_ess(lw))
    stage(f"EBM reference forward ESS on data: {fwd_ess:.4f}")
    # dataset-side weight diagnostics: the raw estimator reports the
    # dataset's (seed-noisy) balance; the RB estimator on the same samples
    # checks the estimator itself independently of the VI sampler
    extra_diag = {}
    if hasattr(target, "compute_phi_four_weight"):
        extra_diag["dataset_weight_raw"] = float(
            target.compute_phi_four_weight(jnp.asarray(dataset)))
    if hasattr(target, "compute_phi_four_weight_rb"):
        extra_diag["dataset_weight_rb"] = float(
            target.compute_phi_four_weight_rb(jnp.asarray(dataset)))
        stage(f"dataset weight: raw {extra_diag['dataset_weight_raw']:.3f} "
              f"rb {extra_diag['dataset_weight_rb']:.3f}")
    _, all_metrics = run_vi(
        k_vi, solver_type, target_details, {"sigma": 1.0, "net": net},
        {"train_steps": args.train_steps,
         "train_batch_size": args.train_batch_size,
         "eval_batch_size": args.eval_batch_size},
        n_sampling_seeds=args.n_sampling_seeds, ref_type="nn",
        integrator_type=integrator_type, time_type=time_type,
        model_type="base_zero_init", n_steps=args.n_steps,
        keep_samples=True, progress_file=_progress_file(args),
        **model_kwargs)
    return {"metrics": all_metrics, "times": times, "params": extra_params or {},
            "forward_ess_ebm": fwd_ess, **extra_diag,
            "gauss_params": {"mean": np.asarray(mean), "var": np.asarray(var)}}
