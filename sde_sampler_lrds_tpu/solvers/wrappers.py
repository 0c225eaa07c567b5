"""Trainable wrappers: manual benchmark train loops with EUBO-augmented eval.

Re-design of sde_sampler/additions/hacking.py:14-125. evaluate_eubo runs the
loss's reverse (noising) pass on TRUE target samples, yielding the EUBO upper
bound, a forward log-Z bound, and a forward ESS (arXiv:2406.07423); the
wrappers drive the experiment scripts' training + evaluation protocol.
"""
from __future__ import annotations

import logging
import math
import time

import jax
import jax.numpy as jnp

from ..utils.common import Results


def list_of_dict_2_dict_of_list(l):
    return {k: [x[k] for x in l if k in x] for k in l[0].keys()}


def evaluate_eubo(trainable, results: Results, compute_eubo_last_arg, key,
                  use_ema: bool = True) -> Results:
    """EUBO metrics from the reverse pass on target samples (hacking.py:14)."""
    k_sample, k_sim = jax.random.split(key)
    x_target = trainable.target.sample(k_sample, (trainable.cfg.eval_batch_size,))
    params = trainable.state.ema_params if (use_ema and trainable.cfg.use_ema) \
        else trainable.state.params
    args = dict(trainable.loss_call_args())
    # compute_eubo takes the same terminal arg plus the reverse-pass base arg
    last_key = "reference_log_prob" if "reference_log_prob" in args else "initial_log_prob"
    args[last_key] = compute_eubo_last_arg
    rnd_target = trainable.loss.compute_eubo(
        k_sim, trainable.eval_ts, x_target, trainable.ctrl_fn(params), **args)
    neg = -rnd_target
    # rnd = log(Q/P_bar) along noising paths from target samples, so the
    # forward (reverse-IS) log-Z estimate uses E_P[exp(+rnd)] = 1/Z:
    # log Z_f = -(logsumexp(+rnd) - log N) — the reference's
    # `-rnd_target.logsumexp(0) + log N` (hacking.py:28); an earlier
    # revision here logsumexp'd -rnd, flipping the estimate's sign
    # whenever log Z != 0
    results.metrics["eval/log_norm_const_is_f"] = float(
        -jax.scipy.special.logsumexp(rnd_target) + math.log(neg.shape[0]))
    results.metrics["eval/eubo"] = float(neg.mean())
    # forward-ESS weights w ∝ exp(+rnd) = Q/P_bar on P-samples (same
    # convention as the EBM telemetry's forward ESS, experiments/common.py;
    # the reference uses softmax(-rnd) here, hacking.py:26 — inverted
    # weights for its own estimator; defect not replicated)
    weights = jax.nn.softmax(rnd_target)
    ess = float(1.0 / jnp.sum(weights**2))
    results.metrics["eval/effective_sample_size_f"] = ess
    results.metrics["eval/norm_effective_sample_size_f"] = ess / neg.shape[0]
    return results


class TrainableWrapper:
    """Manual train loop + EUBO-augmented final evaluation (hacking.py:36)."""

    def __init__(self, trainable, verbose: bool = False):
        self.trainable = trainable
        self.verbose = verbose

    @property
    def eubo_available(self) -> bool:
        return (getattr(self.trainable.loss, "compute_eubo", None) is not None
                and getattr(self.trainable, "eubo_available", True))

    def compute_results_eubo(self, results: Results, key, use_ema: bool = True) -> Results:
        t = self.trainable
        try:
            t.target.sample(jax.random.PRNGKey(0), (1,))
        except NotImplementedError:
            return results
        if not self.eubo_available:
            return results
        # The EUBO pass is supplementary telemetry; a resource failure here
        # (e.g. HBM exhaustion evaluating an expensive 'nn' reference over
        # the noising trajectory) must not discard the trained run's primary
        # results — a 196-d MNIST run is ~1h of TPU time.
        try:
            if hasattr(t, "reference_log_prob"):
                return evaluate_eubo(t, results, t.reference_log_prob, key,
                                     use_ema=use_ema)
            return evaluate_eubo(t, results, t.prior.log_prob, key,
                                 use_ema=use_ema)
        except Exception as e:  # pragma: no cover - backend resource gate
            logging.warning("EUBO evaluation failed (%r); primary results "
                            "kept, eval/*_f metrics skipped", e)
            results.metrics["eval/eubo_error"] = repr(e)[:200]
            return results

    def run(self, key=None, keep_training_metrics: bool = False):
        t = self.trainable
        if t.state is None:
            t.setup()
        key = key if key is not None else jax.random.PRNGKey(t.cfg.seed + 1)
        training_metrics = []
        start = time.time()
        start_step = int(t.state.step)
        spc = max(t.cfg.steps_per_call, 1)
        # resume: apply milestones already passed before the first chunk
        # (mirrors Trainable.run)
        if t._advance_param_schedule(start_step):
            t._on_scheduled_params_changed()
        for i in range(start_step + spc - 1, t.cfg.train_steps, spc):
            key, sub = jax.random.split(key)
            metrics = t.step(sub)
            # the reference schedules inside Trainable.step, so its manual
            # wrapper loop still decays hyperparameters — mirror that here
            if t._advance_param_schedule(i + 1):
                t._on_scheduled_params_changed()
            if keep_training_metrics:
                training_metrics.append({k: float(v) for k, v in metrics.items()})
        training_time = time.time() - start
        key, k_eval, k_eubo = jax.random.split(key, 3)
        results = self.evaluate(k_eval, k_eubo)
        results.metrics["eval/training_time"] = training_time
        if keep_training_metrics:
            return results, list_of_dict_2_dict_of_list(training_metrics)
        return results

    def evaluate(self, key, k_eubo=None, use_ema: bool = True) -> Results:
        t = self.trainable
        results = t.evaluate(key, use_ema=use_ema)
        results.metrics.update(t.metrics_from_results(results, key))
        if k_eubo is None:
            k_eubo = jax.random.fold_in(key, 99)
        return self.compute_results_eubo(results, k_eubo, use_ema=use_ema)


class TrainableWrapperWithIntermediates(TrainableWrapper):
    """Periodic eval snapshots during training, optionally multi-seed
    (hacking.py:94)."""

    def run(self, key=None, results_freq: int = 16, n_seeds: int = 1,
            bonus_metrics=None):
        t = self.trainable
        if t.state is None:
            t.setup()
        key = key if key is not None else jax.random.PRNGKey(t.cfg.seed + 1)
        inter_train, inter_eval = [], []
        start = time.time()
        spc = max(t.cfg.steps_per_call, 1)
        if t._advance_param_schedule(int(t.state.step)):
            t._on_scheduled_params_changed()
        for i in range(int(t.state.step) + spc - 1, t.cfg.train_steps, spc):
            key, sub = jax.random.split(key)
            metrics = t.step(sub)
            if t._advance_param_schedule(i + 1):
                t._on_scheduled_params_changed()
            inter_train.append({k: float(v) for k, v in metrics.items()})
            if (i + 1) % results_freq == 0:
                all_results = []
                for s in range(n_seeds):
                    key, k_eval, k_eubo = jax.random.split(key, 3)
                    results = self.evaluate(k_eval, k_eubo)
                    if bonus_metrics:
                        for metric_name, metric in bonus_metrics:
                            results.metrics["eval/" + metric_name] = float(
                                metric(results.samples))
                    all_results.append(dict(results.metrics))
                inter_eval.append(list_of_dict_2_dict_of_list(all_results))
        training_time = time.time() - start
        key, k_eval, k_eubo = jax.random.split(key, 3)
        results = self.evaluate(k_eval, k_eubo)
        results.metrics["eval/training_time"] = training_time
        return (results, list_of_dict_2_dict_of_list(inter_train),
                list_of_dict_2_dict_of_list(inter_eval) if inter_eval else {})
