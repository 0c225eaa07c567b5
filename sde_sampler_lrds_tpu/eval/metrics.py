"""Evaluation metrics: expectation errors, log-Z errors, ESS, mode coverage.

Re-design of sde_sampler/eval/metrics.py:25-198. Metric names and namespaces
(eval/*, error/*, rel_error/*) match the reference so downstream tooling and
logged artifacts stay comparable. All tensor reductions are jnp; the final
dict is host-side floats.
"""
from __future__ import annotations

import logging
from numbers import Number
from typing import Callable

import jax.numpy as jnp

from ..targets.base import EXPECTATION_FNS, Target


def abs_and_rel_error(prediction: float, target: float, suffix: str = "",
                      eps: float = 1e-8) -> dict[str, float]:
    magnitude = abs(target) + eps
    error = abs(prediction - target)
    return {f"error{suffix}": error, f"rel_error{suffix}": error / magnitude}


def compute_errors(prediction, target=None, name: str = "error",
                   weights=None, eps: float = 1e-8) -> dict[str, float]:
    """Per-metric mean + IS-weighted mean, abs and relative errors
    (eval/metrics.py:25)."""
    output = {}
    if isinstance(prediction, Number):
        output[f"eval/{name}"] = float(prediction)
    else:
        prediction = jnp.asarray(prediction)
        if prediction.ndim == 0:
            output[f"eval/{name}"] = float(prediction)
        else:
            pred = prediction.reshape(-1)
            output[f"eval/{name}"] = float(pred.mean())
            if weights is not None:
                w = jnp.asarray(weights).reshape(-1)
                output[f"eval/{name}_is"] = float((pred * w).sum() / w.sum())
    if target is not None:
        target = float(target)
        for key_name, pred in list(output.items()):
            suffix = key_name.replace("eval", "")
            output.update(abs_and_rel_error(pred, target, suffix=suffix, eps=eps))
    return output


def frac_inside_domain(samples: jnp.ndarray, domain: jnp.ndarray) -> float:
    inside = (domain[:, 0] <= samples) & (samples <= domain[:, 1])
    return float(inside.all(axis=-1).mean())


def get_metrics(
    distr: Target,
    samples: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    log_norm_const_preds: dict | None = None,
    expectation_preds: dict | None = None,
    marginal_dims: list[int] | None = None,
    sample_losses: dict[str, Callable] | None = None,
    sample_key=None,
) -> dict[str, float]:
    """Full metric sweep over generated samples (eval/metrics.py:70)."""
    marginal_dims = [d for d in (marginal_dims or []) if d < distr.dim]
    expectation_preds = expectation_preds or {}
    log_norm_const_preds = log_norm_const_preds or {}
    metrics: dict[str, float] = {}

    fns: dict[str, Callable] = {
        name: (lambda s, fn=fn: fn(s).reshape(-1, 1)) for name, fn in EXPECTATION_FNS.items()
    }
    if hasattr(distr, "compute_mode_weight"):
        fns["mode_weight"] = lambda s: float(distr.compute_mode_weight(s))
    if hasattr(distr, "compute_phi_four_weight"):
        fns["weight"] = lambda s: float(distr.compute_phi_four_weight(s))
    if hasattr(distr, "compute_phi_four_weight_rb"):
        fns["weight_rb"] = lambda s: float(distr.compute_phi_four_weight_rb(s))
    if distr.has_entropy():
        fns["emc"] = lambda s: float(distr.entropy(s))
        fns["kl_weights"] = lambda s: float(distr.kl_weights(s))
        fns["tv_weights"] = lambda s: float(distr.tv_weights(s))
        fns["num_forgotten_modes"] = lambda s: float(distr.compute_forgotten_modes(s))
    if hasattr(distr, "compute_predictive_log_prob"):
        fns["avg_predictive_log_prob"] = lambda s: float(distr.compute_predictive_log_prob(s))

    w_col = None if weights is None else jnp.reshape(weights, (-1, 1))
    for name, fn in fns.items():
        target_val = distr.expectations.get(name)
        metrics.update(compute_errors(fn(samples), target=target_val, name=name,
                                      weights=w_col))
        if name in expectation_preds:
            metrics.update(compute_errors(expectation_preds[name], target=target_val,
                                          name=name + "_direct", weights=w_col))

    for name, pred in log_norm_const_preds.items():
        metrics.update(compute_errors(pred, target=distr.log_norm_const, name=name))

    if weights is not None:
        w = jnp.reshape(weights, (-1,))
        ess = float(w.sum() ** 2 / (w**2).sum())
        metrics["eval/effective_sample_size"] = ess
        metrics["eval/norm_effective_sample_size"] = ess / w.shape[0]

    stddevs = samples.std(axis=0)
    means = samples.mean(axis=0)
    metrics["eval/avg_stddev"] = float(stddevs.mean())
    for dim in marginal_dims:
        metrics[f"eval/stddev_{dim}"] = float(stddevs[dim])
        metrics[f"eval/avg_{dim}"] = float(means[dim])
    if distr.stddevs is not None:
        metrics["error/avg_marginal_stddev"] = float(jnp.abs(stddevs - distr.stddevs).mean())
        metrics.update(compute_errors(float(stddevs.mean()),
                                      target=float(distr.stddevs.mean()), name="avg_stddev"))

    if distr.domain is not None:
        metrics["eval/frac_pred_in_domain"] = frac_inside_domain(samples, distr.domain)

    if sample_losses:
        try:
            import jax

            key = sample_key if sample_key is not None else jax.random.PRNGKey(1234)
            gt = distr.sample(key, (samples.shape[0],))
            if distr.domain is not None:
                metrics["eval/frac_groundtruth_in_domain"] = frac_inside_domain(gt, distr.domain)
            for name, loss in sample_losses.items():
                metrics["error/" + name] = float(loss(samples, gt))
        except NotImplementedError:
            logging.warning("Sampling not implemented for %s.", type(distr).__name__)

    if hasattr(distr, "objective"):
        metrics["eval/obj_avg"] = float(distr.objective(samples.mean(axis=0, keepdims=True)))
        metrics["eval/avg_obj"] = float(distr.objective(samples).mean())
        metrics["eval/min_obj"] = float(distr.objective(samples).min())
    return metrics
