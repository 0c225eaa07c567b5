"""Bayesian logistic-regression posterior over four UCI datasets.

Re-design of sde_sampler/distr/logistic_regression.py:11-107. The posterior is
p(θ|X,y) ∝ N(w; 0, s_w²I) N(b; μ_b, s_b²) Π σ(Xw+b)^y (1-σ)^{1-y} with an
analytic score. Data lives in data/{cancer,credit,ionosphere,sonar}.npz.
"""
from __future__ import annotations

import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .base import Target

DATA_DIR = Path(__file__).parents[2] / "data"


class LogisticRegression(Target):
    def __init__(self, dim: int | None = None, data_type: str = "ionosphere",
                 use_intercept: bool = True, intercept_mean: float = 0.0,
                 intercept_scale: float = 2.5, weight_scale: float = 1.0,
                 threshold: float = 1e-8, **kwargs):
        data = np.load(DATA_DIR / f"{data_type}.npz")
        self.X_train = jnp.asarray(data["X_train"], jnp.float32)
        self.y_train = jnp.asarray(data["y_train"], jnp.float32).flatten()
        self.X_test = jnp.asarray(data["X_test"], jnp.float32)
        self.y_test = jnp.asarray(data["y_test"], jnp.float32).flatten()
        dim_weights = self.X_train.shape[-1]
        kwargs.setdefault("domain", 5.0)
        super().__init__(dim=dim_weights + int(use_intercept), **kwargs)
        self.threshold = threshold
        self.use_intercept = use_intercept
        self.weight_scale = weight_scale
        self.intercept_mean = intercept_mean
        self.intercept_scale = intercept_scale

    def _split(self, params: jnp.ndarray):
        params = params.reshape(-1, params.shape[-1])
        if self.use_intercept:
            return params[..., :-1], params[..., -1]
        return params, jnp.zeros(params.shape[:-1])

    def posterior_log_prob(self, params, X, y) -> jnp.ndarray:
        weights, intercept = self._split(params)
        dw = weights.shape[-1]
        prior = -0.5 * jnp.sum(weights**2, axis=-1) / self.weight_scale**2
        prior -= 0.5 * dw * math.log(2 * math.pi * self.weight_scale**2)
        if self.use_intercept:
            prior += -0.5 * (intercept - self.intercept_mean) ** 2 / self.intercept_scale**2
            prior -= 0.5 * math.log(2 * math.pi * self.intercept_scale**2)
        logits = weights @ X.T + intercept[:, None]  # (B, N)
        # The reference clips probabilities to [threshold, 1-threshold]
        # (logistic_regression.py:56); in float32 1-1e-8 rounds to exactly 1.0,
        # so clipping in probability space yields 0*log(0)=NaN for confident
        # logits (|z| > ~17). Equivalent stable form: floor the LOG terms at
        # log(threshold) and use log-sigmoid, which never over/underflows.
        log_thr = math.log(self.threshold)
        log_p = jnp.maximum(jax.nn.log_sigmoid(logits), log_thr)
        log_1mp = jnp.maximum(jax.nn.log_sigmoid(-logits), log_thr)
        ll = jnp.sum(y[None] * log_p + (1 - y[None]) * log_1mp, axis=-1)
        return ll + prior

    def posterior_score(self, params, X, y) -> jnp.ndarray:
        weights, intercept = self._split(params)
        prior_w = -weights / self.weight_scale**2
        probs = jnp.clip(jax.nn.sigmoid(weights @ X.T + intercept[:, None]),
                         self.threshold, 1.0 - self.threshold)
        resid = y[None] - probs  # (B, N)
        score_w = prior_w + resid @ X
        if self.use_intercept:
            prior_b = -(intercept - self.intercept_mean) / self.intercept_scale**2
            score_b = prior_b + resid.sum(axis=-1)
            return jnp.concatenate([score_w, score_b[:, None]], axis=-1)
        return score_w

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        lp = self.posterior_log_prob(jnp.atleast_2d(x), self.X_train, self.y_train)
        return lp.reshape(x.shape[:-1])

    def score(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.posterior_score(x, self.X_train, self.y_train)

    def compute_predictive_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """Mean test-set posterior log-density (logistic_regression.py:94)."""
        return self.posterior_log_prob(x, self.X_test, self.y_test).mean()
