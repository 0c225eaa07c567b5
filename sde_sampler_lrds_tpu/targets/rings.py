"""2-D concentric-rings target: GMM over radii × uniform angle, in Cartesian
coordinates via a polar change of variables.

Re-design of sde_sampler/distr/rings.py:36-183 with the analytic score from
rings.py:100-109: score(x) = x * (score_r(|x|)/|x| - 1/|x|²).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .base import Target
from .gauss import score_mog, log_prob_gaussian


class Rings(Target):
    def __init__(self, dim: int = 2, lower_rad: float = 1.0, upper_rad: float = 5.0,
                 num_rad: int = 3, scale: float = 0.1, equilibrated: bool = False,
                 n_reference_samples: int = int(1e6), domain_tol: float = 5.0, **kwargs):
        if dim != 2:
            raise ValueError("The rings should be two-dimensional.")
        super().__init__(dim=2, log_norm_const=0.0,
                         n_reference_samples=n_reference_samples, **kwargs)
        self.n_mixtures = num_rad
        self.radiuses = jnp.linspace(lower_rad, upper_rad, num_rad)
        self.scale = scale
        if equilibrated:
            weights = jnp.ones((num_rad,))
        else:
            weights = self.radiuses / self.radiuses.sum()
        self.mixture_weights = weights
        self._probs = weights / weights.sum()
        if self.domain is None:
            r = upper_rad + domain_tol * scale
            self.set_domain(jnp.asarray([[-r, r], [-r, r]]))

    # -- radius mixture ----------------------------------------------------
    def _radius_log_prob(self, r: jnp.ndarray) -> jnp.ndarray:
        lp = log_prob_gaussian(
            r.reshape(-1, 1), self.radiuses[:, None], jnp.full((self.n_mixtures, 1), self.scale**2)
        )
        out = jax.scipy.special.logsumexp(jnp.log(self._probs)[None] + lp, axis=-1)
        return out.reshape(r.shape)

    def score_radius(self, r: jnp.ndarray) -> jnp.ndarray:
        return score_mog(
            r, self.mixture_weights, self.radiuses[:, None],
            jnp.full((self.n_mixtures, 1), self.scale**2),
        )

    # -- density -----------------------------------------------------------
    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        r = jnp.linalg.norm(x, axis=-1)
        # radius log-prob + uniform angle log-prob - log|J| (J = r)
        return self._radius_log_prob(r) - math.log(2 * math.pi) - jnp.log(r)

    def score(self, x: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
        norm_x = jnp.linalg.norm(x, axis=-1, keepdims=True) + eps
        return x * (self.score_radius(norm_x) / norm_x - 1.0 / norm_x**2)

    def sample(self, key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
        kcat, knorm, kang = jax.random.split(key, 3)
        idx = jax.random.categorical(kcat, jnp.log(self._probs), shape=shape)
        r = self.radiuses[idx] + self.scale * jax.random.normal(knorm, shape)
        theta = jax.random.uniform(kang, shape, maxval=2 * math.pi)
        return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)

    def sample_init_points(self, key: jax.Array, n_points_per_mode: int) -> jnp.ndarray:
        """Samples on every ring (used to seed mode-aware MCMC, rings.py:87)."""
        knorm, kang = jax.random.split(key)
        r = self.radiuses[None, :] + self.scale * jax.random.normal(
            knorm, (n_points_per_mode, self.n_mixtures))
        r = r.reshape(-1)
        theta = jax.random.uniform(kang, r.shape, maxval=2 * math.pi)
        return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)

    # -- mode metrics (rings.py:115-158) -----------------------------------
    def has_entropy(self) -> bool:
        return True

    def compute_mode_count(self, samples: jnp.ndarray) -> jnp.ndarray:
        r_sq = jnp.sum(samples**2, axis=-1)
        dist = jnp.abs(r_sq[:, None] - self.radiuses[None] ** 2)
        idx = jnp.argmin(dist, axis=-1)
        return jnp.bincount(idx, length=self.n_mixtures).astype(jnp.float32)

    def entropy(self, samples, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = counts / counts.sum()
        # 0*log0 = 0 for empty modes (see targets/gauss.py entropy)
        return -jnp.sum(jax.scipy.special.xlogy(hist, hist)) / math.log(
            self.n_mixtures)

    def kl_weights(self, samples, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = counts / counts.sum()
        return jnp.sum(self._probs * jnp.log(self._probs / hist))

    def tv_weights(self, samples, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = counts / counts.sum()
        return jnp.sum(jnp.abs(hist - self._probs))

    def compute_forgotten_modes(self, samples, tol=0.05, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = counts / counts.sum()
        return jnp.sum(hist < tol * self._probs.min()) / self.n_mixtures

    def compute_stats_sampling(self, key, return_samples: bool = False):
        samples = super().compute_stats_sampling(key, return_samples=True)
        counts = self.compute_mode_count(samples)
        self.expectations["emc"] = float(self.entropy(samples, counts=counts))
        self.expectations["kl_weights"] = float(self.kl_weights(samples, counts=counts))
        self.expectations["tv_weights"] = float(self.tv_weights(samples, counts=counts))
        self.expectations["num_forgotten_modes"] = float(
            self.compute_forgotten_modes(samples, counts=counts))
        if return_samples:
            return samples
