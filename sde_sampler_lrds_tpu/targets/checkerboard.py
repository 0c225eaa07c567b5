"""2-D checkerboard target: a mixture of uniform squares with zero score.

Re-design of sde_sampler/distr/checkerboard.py:6-162. The board spans
x ∈ [-4, -4 + 2*width], y ∈ [-4, 4]; with ``unequilibrated`` the black squares
on even positions get 3× weight (checkerboard.py:41).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .base import Target


class Checkerboard(Target):
    def __init__(self, dim: int = 2, width: int = 4, unequilibrated: bool = True,
                 n_reference_samples: int = int(1e5), **kwargs):
        if dim != 2:
            raise ValueError("The checkerboard should be two-dimensional.")
        super().__init__(dim=2, log_norm_const=0.0,
                         n_reference_samples=n_reference_samples, **kwargs)
        self.width = width
        x_min, y_max = self._extremal_points()
        x_max = x_min + 2
        y_min = y_max - 2
        self.n_mixtures = x_min.shape[0]
        self.low = jnp.stack([x_min, y_min], axis=-1)       # (K, 2)
        self.high = jnp.stack([x_max, y_max], axis=-1)      # (K, 2)
        self.loc = 0.5 * (self.low + self.high)
        weights = np.ones(self.n_mixtures)
        if unequilibrated:
            weights[np.arange(self.n_mixtures) % 2 == 0] *= 3
        self.mixture_weights = jnp.asarray(weights, jnp.float32)
        self._probs = self.mixture_weights / self.mixture_weights.sum()
        if self.domain is None:
            self.set_domain(jnp.asarray([[-4.0, -4.0 + 2 * self.width], [-4.0, 4.0]]))

    def _extremal_points(self):
        x_pos, y_pos = [], []
        for y in (4, 0):
            xs = list(range(-2, -4 + 2 * self.width, 4))
            x_pos += xs
            y_pos += [y] * len(xs)
            xs = list(range(-4, -4 + 2 * self.width, 4))
            x_pos += xs
            y_pos += [y - 2] * len(xs)
        return jnp.asarray(x_pos, jnp.float32), jnp.asarray(y_pos, jnp.float32)

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        flat = x.reshape(-1, 2)
        inside = jnp.all(
            (flat[:, None, :] >= self.low[None]) & (flat[:, None, :] <= self.high[None]),
            axis=-1,
        )  # (B, K); squares have area 4 -> component density 1/4
        dens = jnp.sum(self._probs[None, :] * inside / 4.0, axis=-1)
        # off-board mass is exactly zero -> -inf, like the reference's
        # MixtureSameFamily log_prob (checkerboard.py:84). The -inf is
        # deliberate and filterable: an off-board terminal sample makes
        # rnd = +inf, which trips the isfinite leg of the max_rnd filter
        # (losses/base.py compute_results / BaseOCLoss training mask) —
        # the round-4 -1e8 sentinel instead produced rnd ~ 1e8 that passed
        # rnd < max_rnd=1e8 just under the wire, so the filtered metrics
        # this target needs never engaged. score() is an explicit zeros
        # override, so no gradient ever differentiates through this.
        lp = jnp.where(dens > 0, jnp.log(jnp.maximum(dens, 1e-38)), -jnp.inf)
        return lp.reshape(x.shape[:-1])

    def score(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros_like(x)

    def sample(self, key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
        kcat, kuni = jax.random.split(key)
        idx = jax.random.categorical(kcat, jnp.log(self._probs), shape=shape)
        u = jax.random.uniform(kuni, (*shape, 2))
        return self.low[idx] + u * (self.high[idx] - self.low[idx])

    # -- mode metrics via 2-D histogram (checkerboard.py:97-139) -----------
    def has_entropy(self) -> bool:
        return True

    def compute_mode_count(self, samples: jnp.ndarray) -> np.ndarray:
        """Per-square sample counts in the same order `_extremal_points`
        enumerates the squares (= the order of `_probs`). Counting each
        square's box directly keeps the alignment for every width — the
        earlier (4, width) histogram + parity mask flattened bottom-row
        first and mis-paired squares with `_probs` for width ≡ 2 (mod 4)."""
        s = np.asarray(samples)[:, None, :]
        inside = np.all((s >= np.asarray(self.low)[None])
                        & (s <= np.asarray(self.high)[None]), axis=-1)
        return inside.sum(axis=0).astype(np.float64)

    def _board_hist(self, counts):
        # normalized over on-board mass (the reference divides by all
        # in-domain samples, checkerboard.py:106 — identical for on-board
        # samplers; off-board terminal samples already zero the IS metrics)
        return counts / counts.sum()

    def entropy(self, samples, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = self._board_hist(counts)
        # the log(4) normalizer replicates the reference's
        # log(counts.shape[0]) with its (4, width) histogram
        # (checkerboard.py:108); 0*log0 = 0 for empty squares
        from scipy.special import xlogy

        return -np.sum(xlogy(hist, hist)) / math.log(4.0)

    def kl_weights(self, samples, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = self._board_hist(counts)
        p = np.asarray(self._probs)
        return np.sum(p * np.log(p / hist))

    def tv_weights(self, samples, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = self._board_hist(counts)
        return np.sum(np.abs(hist - np.asarray(self._probs)))

    def compute_forgotten_modes(self, samples, tol: float = 0.05, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = self._board_hist(counts)
        p = np.asarray(self._probs)
        return np.sum(hist < tol * p.min()) / self.n_mixtures

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
