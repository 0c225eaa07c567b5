"""Gaussian / Gaussian-mixture targets with closed-form log-probs and scores.

TPU re-design of sde_sampler/distr/gauss.py (log_prob_gaussian:67,
score_mog:97, GMM:138, TwoModes:422, ManyModes:569, Gauss:597, GaussFull:632,
IsotropicGauss:720, gmm_params:14). All densities are pure jnp; mixture scores
are computed in log-space with softmax responsibilities; sampling uses
explicit PRNG keys. These closed forms are reused by the SDE layer for noised
marginals of Gaussian/GMM references.
"""
from __future__ import annotations

import math
from numbers import Number

import jax
import jax.numpy as jnp
import numpy as np

from .base import Target

_LOG_2PI = math.log(2.0 * math.pi)


def gmm_params(name: str = "heart", dim: int = 2):
    """Preset MoG parameters ('heart', 'dist', 'fab', 'multi', 'grid', 'circle')."""
    if name == "heart":
        loc = 1.5 * np.array(
            [[-0.5, -0.25], [0.0, -1.0], [0.5, -0.25], [-1.0, 0.5],
             [-0.5, 1.0], [0.0, 0.5], [0.5, 1.0], [1.0, 0.5]]
        )
        factor = 1.0 / len(loc)
    elif name == "dist":
        loc = np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 3.0], [-4.0, 0.0], [0.0, -5.0]])
        factor = math.sqrt(0.2)
    elif name in ("fab", "multi"):
        n_mixes, loc_scaling = (40, 40) if name == "fab" else (80, 80)
        rng = np.random.default_rng(42)
        loc = (rng.random((n_mixes, 2)) - 0.5) * 2 * loc_scaling
        factor = math.log1p(math.e)  # softplus(1.0)
    elif name == "grid":
        x = np.linspace(-5, 5, 3)
        loc = np.stack(np.meshgrid(x, x, indexing="ij"), axis=-1).reshape(-1, 2)
        factor = math.sqrt(0.3)
    elif name == "circle":
        freq = 2 * np.pi * np.arange(1, 9) / 8
        loc = np.stack([4.0 * np.cos(freq), 4.0 * np.sin(freq)], axis=1)
        factor = math.sqrt(0.3)
    else:
        raise ValueError("Unknown mode for the Gaussian mixture.")
    if dim > 2:
        loc = np.concatenate([loc, np.zeros((loc.shape[0], dim - 2))], axis=1)
    loc = jnp.asarray(loc, jnp.float32)
    scale = factor * jnp.ones_like(loc)
    weights = jnp.ones((loc.shape[0],), jnp.float32)
    return loc, scale, weights


# ---------------------------------------------------------------------------
# Functional log-probs / scores (vectorized over mixture components)
# ---------------------------------------------------------------------------

def log_prob_gaussian(x: jnp.ndarray, means: jnp.ndarray, variances: jnp.ndarray) -> jnp.ndarray:
    """Per-component diagonal-Gaussian log-density.

    x: (B, D), means/variances: (K, D)  ->  (B, K).
    """
    diff = x[:, None, :] - means[None, :, :]
    lp = -0.5 * jnp.sum(diff**2 / variances[None, :, :], axis=-1)
    lp -= 0.5 * means.shape[-1] * _LOG_2PI
    lp -= 0.5 * jnp.sum(jnp.log(variances), axis=-1)[None, :]
    return lp


def log_prob_gaussian_full(
    x: jnp.ndarray,
    means: jnp.ndarray,
    covariances: jnp.ndarray | None,
    precisions: jnp.ndarray | None = None,
    covariances_log_det: jnp.ndarray | None = None,
    return_precision_times_diff: bool = False,
):
    """Per-component full-covariance Gaussian log-density.

    x: (B, D), means: (K, D), covariances/precisions: (K, D, D) -> (B, K).
    """
    diff = x[:, None, :] - means[None, :, :]  # (B, K, D)
    if precisions is None:
        ptd = jnp.linalg.solve(covariances[None], diff[..., None])[..., 0]
    else:
        ptd = jnp.einsum("kij,bkj->bki", precisions, diff)
    lp = -0.5 * jnp.sum(diff * ptd, axis=-1)
    lp -= 0.5 * means.shape[-1] * _LOG_2PI
    if covariances_log_det is None:
        _, logdet = jnp.linalg.slogdet(covariances)
        lp -= 0.5 * logdet[None, :]
    else:
        lp -= 0.5 * covariances_log_det[None, :]
    if return_precision_times_diff:
        return lp, ptd
    return lp


def score_mog(x, weights, means, variances):
    """Score of a diagonal-covariance MoG at x (B, D)."""
    w = weights / weights.sum()
    resp = jax.nn.softmax(jnp.log(w)[None, :] + log_prob_gaussian(x, means, variances), axis=-1)
    grad_comp = (x[:, None, :] - means[None, :, :]) / variances[None, :, :]
    return -jnp.sum(resp[..., None] * grad_comp, axis=1)


def score_mog_full(x, weights, means, covariances, precisions=None, covariances_log_det=None):
    """Score of a full-covariance MoG at x (B, D)."""
    w = weights / weights.sum()
    lp, ptd = log_prob_gaussian_full(
        x, means, covariances, precisions=precisions,
        covariances_log_det=covariances_log_det, return_precision_times_diff=True,
    )
    resp = jax.nn.softmax(jnp.log(w)[None, :] + lp, axis=-1)
    return -jnp.sum(resp[..., None] * ptd, axis=1)


def score_gauss(x, means, variances):
    return -(x - means) / variances


def score_gauss_full(x, means, covariances, precisions=None):
    diff = x - means[None, :]
    if precisions is None:
        return -jnp.linalg.solve(covariances[None], diff[..., None])[..., 0]
    return -jnp.einsum("ij,bj->bi", precisions, diff)


def mog_log_prob(x, weights, means, variances):
    """Normalized log-density of a diagonal MoG; x (B, D) -> (B,)."""
    logw = jnp.log(weights / weights.sum())
    return jax.scipy.special.logsumexp(logw[None, :] + log_prob_gaussian(x, means, variances), axis=-1)


def mog_full_log_prob(x, weights, means, covariances, precisions=None, covariances_log_det=None):
    logw = jnp.log(weights / weights.sum())
    lp = log_prob_gaussian_full(
        x, means, covariances, precisions=precisions, covariances_log_det=covariances_log_det
    )
    return jax.scipy.special.logsumexp(logw[None, :] + lp, axis=-1)


# ---------------------------------------------------------------------------
# Distribution classes
# ---------------------------------------------------------------------------

class GMM(Target):
    """Mixture of Gaussians with diagonal component covariances (gauss.py:138)."""

    def __init__(
        self,
        dim: int = 2,
        loc=None,
        scale=None,
        mixture_weights=None,
        n_reference_samples: int = int(1e6),
        name: str | None = None,
        domain_scale: float = 5.0,
        **kwargs,
    ):
        super().__init__(dim=dim, log_norm_const=0.0, n_reference_samples=n_reference_samples, **kwargs)
        if name is not None:
            loc, scale, mixture_weights = gmm_params(name, dim=dim)
        loc = jnp.asarray(loc, jnp.float32)
        scale = jnp.asarray(scale, jnp.float32)
        self.n_mixtures = loc.shape[0]
        if loc.shape != scale.shape or loc.shape != (self.n_mixtures, self.dim):
            raise ValueError("Shape mismatch between loc and scale.")
        if mixture_weights is None:
            if self.n_mixtures > 1:
                raise ValueError("Require mixture weights.")
            mixture_weights = jnp.ones((1,), jnp.float32)
        self.loc = loc
        self.scale = scale
        self.mixture_weights = jnp.asarray(mixture_weights, jnp.float32)
        self._probs = self.mixture_weights / self.mixture_weights.sum()

        if self.domain is None:
            mean, std = self._mixture_mean_std()
            self.set_domain(jnp.stack([mean - domain_scale * std, mean + domain_scale * std], axis=1))
        self.stddevs = self._mixture_mean_std()[1]

    def _mixture_mean_std(self):
        p = self._probs[:, None]
        mean = jnp.sum(p * self.loc, axis=0)
        second = jnp.sum(p * (self.scale**2 + self.loc**2), axis=0)
        return mean, jnp.sqrt(second - mean**2)

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        flat = x.reshape(-1, self.dim)
        lp = mog_log_prob(flat, self.mixture_weights, self.loc, self.scale**2)
        return lp.reshape(x.shape[:-1])

    def score(self, x: jnp.ndarray) -> jnp.ndarray:
        return score_mog(x, self.mixture_weights, self.loc, self.scale**2)

    def sample(self, key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
        kcat, knorm = jax.random.split(key)
        idx = jax.random.categorical(kcat, jnp.log(self._probs), shape=shape)
        eps = jax.random.normal(knorm, (*shape, self.dim))
        return self.loc[idx] + self.scale[idx] * eps

    def marginal(self, x: jnp.ndarray, dim: int = 0) -> jnp.ndarray:
        """1-D marginal pdf along coordinate `dim` (used by plot overlays)."""
        lp = log_prob_gaussian(
            x.reshape(-1, 1), self.loc[:, dim: dim + 1], self.scale[:, dim: dim + 1] ** 2
        )
        return jnp.exp(jax.scipy.special.logsumexp(jnp.log(self._probs)[None] + lp, axis=-1))

    # -- mode-coverage metrics (gauss.py:249-305) --------------------------
    def has_entropy(self) -> bool:
        return self.n_mixtures > 1

    def compute_mode_count(self, samples: jnp.ndarray) -> jnp.ndarray:
        lp = log_prob_gaussian(samples, self.loc, self.scale**2)
        idx = jnp.argmax(lp, axis=-1)
        return jnp.bincount(idx, length=self.n_mixtures).astype(jnp.float32)

    def entropy(self, samples, counts=None):
        if counts is None:
            counts = self.compute_mode_count(samples)
        hist = counts / counts.sum()
        # xlogy: a mode with ZERO samples contributes 0, not 0*(-inf)=NaN
        # (the reference NaNs here, distr/gauss.py:263 — exactly when the
        # mode-coverage metric matters most; defect not replicated)
        return -jnp.sum(jax.scipy.special.xlogy(hist, hist)) / math.log(
            self.n_mixtures)

    def kl_weights(self, samples, counts=None):
        if counts is None:
            counts = self.compute_mode_count(samples)
        hist = counts / counts.sum()
        return jnp.sum(self._probs * jnp.log(self._probs / hist))

    def tv_weights(self, samples, counts=None):
        if counts is None:
            counts = self.compute_mode_count(samples)
        hist = counts / counts.sum()
        return jnp.sum(jnp.abs(hist - self._probs))

    def compute_forgotten_modes(self, samples, tol: float = 0.05, counts=None):
        if counts is None:
            counts = self.compute_mode_count(samples)
        hist = counts / counts.sum()
        return jnp.sum(hist < tol * self._probs.min()) / self.n_mixtures

    def compute_stats_sampling(self, key, return_samples: bool = False):
        samples = super().compute_stats_sampling(key, return_samples=True)
        if self.has_entropy():
            counts = self.compute_mode_count(samples)
            self.expectations["emc"] = float(self.entropy(samples, counts=counts))
            self.expectations["kl_weights"] = float(self.kl_weights(samples, counts=counts))
            self.expectations["tv_weights"] = float(self.tv_weights(samples, counts=counts))
            self.expectations["num_forgotten_modes"] = float(
                self.compute_forgotten_modes(samples, counts=counts)
            )
        if return_samples:
            return samples


class GMMFull(Target):
    """Mixture of Gaussians with full component covariances (gauss.py:310)."""

    def __init__(
        self,
        dim: int = 2,
        loc=None,
        cov=None,
        prec=None,
        cov_log_det=None,
        mixture_weights=None,
        n_reference_samples: int = int(1e6),
        domain_scale: float = 5.0,
        **kwargs,
    ):
        super().__init__(dim=dim, log_norm_const=0.0, n_reference_samples=n_reference_samples, **kwargs)
        loc = jnp.asarray(loc, jnp.float32)
        self.n_mixtures = loc.shape[0]
        if cov is None and prec is None:
            raise ValueError("Either cov or prec must be set.")
        if cov is not None:
            cov = jnp.asarray(cov, jnp.float32)
            prec_ = jnp.linalg.inv(cov) if prec is None else jnp.asarray(prec, jnp.float32)
        else:
            prec_ = jnp.asarray(prec, jnp.float32)
            cov = jnp.linalg.inv(prec_)
        self.loc = loc
        self.cov = cov
        self.prec = prec_
        if cov_log_det is None:
            _, cov_log_det = jnp.linalg.slogdet(cov)
        self.cov_log_det = jnp.asarray(cov_log_det, jnp.float32)
        if mixture_weights is None:
            if self.n_mixtures > 1:
                raise ValueError("Require mixture weights.")
            mixture_weights = jnp.ones((1,), jnp.float32)
        self.mixture_weights = jnp.asarray(mixture_weights, jnp.float32)
        self._probs = self.mixture_weights / self.mixture_weights.sum()
        self.chol = jnp.linalg.cholesky(cov)

        if self.domain is None:
            mean, std = self._mixture_mean_std()
            self.set_domain(jnp.stack([mean - domain_scale * std, mean + domain_scale * std], axis=1))
        self.stddevs = self._mixture_mean_std()[1]

    def _mixture_mean_std(self):
        p = self._probs[:, None]
        mean = jnp.sum(p * self.loc, axis=0)
        diag = jnp.diagonal(self.cov, axis1=-2, axis2=-1)
        second = jnp.sum(p * (diag + self.loc**2), axis=0)
        return mean, jnp.sqrt(second - mean**2)

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        flat = x.reshape(-1, self.dim)
        lp = mog_full_log_prob(
            flat, self.mixture_weights, self.loc, self.cov,
            precisions=self.prec, covariances_log_det=self.cov_log_det,
        )
        return lp.reshape(x.shape[:-1])

    def score(self, x: jnp.ndarray) -> jnp.ndarray:
        return score_mog_full(
            x, self.mixture_weights, self.loc, self.cov,
            precisions=self.prec, covariances_log_det=self.cov_log_det,
        )

    def sample(self, key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
        kcat, knorm = jax.random.split(key)
        idx = jax.random.categorical(kcat, jnp.log(self._probs), shape=shape)
        eps = jax.random.normal(knorm, (*shape, self.dim))
        return self.loc[idx] + jnp.einsum("...ij,...j->...i", self.chol[idx], eps)

    has_entropy = GMM.has_entropy
    entropy = GMM.entropy
    kl_weights = GMM.kl_weights
    tv_weights = GMM.tv_weights
    compute_forgotten_modes = GMM.compute_forgotten_modes
    compute_stats_sampling = GMM.compute_stats_sampling

    def compute_mode_count(self, samples: jnp.ndarray) -> jnp.ndarray:
        lp = log_prob_gaussian_full(
            samples, self.loc, self.cov, precisions=self.prec,
            covariances_log_det=self.cov_log_det,
        )
        idx = jnp.argmax(lp, axis=-1)
        return jnp.bincount(idx, length=self.n_mixtures).astype(jnp.float32)


class _ModeWeightMixin:
    """Adds the strongest-mode weight metric (gauss.py:455-466)."""

    def compute_mode_weight(self, samples):
        counts = self.compute_mode_count(samples)
        return 100.0 * counts[0] / counts.sum()

    def compute_stats_sampling(self, key, return_samples: bool = False):
        samples = super().compute_stats_sampling(key, return_samples=True)
        self.expectations["mode_weight"] = float(self.compute_mode_weight(samples))
        if return_samples:
            return samples


class TwoModes(_ModeWeightMixin, GMM):
    """p = (2/3) N(-a·1, C) + (1/3) N(+a·1, C), diagonal C (gauss.py:422)."""

    def __init__(self, dim: int = 2, a: float = 1.0, centered: bool = False,
                 ill_conditioned: str = "not", **kwargs):
        assert ill_conditioned in ("not", "medium", "hard")
        weights = jnp.asarray([2.0, 1.0])
        loc = jnp.stack([-a * jnp.ones(dim), a * jnp.ones(dim)])
        if centered:
            loc = loc + (a / 3.0)
        if ill_conditioned == "medium":
            scale = jnp.sqrt(0.05 * jnp.logspace(-1.0, 0.0, dim))[None, :].repeat(2, axis=0)
        elif ill_conditioned == "hard":
            scale = jnp.sqrt(0.05 * jnp.logspace(-2.0, 0.0, dim))[None, :].repeat(2, axis=0)
        else:
            scale = jnp.sqrt(0.05 * jnp.ones_like(loc))
        super().__init__(dim=dim, loc=loc, scale=scale, mixture_weights=weights, **kwargs)


class TwoModesFull(_ModeWeightMixin, GMMFull):
    """Two unequally weighted Gaussians with QR-rotated ill-conditioned
    covariances (gauss.py:469)."""

    def __init__(self, dim: int = 2, a: float = 1.0, centered: bool = False,
                 ill_conditioned: str = "medium", rand_factor: float = 5.0,
                 seed_q: int = 42, **kwargs):
        assert ill_conditioned in ("medium", "hard")
        weights = jnp.asarray([2.0, 1.0])
        loc = jnp.stack([-a * jnp.ones(dim), a * jnp.ones(dim)])
        if centered:
            loc = loc + (a / 3.0)
        rng = np.random.default_rng(seed_q)
        q, _ = np.linalg.qr(rand_factor * rng.random((dim, dim)))
        lo = -1.0 if ill_conditioned == "medium" else -2.0
        cov = np.diag(0.05 * np.logspace(lo, 0.0, dim))
        cov = q @ cov @ q.T
        cov = np.stack([cov, cov.copy()], axis=0)
        super().__init__(dim=dim, loc=loc, cov=cov, mixture_weights=weights, **kwargs)


class BracketTwoModes(_ModeWeightMixin, GMM):
    """Two modes with mirrored anisotropic diagonal covariances (gauss.py:522)."""

    def __init__(self, dim: int = 2, a: float = 0.75, equilibrated: bool = False,
                 var_min: float = 0.01, var_max: float = 0.2, **kwargs):
        loc = jnp.stack([-a * jnp.ones(dim), a * jnp.ones(dim)])
        variance_diag = jnp.linspace(var_min, var_max, dim)
        variances = jnp.stack([variance_diag, jnp.flip(variance_diag)], axis=0)
        weights = jnp.ones((2,)) / 2.0 if equilibrated else jnp.asarray([1.0, 0.5])
        super().__init__(dim=dim, loc=loc, scale=jnp.sqrt(variances),
                         mixture_weights=weights, **kwargs)


class ManyModes(GMM):
    """n_modes isotropic Gaussians at seeded random means (gauss.py:569)."""

    def __init__(self, n_modes: int = 3, dim: int = 2, seed_loc: int = 42,
                 mixture_weight_factor: float = 3.0, var: float = 0.1, **kwargs):
        weights = jnp.asarray(
            np.logspace(0.0, 1.0, n_modes, base=mixture_weight_factor), jnp.float32
        )
        rng = np.random.default_rng(seed_loc)
        loc = 2 * n_modes * rng.random((n_modes, dim)) - n_modes
        scale = jnp.sqrt(var) * jnp.ones((n_modes, dim))
        super().__init__(dim=dim, loc=jnp.asarray(loc, jnp.float32), scale=scale,
                         mixture_weights=weights, **kwargs)


class Gauss(GMM):
    """Single diagonal-covariance Gaussian (gauss.py:597)."""

    def __init__(self, dim: int = 1, loc=0.0, scale=1.0, **kwargs):
        loc = _prepare_param(loc, dim)
        scale = _prepare_param(scale, dim)
        super().__init__(dim=dim, loc=loc, scale=scale, **kwargs)
        self.stddevs = self.scale[0]

    def score(self, x: jnp.ndarray) -> jnp.ndarray:
        return score_gauss(x, self.loc[0], self.scale[0] ** 2)


class GaussFull(Target):
    """Single full-covariance Gaussian (gauss.py:632)."""

    def __init__(self, dim: int = 1, loc=None, cov=None, prec=None,
                 n_reference_samples: int = int(1e6), domain_scale: float = 5.0, **kwargs):
        super().__init__(dim=dim, log_norm_const=0.0,
                         n_reference_samples=n_reference_samples, **kwargs)
        loc = jnp.asarray(loc, jnp.float32)
        if cov is None and prec is None:
            raise ValueError("Either cov or prec must be set.")
        if cov is not None:
            cov = jnp.asarray(cov, jnp.float32)
            prec_ = jnp.linalg.inv(cov) if prec is None else jnp.asarray(prec, jnp.float32)
        else:
            prec_ = jnp.asarray(prec, jnp.float32)
            cov = jnp.linalg.inv(prec_)
        self.loc, self.cov, self.prec = loc, cov, prec_
        _, self.cov_log_det = jnp.linalg.slogdet(cov)
        self.chol = jnp.linalg.cholesky(cov)
        self.stddevs = jnp.sqrt(jnp.diagonal(cov))
        if self.domain is None:
            self.set_domain(jnp.stack(
                [loc - domain_scale * self.stddevs, loc + domain_scale * self.stddevs], axis=1))

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        flat = x.reshape(-1, self.dim)
        lp = log_prob_gaussian_full(
            flat, self.loc[None], self.cov[None], precisions=self.prec[None],
            covariances_log_det=self.cov_log_det[None],
        )[:, 0]
        return lp.reshape(x.shape[:-1])

    def score(self, x: jnp.ndarray) -> jnp.ndarray:
        return score_gauss_full(x, self.loc, self.cov, precisions=self.prec)

    def sample(self, key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
        eps = jax.random.normal(key, (*shape, self.dim))
        return self.loc + jnp.einsum("ij,...j->...i", self.chol, eps)


class IsotropicGauss(Gauss):
    """Isotropic Gaussian prior with optional quartile truncation (gauss.py:720)."""

    def __init__(self, dim: int = 1, loc: float = 0.0, scale: float = 1.0,
                 truncate_quartile: float | None = None, **kwargs):
        super().__init__(dim=dim, loc=loc, scale=scale, **kwargs)
        self._loc0 = float(self.loc[0, 0])
        self._scale0 = float(self.scale[0, 0])
        if truncate_quartile is not None:
            import scipy.stats as st

            lo = st.norm.ppf(truncate_quartile / 2, loc=self._loc0, scale=self._scale0)
            hi = st.norm.ppf(1 - truncate_quartile / 2, loc=self._loc0, scale=self._scale0)
            truncate_quartile = (float(lo), float(hi))
        self.truncate_quartile = truncate_quartile

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        var = self._scale0**2
        norm_const = -0.5 * self.dim * math.log(2.0 * math.pi * var)
        sq = jnp.sum((x - self._loc0) ** 2, axis=-1)
        return norm_const - 0.5 * sq / var

    def score(self, x: jnp.ndarray) -> jnp.ndarray:
        return (self._loc0 - x) / self._scale0**2

    def sample(self, key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
        if self.truncate_quartile is None:
            return self._loc0 + self._scale0 * jax.random.normal(key, (*shape, self.dim))
        lo, hi = self.truncate_quartile
        a = (lo - self._loc0) / self._scale0
        b = (hi - self._loc0) / self._scale0
        z = jax.random.truncated_normal(key, a, b, (*shape, self.dim))
        return self._loc0 + self._scale0 * z


def _prepare_param(param, dim: int) -> jnp.ndarray:
    if isinstance(param, Number):
        param = jnp.full((1, dim), float(param), jnp.float32)
    param = jnp.atleast_2d(jnp.asarray(param, jnp.float32))
    if param.size == 1:
        param = jnp.tile(param, (1, dim))
    return param
