"""Target distribution protocol.

Re-design of the reference Distribution base (sde_sampler/distr/base.py:22-176)
as a plain-Python class over jnp buffers: every method that touches data is a
pure, jittable function of (captured buffers, x); sampling takes an explicit
PRNG key. Log-probabilities have shape (batch,) — one scalar per sample —
instead of the reference's (batch, 1).
"""
from __future__ import annotations

import logging
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

EXPECTATION_FNS: dict[str, Callable] = {
    "square": lambda x: (x**2).sum(axis=-1),
    "abs": lambda x: jnp.abs(x).sum(axis=-1),
    "sum": lambda x: x.sum(axis=-1),
    "square_minus_sum": lambda x: (x**2 - x).sum(axis=-1),
}


class Target:
    """Base class for probability targets and priors.

    Subclasses implement ``unnorm_log_prob`` (and usually an analytic
    ``score``; the default differentiates the log-density with jax.grad,
    mirroring distr/base.py:146).
    """

    def __init__(
        self,
        dim: int,
        log_norm_const: float | None = None,
        domain: float | jnp.ndarray | None = None,
        n_reference_samples: int | None = None,
        grid_points: int | None = None,
    ):
        self.dim = dim
        self.log_norm_const = log_norm_const
        self.n_reference_samples = n_reference_samples
        self.grid_points = grid_points
        self.domain: jnp.ndarray | None = None
        self.set_domain(domain)
        self.stddevs: jnp.ndarray | None = None
        self.expectations: dict[str, float] = {}

    # -- domain ------------------------------------------------------------
    def set_domain(self, d) -> None:
        if d is None:
            self.domain = None
            return
        d = jnp.asarray(d, dtype=jnp.float32)
        if d.ndim == 0:
            d = jnp.stack([-d, d], axis=-1)
        if d.ndim == 1:
            d = d[None, :]
        if d.shape == (1, 2):
            d = jnp.tile(d, (self.dim, 1))
        assert d.shape == (self.dim, 2)
        self.domain = d

    # -- densities ---------------------------------------------------------
    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """Unnormalized log-density, shape (...,)."""
        raise NotImplementedError

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.log_norm_const is None:
            raise NotImplementedError
        return self.unnorm_log_prob(x) - self.log_norm_const

    def pdf(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(self.log_prob(x))

    def unnorm_pdf(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(self.unnorm_log_prob(x))

    def score(self, x: jnp.ndarray) -> jnp.ndarray:
        """∇ log ρ(x); default via autodiff of the summed log-density."""
        return jax.grad(lambda y: self.unnorm_log_prob(y).sum())(x)

    def log_prob_and_score(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(unnorm_log_prob, score) in one pass (shared by the MCMC kernels)."""
        return self.unnorm_log_prob(x), self.score(x)

    def has_entropy(self) -> bool:
        return False

    # -- sampling / stats --------------------------------------------------
    def sample(self, key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
        raise NotImplementedError

    def compute_stats_sampling(self, key: jax.Array, return_samples: bool = False):
        """Reference expectations by Monte Carlo (distr/base.py:61)."""
        samples = self.sample(key, (self.n_reference_samples,))
        for name, fn in EXPECTATION_FNS.items():
            if name not in self.expectations:
                self.expectations[name] = float(fn(samples).mean())
        if self.stddevs is None:
            self.stddevs = samples.std(axis=0)
        if return_samples:
            return samples

    def compute_stats_integration(self):
        """Reference expectations via Boole-rule grid quadrature on the domain.

        jnp re-design of the torchquad.Boole path (distr/base.py:72-96).
        """
        if self.domain is None or self.grid_points is None:
            raise ValueError("Integration requires domain and grid_points.")
        pts, weights = boole_grid(self.domain, self.grid_points)

        def integrate(fn):
            return float(jnp.sum(fn(pts) * weights))

        if self.log_norm_const is None:
            self.log_norm_const = math.log(integrate(self.unnorm_pdf))
        for name, fn in EXPECTATION_FNS.items():
            if name not in self.expectations:
                self.expectations[name] = integrate(lambda x, fn=fn: fn(x) * self.pdf(x))
        if self.stddevs is None:
            mean = jnp.sum(pts * (self.pdf(pts) * weights)[:, None], axis=0)
            var = jnp.sum((pts - mean) ** 2 * (self.pdf(pts) * weights)[:, None], axis=0)
            self.stddevs = jnp.sqrt(var)

    def compute_stats(self, key: jax.Array | None = None):
        try:
            if self.n_reference_samples is not None:
                if key is None:
                    key = jax.random.PRNGKey(0)
                self.compute_stats_sampling(key)
                return
        except NotImplementedError:
            pass
        if self.grid_points is not None and self.domain is not None:
            self.compute_stats_integration()
        else:
            logging.warning("Cannot compute statistics for %s", type(self).__name__)


def boole_grid(domain: jnp.ndarray, n_points: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tensor-product Boole (Newton-Cotes order 4) quadrature grid.

    Returns flattened grid points (N, dim) and weights (N,) so that
    ``sum(f(points) * weights)`` approximates the integral over the box.
    """
    dim = domain.shape[0]
    n_per_dim = int(round(n_points ** (1.0 / dim)))
    # Boole needs 4k+1 points per axis.
    n_per_dim = max(5, n_per_dim - ((n_per_dim - 1) % 4))
    axes, w1d = [], []
    pattern = np.array([2.0, 32.0, 12.0, 32.0])
    for d in range(dim):
        a, b = float(domain[d, 0]), float(domain[d, 1])
        xs = np.linspace(a, b, n_per_dim)
        h = (b - a) / (n_per_dim - 1)
        w = np.tile(pattern, (n_per_dim - 1) // 4 + 1)[:n_per_dim]
        w[0] = 7.0
        w[-1] = 7.0
        w[4:-1:4] = 14.0
        axes.append(xs)
        w1d.append(w * (2.0 * h / 45.0))
    mesh = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([m.reshape(-1) for m in mesh], axis=-1)
    wmesh = np.meshgrid(*w1d, indexing="ij")
    weights = np.prod(np.stack([m.reshape(-1) for m in wmesh], axis=-1), axis=-1)
    return jnp.asarray(pts, jnp.float32), jnp.asarray(weights, jnp.float32)


def run_gdflow(grad_U, x_init: jnp.ndarray, n_steps: int, dt: float) -> jnp.ndarray:
    """Gradient-descent flow to local energy minima (distr/base.py:201),
    as one fori_loop instead of a Python loop."""
    return jax.lax.fori_loop(0, n_steps, lambda _, x: x - dt * grad_U(x), x_init)


def sample_uniform(key: jax.Array, domain: jnp.ndarray, batch_size: int = 1) -> jnp.ndarray:
    """Uniform samples over the box domain (distr/base.py:178)."""
    dim = domain.shape[0]
    rand = jax.random.uniform(key, (batch_size, dim))
    return domain[:, 0] + rand * (domain[:, 1] - domain[:, 0])


class WrapperDistrNN(Target):
    """Freeze a time-indexed EBM as a static distribution at time t≈0.

    Analogue of distr/base.py:186 — used to install a trained EBM as the RDS
    reference distribution.
    """

    def __init__(self, dim: int, unnorm_log_prob_t: Callable, t: float):
        super().__init__(dim=dim, log_norm_const=0.0)
        self._unnorm_log_prob_t = unnorm_log_prob_t
        self.t = jnp.asarray(t, jnp.float32)

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        t = jnp.full(x.shape[:-1], self.t)
        return self._unnorm_log_prob_t(t, x)
