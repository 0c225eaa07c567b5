"""EBM potentials: neural energies tilted by exactly-noised Gaussian/GMM
priors, used as learned RDS references.

Re-design of sde_sampler/models/reparam.py:202-663 (BetterPotentialCtrl:202,
GMMTitledPotential:277 [sic], GaussTiltedPotential:485, DRLWrapper:609,
EBMAnatomyTrick:633). The tilted energy is

    E(t, x) = -log prior_t(x) + c(t) · E_NN(t, x_scaled)

where prior_t is the *exact* noised Gaussian/GMM marginal under the SDE and
x_scaled is Karras-style input normalization. Scores come from jax.grad of
the scalar energy (replacing the reference's autograd plumbing); per-sample
time vectorization is a vmap instead of torch.vmap closures.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.common import clip_norm


def _tilt_energy(tilt_type: str, net_out: jnp.ndarray, x_scaled: jnp.ndarray) -> jnp.ndarray:
    if tilt_type == "dot":
        return jnp.sum(net_out * x_scaled, axis=-1)
    if tilt_type == "sq_norm":
        return 0.5 * jnp.sum(jnp.square(net_out), axis=-1)
    return jnp.sum(net_out, axis=-1)


class GMMTiltedPotential(nn.Module):
    """GMM-tilted EBM: E(t,x) = -log gmm_t(x) + c(t)·E_NN(t,x) (reparam.py:277).

    The gmm_t term is the exact SDE-noised mixture (sde.marginal_gmm_*), so at
    init (E_NN ≈ 0) the model is the fitted GMM reference at every noise level.
    """

    base_model: nn.Module
    sde: object
    weights: jnp.ndarray           # (K,)
    means: jnp.ndarray             # (K, D)
    variances: object              # (K, D) | (K, D, D) | (eigvals, eigvecs)
    t_limit: float = 0.0
    use_s_t_scaling: bool = False
    tilt_type: str = "dot"

    @property
    def use_full_decomp(self) -> bool:
        return isinstance(self.variances, tuple)

    def _dense_variances(self) -> jnp.ndarray:
        if self.use_full_decomp:
            eig, p = self.variances
            return jnp.einsum("...ik,...k,...jk->...ij", p, eig, p)
        return self.variances

    def _gauss_moments(self):
        """Mean/variance of the mixture, for Karras input scaling."""
        w = self.weights / self.weights.sum()
        mean = jnp.sum(w[:, None] * self.means, axis=0)
        v = self._dense_variances()
        diag = jnp.diagonal(v, axis1=-2, axis2=-1) if v.ndim == 3 else v
        second = jnp.sum(w[:, None] * (diag + self.means**2), axis=0)
        return mean, second - mean**2

    def _clamp_t(self, t):
        return jnp.maximum(t, self.t_limit)

    def _scaled_variances(self, scaling_factor):
        if self.use_full_decomp:
            eig, p = self.variances
            return (scaling_factor**2 * eig, p)
        return scaling_factor**2 * self.variances

    # -- exact noised-GMM prior -------------------------------------------
    def _sf_per_sample(self, scaling_factor, batch: int):
        """Broadcast scaling_factor to (B,) — DRL passes per-sample factors
        (reparam.py:338-344 vmaps over them); scalars stay scalar."""
        if jnp.ndim(scaling_factor) == 0:
            return jnp.full((batch,), scaling_factor, jnp.float32)
        return jnp.reshape(jnp.asarray(scaling_factor, jnp.float32), (batch,))

    def prior_log_prob(self, t, x, scaling_factor=1.0):
        """log gmm_t(x) with per-sample times/scalings; t (B,), x (B, D) -> (B,)."""
        sf = self._sf_per_sample(scaling_factor, x.shape[0])

        def single(ti, xi, sfi):
            return self.sde.marginal_gmm_log_prob(
                self._clamp_t(ti), xi[None], sfi * self.means,
                self._scaled_variances(sfi), self.weights)[0]

        return jax.vmap(single)(jnp.reshape(t, (-1,)), x, sf)

    def prior_log_prob_and_grad(self, t, x, scaling_factor=1.0):
        lp = self.prior_log_prob(t, x, scaling_factor)
        sf = self._sf_per_sample(scaling_factor, x.shape[0])

        def single(ti, xi, sfi):
            return self.sde.marginal_gmm_score(
                self._clamp_t(ti), xi[None], sfi * self.means,
                self._scaled_variances(sfi), self.weights)[0]

        return lp, jax.vmap(single)(jnp.reshape(t, (-1,)), x, sf)

    def sample_prior(self, key, ts):
        """Sample the noised GMM at per-sample times ts (reparam.py:367)."""
        k1, k2, k3 = jax.random.split(key, 3)
        w = self.weights / self.weights.sum()
        idx = jax.random.categorical(k1, jnp.log(w), shape=(ts.shape[0],))
        v = self._dense_variances()
        if v.ndim == 3:
            chol = jnp.linalg.cholesky(v)
            eps = jax.random.normal(k2, (ts.shape[0], self.means.shape[-1]))
            x0 = self.means[idx] + jnp.einsum("bij,bj->bi", chol[idx], eps)
        else:
            eps = jax.random.normal(k2, (ts.shape[0], self.means.shape[-1]))
            x0 = self.means[idx] + jnp.sqrt(v)[idx] * eps
        ts_ = self._clamp_t(jnp.reshape(ts, (-1, 1)))
        loc = self.sde.s(ts_) * x0
        var = self.sde.s(ts_) ** 2 * self.sde.sigma_sq(ts_)
        return loc + jnp.sqrt(var) * jax.random.normal(k3, loc.shape)

    # -- tilted energy -----------------------------------------------------
    def scaling_input(self, t, x, scaling_factor=1.0):
        mean_g, var_g = self._gauss_moments()
        t_col = jnp.reshape(t, (-1, 1))
        c_i = scaling_factor * self.sde.s(t_col) * jnp.sqrt(var_g[None] + self.sde.sigma_sq(t_col))
        c_m = scaling_factor * self.sde.s(t_col) * mean_g[None]
        return (x - c_m) / c_i

    def base_energy(self, t, x, scaling_factor=1.0):
        x_scaled = self.scaling_input(t, x, scaling_factor)
        return _tilt_energy(self.tilt_type, self.base_model(t, x_scaled), x_scaled)

    def base_unnorm_log_prob(self, t, x, scaling_factor=1.0):
        return -self.base_energy(t, x, scaling_factor)

    def _base_factor(self, t):
        return self.sde.s(jnp.reshape(t, (-1,))) if self.use_s_t_scaling else 1.0

    def energy(self, t, x, scaling_factor=1.0):
        return -self.prior_log_prob(t, x, scaling_factor) + \
            self._base_factor(t) * self.base_energy(t, x, scaling_factor)

    def unnorm_log_prob(self, t, x, scaling_factor=1.0):
        return -self.energy(t, x, scaling_factor)

    def unnorm_log_prob_and_grad(self, t, x, scaling_factor=1.0):
        base_vals = self.base_unnorm_log_prob(t, x, scaling_factor)
        grad_base = jax.grad(
            lambda y: jnp.sum(self.base_unnorm_log_prob(t, y, scaling_factor)))(x)
        prior_lp, prior_grad = self.prior_log_prob_and_grad(t, x, scaling_factor)
        factor = self._base_factor(t)
        lp = prior_lp + factor * base_vals
        fcol = factor[:, None] if not isinstance(factor, float) else factor
        grad = prior_grad + fcol * grad_base
        return lp, grad

    def __call__(self, t, x, scaling_factor=1.0):
        """Score s(t,x) = -∇ₓE(t,x)."""
        return self.unnorm_log_prob_and_grad(t, x, scaling_factor)[1]


class GaussTiltedPotential(GMMTiltedPotential):
    """Gaussian-tilted EBM (reparam.py:485): the K=1 specialization."""

    @classmethod
    def from_gaussian(cls, base_model, sde, mean, variance, **kwargs):
        if isinstance(variance, tuple):
            variances = (variance[0][None], variance[1][None])
        else:
            variance = jnp.asarray(variance)
            variances = variance[None]
        return cls(base_model=base_model, sde=sde, weights=jnp.ones((1,)),
                   means=jnp.asarray(mean)[None], variances=variances, **kwargs)


class BetterPotentialCtrl(nn.Module):
    """Gaussian-prior-tilted neural energy with Karras input scaling
    (reparam.py:202): E = ½‖x_scaled‖² + c(t)·E_NN(t, x_scaled)."""

    base_model: nn.Module
    sde: object
    data_mean: jnp.ndarray
    data_scalar_var: jnp.ndarray
    energy_type: str = "sq_norm"
    use_gaussian_prior: bool = True
    use_s_t_scaling: bool = True
    clip_model: float | None = None

    def scaling_input(self, t, x, scaling_factor=1.0):
        t_col = jnp.reshape(t, (-1, 1))
        c_i = scaling_factor * self.sde.s(t_col) * jnp.sqrt(
            self.data_scalar_var[None] + self.sde.sigma_sq(t_col))
        c_m = scaling_factor * self.sde.s(t_col) * self.data_mean[None]
        return (x - c_m) / c_i

    def energy(self, t, x, scaling_factor=1.0):
        x_scaled = self.scaling_input(t, x, scaling_factor)
        if self.use_gaussian_prior:
            ret = 0.5 * jnp.sum(jnp.square(x_scaled), axis=-1)
            coef_t = self.sde.s(jnp.reshape(t, (-1,)))
        else:
            ret, coef_t = 0.0, 1.0
        net = clip_norm(self.base_model(t, x_scaled), self.clip_model)
        if self.energy_type == "dot":
            return ret + coef_t * jnp.sum(net * x, axis=-1)
        if self.energy_type == "sq_norm":
            return ret + 0.5 * coef_t * jnp.sum(jnp.square(net), axis=-1)
        if self.energy_type == "residual_sq_norm":
            # coef_t is the s(t) column only under the gaussian prior;
            # without it it is the scalar 1.0 (reparam.py:250-254) and
            # must not be indexed
            coef = 1.0
            if self.use_s_t_scaling and self.use_gaussian_prior:
                coef = coef_t[:, None]
            return 0.5 * jnp.sum(jnp.square(coef * net - x_scaled), axis=-1)
        return ret + coef_t * jnp.sum(net, axis=-1)

    def unnorm_log_prob(self, t, x, scaling_factor=1.0):
        return -self.energy(t, x, scaling_factor)

    def __call__(self, t, x, scaling_factor=1.0):
        return jax.grad(lambda y: jnp.sum(self.unnorm_log_prob(t, y, scaling_factor)))(x)


class DRLWrapper(nn.Module):
    """Rescaling shim around a DRL-trained EBM (reparam.py:609):
    evaluates the wrapped net at scaling_factor·x and rescales the grad."""

    net: nn.Module

    def unnorm_log_prob(self, t, x, scaling_factor=1.0):
        return self.net.unnorm_log_prob(t, scaling_factor * x, scaling_factor=scaling_factor)

    def unnorm_log_prob_and_grad(self, t, x, scaling_factor=1.0):
        lp, grad = self.net.unnorm_log_prob_and_grad(
            t, scaling_factor * x, scaling_factor=scaling_factor)
        return lp, scaling_factor * grad

    def energy(self, t, x, scaling_factor=1.0):
        return self.net.energy(t, scaling_factor * x, scaling_factor=scaling_factor)

    def __call__(self, t, x, scaling_factor=1.0):
        return scaling_factor * self.net(t, scaling_factor * x, scaling_factor=scaling_factor)


class EBMAnatomyTrick(nn.Module):
    """Divide the energy by the per-level Langevin step size (reparam.py:633)."""

    net: nn.Module
    times: jnp.ndarray
    step_sizes: jnp.ndarray

    def find_factor(self, t):
        idx = jnp.searchsorted(self.times.flatten(), jnp.reshape(t, (-1,)))
        idx = jnp.clip(idx, 0, self.step_sizes.size - 1)
        return self.step_sizes.flatten()[idx]

    def unnorm_log_prob(self, t, x, scaling_factor=1.0):
        return self.net.unnorm_log_prob(t, x, scaling_factor=scaling_factor) / self.find_factor(t)

    def unnorm_log_prob_and_grad(self, t, x, scaling_factor=1.0):
        lp, grad = self.net.unnorm_log_prob_and_grad(t, x, scaling_factor=scaling_factor)
        f = self.find_factor(t)
        return lp / f, grad / f[:, None]

    def energy(self, t, x, scaling_factor=1.0):
        return self.net.energy(t, x, scaling_factor=scaling_factor) / self.find_factor(t)

    def __call__(self, t, x, scaling_factor=1.0):
        return self.net(t, x, scaling_factor=scaling_factor) / self.find_factor(t)[:, None]
