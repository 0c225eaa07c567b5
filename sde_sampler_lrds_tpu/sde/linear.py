"""Linear (Ornstein-Uhlenbeck-type) SDE algebra, fully closed-form.

TPU re-design of sde_sampler/eq/sdes.py: the generic linear SDE
dX_t = k(t) X dt + g(t) dW_t with analytic scale s(t) = exp(∫k),
sigma_sq(t) = ∫ g²/s², transition kernels, noised Gaussian/GMM marginals,
variational-loss weights ω/ω_DDPM and exponential-integrator / DDPM denoising
steps (eq/sdes.py:117-716). Every method is a pure jittable function of
static Python-float hyperparameters, so XLA constant-folds the schedule.

Conventions:
  * "noising time" t runs 0 → T; the generative (denoising) losses use T - t.
  * ei/ddpm integration steps take an explicit standard-normal draw `z`
    (counter-based randomness lives in the caller's scan).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..targets.gauss import (
    log_prob_gaussian,
    log_prob_gaussian_full,
    mog_full_log_prob,
    mog_log_prob,
    score_gauss,
    score_gauss_full,
    score_mog,
    score_mog_full,
)


class OU:
    """Generic linear SDE dX = drift_coeff_t(t)·X dt + diff_coeff_t(t) dW."""

    def __init__(self, terminal_t: float = 1.0):
        self.terminal_t = float(terminal_t)

    # -- schedule (subclass responsibility) --------------------------------
    def drift_coeff_t(self, t):
        raise NotImplementedError

    def diff_coeff_t(self, t):
        raise NotImplementedError

    def s(self, t):
        """exp(∫₀ᵗ drift_coeff_t(u) du) (eq/sdes.py:159)."""
        raise NotImplementedError

    def sigma_sq(self, t):
        """∫₀ᵗ diff_coeff_t(u)²/s(u)² du (eq/sdes.py:163)."""
        raise NotImplementedError

    def int_drift_coeff_t(self, s, t):
        raise NotImplementedError

    def int_diff_coeff_sq_t(self, s, t):
        raise NotImplementedError

    # -- SDE coefficients --------------------------------------------------
    def drift(self, t, x):
        return self.drift_coeff_t(t) * x

    def diff(self, t, x=None):
        return self.diff_coeff_t(t)

    def drift_div(self, t, x):
        """Divergence of the drift field (eq/sdes.py:133)."""
        return self.drift_coeff_t(t) * x.shape[-1]

    def drift_div_int(self, s, t, x):
        """∫ₛᵗ div drift du (eq/sdes.py:137)."""
        return self.int_drift_coeff_t(s, t) * x.shape[-1]

    # -- transition kernel -------------------------------------------------
    def transition_params(self, s, t):
        """(mean_factor, var_factor) with X_t = m·X_s + sqrt(v)·Z, s < t."""
        s_t, s_s = self.s(t), self.s(s)
        mean_factor = jnp.exp(jnp.log(s_t) - jnp.log(s_s))
        var_factor = s_t**2 * (self.sigma_sq(t) - self.sigma_sq(s))
        return mean_factor, var_factor

    def log_snr(self, t):
        """log(s(t)² / (s(t)² σ²(t))) = -log σ²(t) (eq/sdes.py:347)."""
        a = self.s(t)
        return jnp.log(a**2 / (a**2 * self.sigma_sq(t)))

    # -- affine step coefficients (vectorized over grids) -------------------
    # The denoising kernels are affine in (x, score, z):
    #     x' = a_x·x + a_s·score + a_z·z.
    # Computing (a_x, a_s, a_z) for the WHOLE grid outside the lax.scan is
    # load-bearing on TPU: the schedule transcendentals are scalar ops that
    # cost ~0.26 ms/step when left inside the scan body (~100× the cost of
    # the actual batched work at the reference's eval scale).
    def ei_step_coeffs(self, s, t):
        raise NotImplementedError

    def ddpm_step_coeffs(self, s, t):
        """Generic DDPM-like posterior coefficients (eq/sdes.py:192)."""
        T = self.terminal_t
        a_step, v_step = self.transition_params(T - t, T - s)
        a_k1 = self.s(T - s)
        v_k1 = a_k1**2 * self.sigma_sq(T - s)
        a_k0 = self.s(T - t)
        v_k0 = a_k0**2 * self.sigma_sq(T - t)
        var = v_step * v_k0 / (v_step + v_k0 * a_step**2)
        a_x = var * (a_step / v_step + a_k0 / (v_k0 * a_k1))
        a_s = var * a_k0 * v_k1 / (v_k0 * a_k1)
        return a_x, a_s, jnp.sqrt(var)

    # -- generic DDPM weights/steps (unstable; VP/PBM override) ------------
    def omega_ddpm(self, t_k, t_k_p_1):
        T = self.terminal_t
        a_step, v_step = self.transition_params(T - t_k_p_1, T - t_k)
        a_k1 = self.s(T - t_k)
        v_k1 = a_k1**2 * self.sigma_sq(T - t_k)
        a_k0 = self.s(T - t_k_p_1)
        v_k0 = a_k0**2 * self.sigma_sq(T - t_k_p_1)
        w_sq = (a_k0**2 / a_k1**2) * (v_k1**2 / v_k0**2)
        var = v_step * v_k0 / (v_step + v_k0 * a_step**2)
        return w_sq * var

    def ddpm_integration_step(self, x, t_k, t_k_p_1, score, z):
        a_x, a_s, a_z = self.ddpm_step_coeffs(t_k, t_k_p_1)
        return a_x * x + a_s * score + a_z * z

    # -- noised marginals of Gaussian / GMM references ---------------------
    def marginal_params(self, t, x_init, var_init=None, is_mixture: bool = False):
        """Noised marginal of N(x_init, var_init): loc = s·x_init,
        var = s²(σ² + var_init) (eq/sdes.py:208).

        var_init may be:
          * None            -> scalar variance s²σ²
          * (…, D)          -> diagonal
          * (…, D, D)       -> full covariance
          * (D_eig, P)      -> eigendecomposition cov = P·diag(D_eig)·Pᵀ; the
                               result is returned as (precision, log_det)
                               keeping the noised full covariance exact and
                               cheap (eq/sdes.py:232-239).
        """
        s_t = self.s(t)
        loc = s_t * x_init
        var = s_t**2 * self.sigma_sq(t)
        if var_init is None:
            return loc, var
        if isinstance(var_init, tuple):
            eig, p = var_init
            diag = eig + self.sigma_sq(t)
            prec = jnp.einsum("...ik,...k,...jk->...ij", p, 1.0 / diag, p) / s_t**2
            log_det = jnp.sum(jnp.log(diag), axis=-1) + 2.0 * diag.shape[-1] * jnp.log(s_t)
            return loc, (prec, log_det)
        var_init = jnp.asarray(var_init)
        full_ndim = 3 if is_mixture else 2
        if var_init.ndim == full_ndim:
            eye = jnp.eye(var_init.shape[-1])
            var = var * (eye if not is_mixture else eye[None])
        return loc, var + s_t**2 * var_init

    def marginal_log_prob(self, t, x, x_init, var_init=None):
        """log N(x; marginal_params) for a Gaussian reference, x (B, D) -> (B,)."""
        if isinstance(var_init, tuple):
            return self._factored_noised_mog(
                t, x, jnp.atleast_2d(x_init), _lift(var_init), None)[0]
        loc, var = self.marginal_params(
            t, jnp.atleast_2d(x_init), var_init=_lift(var_init), is_mixture=True)
        if var.ndim == 3:
            return log_prob_gaussian_full(x, loc, var)[:, 0]
        var = jnp.broadcast_to(var, loc.shape)
        return log_prob_gaussian(x, loc, var)[:, 0]

    def marginal_score(self, t, x, x_init, var_init=None):
        """Score of the noised Gaussian reference at (t, x) (eq/sdes.py:265)."""
        if isinstance(var_init, tuple):
            return self._factored_noised_mog(
                t, x, jnp.atleast_2d(x_init), _lift(var_init), None)[1]
        loc, var = self.marginal_params(t, x_init, var_init=var_init)
        if jnp.ndim(var) == 2:
            return score_gauss_full(x, loc, var)
        return score_gauss(x, loc, var)

    def marginal_gmm_params(self, t, means_init, variances_init, weights_init=None):
        means, variances = self.marginal_params(
            t, x_init=means_init, var_init=variances_init, is_mixture=True)
        if weights_init is None:
            weights = jnp.ones((means.shape[0],)) / means.shape[0]
        else:
            weights = weights_init
        return weights, means, variances

    def _factored_noised_mog(self, t, x, means_init, var_tuple, weights_init):
        """Noised-MoG (log_prob, score) for eigendecomposed covariances.

        cov_k = P_k diag(eig_k) P_kᵀ noises to P_k diag(s²(eig_k+σ²)) P_kᵀ —
        the eigenbasis is time-invariant, so the density never needs a
        per-time Cholesky/precision matrix: rotate the residual into the
        eigenbasis (one batched matmul on the MXU), scale elementwise, rotate
        back. This is the hot path of EBM-reference training
        (GMMTiltedPotential vmaps it per sample; eq/sdes.py:232-239).
        """
        eig, p = var_tuple
        if eig.ndim == 1:
            eig, p = eig[None], p[None]
        # scalar t only: the (K, D) broadcast below silently mis-computes for
        # a (B,) time vector (vmap over t for the batched-time case)
        if jnp.ndim(t) != 0:
            raise ValueError(
                "_factored_noised_mog takes scalar t; vmap over t for a "
                f"batch of times (got t with shape {jnp.shape(t)}).")
        s_t = self.s(t)
        denom = s_t**2 * (eig + self.sigma_sq(t))          # (K, D)
        loc = s_t * jnp.atleast_2d(means_init)             # (K, D)
        if weights_init is None:
            w = jnp.ones((loc.shape[0],)) / loc.shape[0]
        else:
            w = weights_init / weights_init.sum()
        diff = x[:, None, :] - loc[None]                   # (B, K, D)
        y = jnp.einsum("bkd,kde->bke", diff, p)            # eigenbasis coords
        y_scaled = y / denom[None]
        quad = jnp.sum(y * y_scaled, axis=-1)              # (B, K)
        log_det = jnp.sum(jnp.log(denom), axis=-1)         # (K,)
        lp_k = -0.5 * (quad + log_det[None]
                       + loc.shape[-1] * jnp.log(2.0 * jnp.pi))
        log_prob = jax.scipy.special.logsumexp(
            jnp.log(w)[None] + lp_k, axis=-1)
        resp = jax.nn.softmax(jnp.log(w)[None] + lp_k, axis=-1)
        ptd = jnp.einsum("kde,bke->bkd", p, y_scaled)      # precision @ diff
        score = -jnp.sum(resp[..., None] * ptd, axis=1)
        return log_prob, score

    def marginal_gmm_log_prob(self, t, x, means_init, variances_init, weights_init=None):
        if isinstance(variances_init, tuple):
            return self._factored_noised_mog(
                t, x, means_init, variances_init, weights_init)[0]
        w, m, v = self.marginal_gmm_params(t, means_init, variances_init, weights_init)
        if v.ndim == 3:
            return mog_full_log_prob(x, w, m, v)
        v = jnp.broadcast_to(v, m.shape)
        return mog_log_prob(x, w, m, v)

    def marginal_gmm_score(self, t, x, means_init, variances_init, weights_init=None):
        if isinstance(variances_init, tuple):
            return self._factored_noised_mog(
                t, x, means_init, variances_init, weights_init)[1]
        w, m, v = self.marginal_gmm_params(t, means_init, variances_init, weights_init)
        if v.ndim == 3:
            return score_mog_full(x, w, m, v)
        v = jnp.broadcast_to(v, m.shape)
        return score_mog(x, w, m, v)


def _lift(var_init):
    """Broadcast single-Gaussian var_init to the (1, ...) mixture layout."""
    if var_init is None:
        return None
    if isinstance(var_init, tuple):
        eig, p = var_init
        if eig.ndim == 1:
            return (eig[None], p[None])
        return var_init
    v = jnp.asarray(var_init)
    return v[None] if v.ndim in (1, 2) else v


class ConstOU(OU):
    """dX = -k·X dt + g dW with constant k, g (eq/sdes.py:354)."""

    def __init__(self, drift_coeff: float = 2.0, diff_coeff: float = 2.0, **kwargs):
        if drift_coeff < 0 or diff_coeff <= 0:
            raise ValueError("Choose non-negative drift_coeff and positive diff_coeff.")
        super().__init__(**kwargs)
        self.drift_coeff = float(drift_coeff)
        self.diff_coeff = float(diff_coeff)

    def drift_coeff_t(self, t):
        return -self.drift_coeff * jnp.ones_like(jnp.asarray(t, jnp.float32))

    def diff_coeff_t(self, t):
        return self.diff_coeff * jnp.ones_like(jnp.asarray(t, jnp.float32))

    def int_drift_coeff_t(self, s, t):
        return -self.drift_coeff * (t - s)

    def int_diff_coeff_sq_t(self, s, t):
        return self.diff_coeff**2 * (t - s)

    def s(self, t):
        return jnp.exp(-self.drift_coeff * t)

    def sigma_sq(self, t):
        # Exact ∫ g²/s² = g²(e^{2kt}-1)/(2k). (The reference's eq/sdes.py:401
        # drops the 1/(2k) factor, which is only correct for k=1; ConstOU is
        # unused by its shipped configs, so we keep the exact form.)
        return self.diff_coeff**2 * jnp.expm1(2.0 * self.drift_coeff * t) / (2.0 * self.drift_coeff)


class ScaledBM(ConstOU):
    """dX = σ dW (eq/sdes.py:406)."""

    def __init__(self, *args, **kwargs):
        kwargs["drift_coeff"] = 0.0
        super().__init__(*args, **kwargs)

    def s(self, t):
        return jnp.ones_like(jnp.asarray(t, jnp.float32))

    def sigma_sq(self, t):
        return self.diff_coeff**2 * t


class VP(OU):
    """Variance-preserving SDE with a linear β schedule (eq/sdes.py:427).

    α(t) = β_min t + t²(β_max-β_min)/(2T);  s(t) = e^{-α/2};
    σ²(t) = c²(1/s² - 1) with c = scale_diff_coeff; stationary N(0, c²).
    """

    def __init__(self, diff_coeff_sq_min: float = 0.1, diff_coeff_sq_max: float = 20.0,
                 scale_diff_coeff: float = 1.0, **kwargs):
        super().__init__(**kwargs)
        self.diff_coeff_sq_min = float(diff_coeff_sq_min)
        self.diff_coeff_sq_max = float(diff_coeff_sq_max)
        self.scale_diff_coeff = float(scale_diff_coeff)

    def _diff_coeff_sq_t(self, t):
        u = t / self.terminal_t
        return self.diff_coeff_sq_min + u * (self.diff_coeff_sq_max - self.diff_coeff_sq_min)

    def drift_coeff_t(self, t):
        return -0.5 * self._diff_coeff_sq_t(t)

    def diff_coeff_t(self, t):
        return self.scale_diff_coeff * jnp.sqrt(self._diff_coeff_sq_t(t))

    def int_drift_coeff_t(self, s, t):
        return -0.25 * (self._diff_coeff_sq_t(t) + self._diff_coeff_sq_t(s)) * (t - s)

    def int_diff_coeff_sq_t(self, s, t):
        return 0.5 * self.scale_diff_coeff**2 * (
            self._diff_coeff_sq_t(t) + self._diff_coeff_sq_t(s)) * (t - s)

    def alpha_(self, t):
        """∫₀ᵗ β(u) du for the linear schedule (eq/sdes.py:490)."""
        return self.diff_coeff_sq_min * t + (0.5 * t**2 / self.terminal_t) * (
            self.diff_coeff_sq_max - self.diff_coeff_sq_min)

    def transition_params(self, s, t):
        lam = -jnp.expm1(self.alpha_(s) - self.alpha_(t))
        mean_factor = jnp.sqrt(1.0 - lam)
        return mean_factor, self.scale_diff_coeff**2 * lam

    def s(self, t):
        return jnp.exp(-0.5 * self.alpha_(t))

    def sigma_sq(self, t):
        return self.scale_diff_coeff**2 * jnp.expm1(self.alpha_(t))

    # -- numerically stable EI/DDPM pieces (eq/sdes.py:517-555) ------------
    def lambda_(self, t_k, t_k_p_1):
        return jnp.expm1(self.alpha_(self.terminal_t - t_k) - self.alpha_(self.terminal_t - t_k_p_1))

    def omega(self, t_k, t_k_p_1):
        """EI loss weight 4c²·tanh(Δα/4)."""
        d_alpha = self.alpha_(self.terminal_t - t_k) - self.alpha_(self.terminal_t - t_k_p_1)
        return 4.0 * self.scale_diff_coeff**2 * jnp.tanh(d_alpha / 4.0)

    def omega_ddpm(self, t_k, t_k_p_1):
        lam_k = -jnp.expm1(-self.alpha_(self.terminal_t - t_k))
        lam_k1 = -jnp.expm1(-self.alpha_(self.terminal_t - t_k_p_1))
        return self.scale_diff_coeff**2 * (lam_k / lam_k1) * self.lambda_(t_k, t_k_p_1)

    def ei_step_coeffs(self, s, t):
        lam = self.lambda_(s, t)
        root = jnp.sqrt(1.0 + lam)
        return (root, 2.0 * self.scale_diff_coeff**2 * (root - 1.0),
                self.scale_diff_coeff * jnp.sqrt(lam))

    def ei_integration_step(self, x, t_k, t_k_p_1, score, z):
        a_x, a_s, a_z = self.ei_step_coeffs(t_k, t_k_p_1)
        return a_x * x + a_s * score + a_z * z

    def ddpm_step_coeffs(self, s, t):
        """Numerically stable DDPM coefficients (eq/sdes.py:541)."""
        T = self.terminal_t
        lam = self.lambda_(s, t)
        lam_rev = -jnp.expm1(self.alpha_(T - t) - self.alpha_(T - s))
        lam_k = -jnp.expm1(-self.alpha_(T - s))
        lam_k1 = -jnp.expm1(-self.alpha_(T - t))
        d_alpha = (self.alpha_(T - s) - self.alpha_(T - t)) / 2.0
        var = self.scale_diff_coeff**2 * lam_rev * (lam_k1 / lam_k)
        return (jnp.sqrt(1.0 + lam),
                2.0 * self.scale_diff_coeff**2 * jnp.sinh(d_alpha),
                jnp.sqrt(var))

    def ddpm_integration_step(self, x, t_k, t_k_p_1, score, z):
        a_x, a_s, a_z = self.ddpm_step_coeffs(t_k, t_k_p_1)
        return a_x * x + a_s * score + a_z * z


class CosineVP(VP):
    """VP SDE with cosine α schedule (eq/sdes.py:558)."""

    def __init__(self, c: float = 0.008, scale_diff_coeff: float = 1.0, **kwargs):
        super().__init__(scale_diff_coeff=scale_diff_coeff, **kwargs)
        self.c = float(c)

    def _diff_coeff_sq_t(self, t):
        u = ((t / self.terminal_t) + self.c) / (1.0 + self.c)
        return math.pi * jnp.tan(0.5 * math.pi * u) / (self.terminal_t * (1.0 + self.c))

    def int_drift_coeff_t(self, s, t):
        raise NotImplementedError

    def int_diff_coeff_sq_t(self, s, t):
        raise NotImplementedError

    def alpha_(self, t):
        u = ((t / self.terminal_t) + self.c) / (1.0 + self.c)
        return -2.0 * jnp.log(jnp.cos(0.5 * math.pi * u))


class PinnedBM(OU):
    """Pinned Brownian motion (PIS reference process, eq/sdes.py:597).

    drift = -X/(T-t); s(t) = (T-t)/T; σ²(t) = g² T t/(T-t).
    """

    def __init__(self, diff_coeff: float = 2.0, **kwargs):
        if diff_coeff <= 0:
            raise ValueError("Choose positive diff_coeff.")
        super().__init__(**kwargs)
        self.diff_coeff = float(diff_coeff)

    def drift_coeff_t(self, t):
        return -1.0 / (self.terminal_t - t)

    def diff_coeff_t(self, t):
        return self.diff_coeff * jnp.ones_like(jnp.asarray(t, jnp.float32))

    def int_drift_coeff_t(self, s, t):
        return jnp.log(self.terminal_t - t) - jnp.log(self.terminal_t - s)

    def int_diff_coeff_sq_t(self, s, t):
        return self.diff_coeff**2 * (t - s)

    def transition_params(self, s, t):
        mean_factor = (self.terminal_t - t) / (self.terminal_t - s)
        var_factor = mean_factor * (t - s) * self.diff_coeff**2
        return mean_factor, var_factor

    def s(self, t):
        return (self.terminal_t - t) / self.terminal_t

    def sigma_sq(self, t):
        return self.diff_coeff**2 * self.terminal_t * t / (self.terminal_t - t)

    def omega(self, t_k, t_k_p_1):
        return self.diff_coeff**2 * (t_k / t_k_p_1) * (t_k_p_1 - t_k)

    def omega_ddpm(self, t_k, t_k_p_1):
        T = self.terminal_t
        return self.diff_coeff**2 * ((T - t_k) / (T - t_k_p_1)) * (t_k_p_1 - t_k)

    def ei_step_coeffs(self, s, t):
        var = self.diff_coeff**2 * (t / s) * (t - s)
        return t / s, self.diff_coeff**2 * (t - s), jnp.sqrt(var)

    def ei_integration_step(self, x, t_k, t_k_p_1, score, z):
        a_x, a_s, a_z = self.ei_step_coeffs(t_k, t_k_p_1)
        return a_x * x + a_s * score + a_z * z

    def ddpm_step_coeffs(self, s, t):
        T = self.terminal_t
        var = self.diff_coeff**2 * ((T - t) / (T - s)) * (t - s)
        return t / s, self.diff_coeff**2 * (t - s), jnp.sqrt(var)

    def ddpm_integration_step(self, x, t_k, t_k_p_1, score, z):
        a_x, a_s, a_z = self.ddpm_step_coeffs(t_k, t_k_p_1)
        return a_x * x + a_s * score + a_z * z
