"""Diffusion recovery likelihood (DRL) EBM training.

Re-design of sde_sampler/additions/drl.py:20-195: learn E(t, x) by maximizing
the recovery likelihood p(y_k | x_{k+1}) ∝ e^{-E(t_k, y)} N(x_{k+1}; α_k y,
σ̃²_k) — conditional MALA sampling with the b-scaled step sizes
0.5·b·sqrt(σ̄²_k/σ̄²_0)·σ̃²_k (drl.py:69), Gao/bar loss weightings, optional
variance-reduced pair sampling.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..mcmc.kernels import MCMCState, mala_step
from ..utils.common import get_timesteps


class DiffusionRecoveryLikelihood:
    def __init__(self, sde, prior, net, b: float = 2e-2,
                 use_b_adaptation: bool = False, target_acceptance: float = 0.75,
                 use_snr_adapted_disc: bool = False, use_gao_weighting: bool = True,
                 use_bar_weighting: bool = False, use_weighting_on_reg: bool = False,
                 use_var_reduction: bool = False, perc_keep_mcmc: float = -1.0,
                 start_eps: float = 1e-3, end_eps: float = 0.0, n_steps: int = 100):
        self.sde = sde
        self.prior = prior
        self.net = net
        self.b = b
        self.use_b_adaptation = use_b_adaptation
        self.target_acceptance = target_acceptance
        self.use_gao_weighting = use_gao_weighting
        self.use_bar_weighting = use_bar_weighting
        self.use_weighting_on_reg = use_weighting_on_reg
        self.use_var_reduction = use_var_reduction
        self.perc_keep_mcmc = perc_keep_mcmc
        self.keep_some_mcmc = perc_keep_mcmc > 0.0
        self.n_steps = n_steps
        self.times = get_timesteps(
            start=start_eps, end=sde.terminal_t - end_eps, steps=n_steps,
            sde=sde if use_snr_adapted_disc else None)
        # per-step transition params (drl.py:60-70)
        self.alphas, self.sigmas_sq = sde.transition_params(self.times[:-1], self.times[1:])
        s = sde.s(self.times)
        self.alphas_bar = s
        self.sigmas_sq_bar = s**2 * sde.sigma_sq(self.times)
        self.step_size = 0.5 * b * jnp.sqrt(
            self.sigmas_sq_bar[:-1] / self.sigmas_sq_bar[0]) * self.sigmas_sq
        self.params = None

    def init_params(self, key, dim: int):
        self.params = self.net.init(key, jnp.zeros((2,)), jnp.zeros((2, dim)))
        return self.params

    def net_energy(self, params, k, x):
        return self.net.apply(params, self.times[k], x, method="energy",
                              scaling_factor=self.alphas[k][:, None])

    def _cond_lpg(self, params, k, x_k_p_1):
        """(log p, grad) of y ↦ -E(t_k,y) - ||x_{k+1}-y||²/(2σ̃²_k) (drl.py:76)."""
        sig = self.sigmas_sq[k][:, None]

        def f(y):
            lp_net, g_net = self.net.apply(
                params, self.times[k], y, method="unnorm_log_prob_and_grad",
                scaling_factor=self.alphas[k][:, None])
            lp = lp_net - 0.5 * jnp.sum((x_k_p_1 - y) ** 2 / sig, axis=-1)
            g = g_net + (x_k_p_1 - y) / sig
            return lp, g

        return f

    def sample_noise_process_pairs(self, key, k, x_data):
        """(x_k, x_{k+1}) pairs, optionally variance-reduced (drl.py:87)."""
        k1, k2 = jax.random.split(key)
        z = jax.random.normal(k1, x_data.shape)
        ab = self.alphas_bar[k][:, None]
        sb = jnp.sqrt(self.sigmas_sq_bar[k])[:, None]
        x_k = ab * x_data + sb * z
        if self.use_var_reduction:
            ab1 = self.alphas_bar[k + 1][:, None]
            sb1 = jnp.sqrt(self.sigmas_sq_bar[k + 1])[:, None]
            x_k_p_1 = ab1 * x_data + sb1 * z
        else:
            a = self.alphas[k][:, None]
            s = jnp.sqrt(self.sigmas_sq[k])[:, None]
            x_k_p_1 = a * x_k + s * jax.random.normal(k2, x_k.shape)
        return x_k, x_k_p_1

    def conditional_sample(self, params, key, k, x_k_p_1, n_mcmc_steps: int):
        """MALA on the recovery conditional, chains initialized at x_{k+1}."""
        lpg = self._cond_lpg(jax.lax.stop_gradient(params), k, x_k_p_1)
        lp0, g0 = lpg(x_k_p_1)
        ss = self.step_size[jnp.clip(k, 0, self.step_size.shape[0] - 1)][:, None]
        state = MCMCState(x=x_k_p_1, log_prob=lp0, grad=g0, step_size=ss)

        def body(st, kk):
            st, log_acc = mala_step(kk, st, lpg)
            return st, (st.x, jnp.exp(jnp.minimum(0.0, log_acc)))

        keys = jax.random.split(key, n_mcmc_steps)
        state, (ys, accs) = jax.lax.scan(body, state, keys)
        return state.x, ys, accs

    def train(self, key, data, batch_size: int, n_epochs: int, lr: float = 3e-4,
              reg_val: float = 5e-3, n_mcmc_steps: int = 30):
        dim = data.shape[-1]
        if self.params is None:
            key, sub = jax.random.split(key)
            self.init_params(sub, dim)
        tx = optax.adam(lr)
        opt_state = tx.init(self.params)
        n_kept = max(int(self.perc_keep_mcmc * n_mcmc_steps), 1)

        def loss_fn(params, ks, x_pos, ks_neg, x_neg, w, w_neg):
            en_pos = self.net_energy(params, ks, x_pos)
            en_neg = self.net_energy(params, ks_neg, x_neg)
            loss = jnp.mean(w * en_pos) - jnp.mean(w_neg * en_neg)
            if self.use_weighting_on_reg:
                loss += reg_val * (jnp.mean(w * en_pos**2) + jnp.mean(w_neg * en_neg**2))
            else:
                loss += reg_val * (jnp.mean(en_pos**2) + jnp.mean(en_neg**2))
            return loss

        @jax.jit
        def update(params, opt_state, ks, x_pos, ks_neg, x_neg, w, w_neg):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, ks, x_pos, ks_neg, x_neg, w, w_neg)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses, acceptances = [], []
        n_batches = max(data.shape[0] // batch_size, 1)
        for epoch in range(n_epochs):
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, data.shape[0])
            for b in range(n_batches):
                batch = data[perm[b * batch_size:(b + 1) * batch_size]]
                key, k_lvl, k_pair, k_mcmc = jax.random.split(key, 4)
                # exclusive-high n_steps-1 mirrors the reference's
                # randint(0, n_steps-1) (drl.py:148): the top transition
                # index n_steps-1 is never drawn there either
                ks = jax.random.randint(k_lvl, (batch.shape[0],), 0, self.n_steps - 1)
                x_k_pos, x_k_p_1 = self.sample_noise_process_pairs(k_pair, ks, batch)
                y_last, ys, accs = self.conditional_sample(
                    self.params, k_mcmc, ks, x_k_p_1, n_mcmc_steps)
                if self.keep_some_mcmc:
                    y_neg = ys[-n_kept:].reshape(-1, dim)
                    ks_neg = jnp.tile(ks, (n_kept,))
                else:
                    y_neg, ks_neg = y_last, ks
                if self.use_gao_weighting:
                    w = jnp.sqrt(self.sigmas_sq[0] / self.sigmas_sq[ks])
                elif self.use_bar_weighting:
                    w = jnp.sqrt(self.sigmas_sq_bar[0] / self.sigmas_sq_bar[ks])
                else:
                    w = jnp.ones_like(ks, dtype=jnp.float32)
                w_neg = jnp.tile(w, (n_kept,)) if self.keep_some_mcmc else w
                self.params, opt_state, loss = update(
                    self.params, opt_state, ks, x_k_pos, ks_neg, y_neg, w, w_neg)
                losses.append(float(loss))
                acceptances.append(float(accs.mean()))
                if self.use_b_adaptation:
                    mean_log_acc = float(jnp.log(jnp.maximum(accs.mean(), 1e-12)))
                    if mean_log_acc - math.log(self.target_acceptance) > math.log1p(0.05):
                        self.step_size = self.step_size * 1.01
                    elif math.log(self.target_acceptance) - mean_log_acc > -math.log1p(-0.05):
                        self.step_size = self.step_size / 1.01
        return losses, acceptances
