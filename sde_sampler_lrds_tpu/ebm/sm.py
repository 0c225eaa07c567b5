"""Denoising / target / perfect score matching.

Re-design of sde_sampler/additions/sm.py:7-187: DSM with the σ²-weighted loss
of arXiv:2011.13456 and the antithetic-noise trick, target score matching
(regress s(t)·NN(t,y) onto ∇log ρ(x₀)), perfect score matching against a
known score; EI/DDPM ancestral sampling as one scan.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.common import get_timesteps


class ScoreMatching:
    def __init__(self, sde, prior, score_net, t_start: float, t_end: float,
                 n_steps: int = 100, antithetic: bool = True,
                 time_type: str = "uniform"):
        self.sde = sde
        self.prior = prior
        self.score_net = score_net
        self.antithetic = antithetic
        self.t_start = t_start
        self.t_end = t_end
        self.n_steps = n_steps
        self.time_type = time_type
        if "multinomial" in time_type:
            self.times = get_timesteps(
                start=t_start, end=t_end, steps=n_steps,
                sde=sde if "snr" in time_type else None)
        self.params = None
        self.ema_params = None

    def init_params(self, key, dim: int):
        self.params = self.score_net.init(key, jnp.zeros((2,)), jnp.zeros((2, dim)))
        self.ema_params = self.params
        return self.params

    def sample_time(self, key, batch_size: int):
        if "multinomial" in self.time_type:
            idx = jax.random.randint(key, (batch_size,), 0, self.times.shape[0])
            return self.times[idx]
        return self.t_start + (self.t_end - self.t_start) * \
            jax.random.uniform(key, (batch_size,))

    def compute_loss(self, params, key, ts, xs):
        """σ²-weighted DSM: E‖√v·s_θ(t,y) + z‖² with y = loc + √v z (sm.py:37)."""
        s_t = self.sde.s(ts)[:, None]
        var = (s_t**2 * self.sde.sigma_sq(ts)[:, None])
        loc = s_t * xs
        z = jax.random.normal(key, xs.shape)
        ys = loc + jnp.sqrt(var) * z
        loss = jnp.mean((jnp.sqrt(var) * self.score_net.apply(params, ts, ys) + z) ** 2, axis=-1)
        if self.antithetic:
            ys2 = loc - jnp.sqrt(var) * z
            loss = loss + jnp.mean(
                (jnp.sqrt(var) * self.score_net.apply(params, ts, ys2) - z) ** 2, axis=-1)
            loss = loss / 2.0
        return loss.mean()

    def sample(self, key, n_samples: int, n_steps: int | None = None,
               use_ddpm_kernel: bool = False, keep_intermediates: bool = False,
               params=None):
        """EI/DDPM ancestral sampling from the learned score (sm.py:54)."""
        params = params if params is not None else self.ema_params
        T = self.sde.terminal_t
        if "multinomial" in self.time_type:
            ts = self.times
        else:
            ts = get_timesteps(start=self.t_start, end=self.t_end,
                               steps=n_steps or self.n_steps,
                               sde=self.sde if "snr" in self.time_type else None)
        k_init, k_sim = jax.random.split(key)
        x = self.prior.sample(k_init, (n_samples,))

        def body(carry, st):
            x, k = carry
            s, t = st
            k, kz = jax.random.split(k)
            z = jax.random.normal(kz, x.shape)
            score = self.score_net.apply(params, jnp.full((x.shape[0],), T - s), x)
            if use_ddpm_kernel:
                x = self.sde.ddpm_integration_step(x, s, t, score, z)
            else:
                x = self.sde.ei_integration_step(x, s, t, score, z)
            return (x, k), (x if keep_intermediates else None)

        x0 = x
        (x, _), traj = jax.lax.scan(body, (x, k_sim), (ts[:-1], ts[1:]))
        if keep_intermediates:
            return jnp.concatenate([x0[None], traj], axis=0)
        return x

    def train(self, key, data, batch_size: int, n_epochs: int, lr: float = 3e-4,
              use_ema: bool = True, ema_decay: float = 0.995):
        dim = data.shape[-1]
        if self.params is None:
            key, sub = jax.random.split(key)
            self.init_params(sub, dim)
        tx = optax.adam(lr)
        opt_state = tx.init(self.params)

        @jax.jit
        def update(params, opt_state, key, xs):
            k_t, k_z = jax.random.split(key)
            ts = self.sample_time(k_t, xs.shape[0])
            loss, grads = jax.value_and_grad(
                lambda p: self.compute_loss(p, k_z, ts, xs))(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        n_batches = max(data.shape[0] // batch_size, 1)
        for epoch in range(n_epochs):
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, data.shape[0])
            for b in range(n_batches):
                xs = data[perm[b * batch_size:(b + 1) * batch_size]]
                key, sub = jax.random.split(key)
                self.params, opt_state, loss = update(self.params, opt_state, sub, xs)
                losses.append(float(loss))
                if use_ema:
                    self.ema_params = jax.tree.map(
                        lambda e, p: ema_decay * e + (1 - ema_decay) * p,
                        self.ema_params, self.params)
                else:
                    self.ema_params = self.params
        return np.asarray(losses)


class TargetScoreMatching(ScoreMatching):
    """TSM: regress s(t)·s_θ(t, y) onto ∇log ρ(x₀) (sm.py:142)."""

    def __init__(self, target_score: Callable, **kwargs):
        super().__init__(**kwargs)
        self.target_score = target_score

    def compute_loss(self, params, key, ts, xs):
        s_t = self.sde.s(ts)[:, None]
        sig = jnp.sqrt(self.sde.sigma_sq(ts))[:, None]
        z = jax.random.normal(key, xs.shape)
        tgt = self.target_score(xs)
        ys = s_t * xs + s_t * sig * z
        loss = jnp.mean((s_t * self.score_net.apply(params, ts, ys) - tgt) ** 2, axis=-1)
        if self.antithetic:
            ys2 = s_t * xs - s_t * sig * z
            loss = loss + jnp.mean(
                (s_t * self.score_net.apply(params, ts, ys2) - tgt) ** 2, axis=-1)
            loss = loss / 2.0
        return loss.mean()


class PerfectScoreMatching(ScoreMatching):
    """Regress onto a known time-indexed score (sm.py:166)."""

    def __init__(self, perfect_score: Callable, **kwargs):
        super().__init__(**kwargs)
        self.perfect_score = perfect_score

    def compute_loss(self, params, key, ts, xs):
        s_t = self.sde.s(ts)[:, None]
        sig = jnp.sqrt(self.sde.sigma_sq(ts))[:, None]
        z = jax.random.normal(key, xs.shape)
        ys = s_t * xs + s_t * sig * z
        loss = jnp.mean(
            (self.score_net.apply(params, ts, ys) - self.perfect_score(ts, ys)) ** 2, axis=-1)
        if self.antithetic:
            ys2 = s_t * xs - s_t * sig * z
            loss = loss + jnp.mean(
                (self.score_net.apply(params, ts, ys2) - self.perfect_score(ts, ys2)) ** 2,
                axis=-1)
            loss = loss / 2.0
        return loss.mean()
