"""Diffusion-assisted EBM: Langevin-within-Gibbs over (noise level, x).

Re-design of sde_sampler/additions/da_ebm.py:13-219. The joint sampler
alternates a multinomial draw of the level k from the per-chain softmax of
all-level log-probs with local MALA moves at the chosen level; the trainer
keeps a persistent (k, x) buffer and trains with random-level positives.

TPU design: the per-step all-level evaluation is one (L·B) super-batch; the
Gibbs loop is one lax.scan; per-level step sizes are scatter-averaged with
segment means instead of Python masking.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..mcmc.kernels import MCMCState, heuristics_step_size, mala_step
from ..utils.common import get_timesteps


def sample_langevin_gibbs_mcmc(key, k_init, x_init, times, log_probs,
                               log_prob_and_grads, n_warmup_mcmc_steps: int,
                               n_mcmc_steps: int, n_local_steps: int,
                               step_sizes_per_noise, target_acceptance: float = 0.75):
    """Gibbs over (k, x) (da_ebm.py:13). Returns
    (ks (S, B), ts (S, B), xs (S, B, D), step_sizes (L, 1), diags)."""
    L = times.shape[0]
    B = x_init.shape[0]
    D = x_init.shape[-1]
    t_all = jnp.repeat(times, B)

    def body(carry, step_key):
        k, x, ss_per_noise = carry
        k_cat, k_local = jax.random.split(step_key)
        # all-levels log-probs -> per-chain level weights (da_ebm.py:42-52)
        all_lp = log_probs(t_all, jnp.tile(x, (L, 1))).reshape(L, B)
        k_new = jax.random.categorical(k_cat, all_lp.T, axis=-1)  # (B,)
        t = times[k_new]
        cur_lpg = lambda y: log_prob_and_grads(t, y)
        lp, g = cur_lpg(x)
        cur_ss = ss_per_noise[k_new]  # (B, 1)
        state = MCMCState(x=x, log_prob=lp, grad=g, step_size=cur_ss)

        def local(st, kk):
            st, log_acc = mala_step(kk, st, cur_lpg)
            st = st._replace(step_size=heuristics_step_size(
                st.step_size, log_acc, target_acceptance=target_acceptance))
            return st, log_acc

        keys = jax.random.split(k_local, n_local_steps)
        state, log_accs = jax.lax.scan(local, state, keys)
        acc = jnp.exp(jnp.minimum(0.0, log_accs[-1]))
        # scatter-average the adapted per-chain step sizes back per level
        sums = jnp.zeros((L,)).at[k_new].add(state.step_size[:, 0])
        counts = jnp.zeros((L,)).at[k_new].add(1.0)
        new_ss = jnp.where(counts[:, None] > 0,
                           (sums / jnp.maximum(counts, 1.0))[:, None], ss_per_noise)
        per_level_acc = jnp.zeros((L,)).at[k_new].add(acc) / jnp.maximum(counts, 1.0)
        return (k_new, state.x, new_ss), (k_new, t, state.x, per_level_acc)

    keys = jax.random.split(key, n_warmup_mcmc_steps + n_mcmc_steps)
    carry = (k_init, x_init, jnp.reshape(step_sizes_per_noise, (L, 1)))
    carry, (ks, ts, xs, accs) = jax.lax.scan(body, carry, keys)
    _, _, final_ss = carry
    sl = slice(n_warmup_mcmc_steps, None)
    diags = {"local_acc": accs[sl]}
    return ks[sl], ts[sl], xs[sl], final_ss, diags


class DAEBM:
    """Diffusion-assisted EBM trainer with a persistent (k, x) buffer
    (da_ebm.py:89)."""

    def __init__(self, sde, prior, net, step_size: float = 1e-3,
                 target_acceptance: float = 0.75, perc_keep_mcmc: float = -1.0,
                 persistent_size: int = 8192, use_snr_adapted_disc: bool = False,
                 start_eps: float = 1e-3, end_eps: float = 0.0, n_steps: int = 100):
        self.sde = sde
        self.prior = prior
        self.net = net
        self.step_size = step_size
        self.target_acceptance = target_acceptance
        self.perc_keep_mcmc = perc_keep_mcmc
        self.keep_some_mcmc = perc_keep_mcmc > 0.0
        self.persistent_size = persistent_size
        self.n_steps = n_steps
        self.times = get_timesteps(
            start=start_eps, end=sde.terminal_t - end_eps, steps=n_steps,
            sde=sde if use_snr_adapted_disc else None)
        self.params = None

    def init_params(self, key, dim: int):
        self.params = self.net.init(key, jnp.zeros((2,)), jnp.zeros((2, dim)))
        return self.params

    def _log_probs(self, params):
        return lambda t, y: self.net.apply(
            params, jnp.reshape(t, (-1,)), y, method="unnorm_log_prob")

    def _log_prob_and_grads(self, params):
        return lambda t, y: self.net.apply(
            params, jnp.reshape(t, (-1,)), y, method="unnorm_log_prob_and_grad")

    def train(self, key, data, batch_size: int, n_epochs: int, lr: float = 3e-4,
              initial_n_warmup_mcmc_steps: int = 1024, n_warmup_mcmc_steps: int = 0,
              n_mcmc_steps: int = 32, n_local_steps: int = 8):
        dim = data.shape[-1]
        if self.params is None:
            key, sub = jax.random.split(key)
            self.init_params(sub, dim)
        key, k_pers = jax.random.split(key)
        persistent_k = jnp.full((self.persistent_size,), self.n_steps - 1, jnp.int32)
        persistent_x = self.prior.sample(k_pers, (self.persistent_size,))
        ss_per_noise = jnp.full((self.times.shape[0], 1), self.step_size)

        tx = optax.adam(lr)
        opt_state = tx.init(self.params)
        n_kept = max(int(self.perc_keep_mcmc * n_mcmc_steps), 1)

        def loss_fn(params, ts_p, xs_p, ts_n, xs_n):
            en_pos = self.net.apply(params, ts_p, xs_p, method="energy")
            en_neg = self.net.apply(params, ts_n, xs_n, method="energy")
            return en_pos.mean() - en_neg.mean()

        @jax.jit
        def update(params, opt_state, ts_p, xs_p, ts_n, xs_n):
            loss, grads = jax.value_and_grad(loss_fn)(params, ts_p, xs_p, ts_n, xs_n)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses, diagnostics = [], []
        n_batches = data.shape[0] // batch_size
        first = True
        for epoch in range(n_epochs):
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, data.shape[0])
            for b in range(n_batches):
                batch = data[perm[b * batch_size:(b + 1) * batch_size]]
                key, k_lvl, k_noise, k_idx, k_gibbs = jax.random.split(key, 5)
                # positives at random levels (da_ebm.py:148-151)
                # positives cover ALL times.shape[0] = n_steps+1 noise
                # levels incl. the terminal one (da_ebm.py:148) — the Gibbs
                # sampler visits it, so it needs a positive anchor too
                ks_pos = jax.random.randint(k_lvl, (batch_size,), 0,
                                            self.times.shape[0])
                ts_p = self.times[ks_pos]
                s_t = self.sde.s(ts_p)[:, None]
                std = s_t * jnp.sqrt(self.sde.sigma_sq(ts_p))[:, None]
                xs_p = s_t * batch + std * jax.random.normal(k_noise, batch.shape)
                # negatives from the persistent buffer via Gibbs
                idx = jax.random.permutation(k_idx, self.persistent_size)[:batch_size]
                warm = initial_n_warmup_mcmc_steps if first else n_warmup_mcmc_steps
                first = False
                frozen = jax.lax.stop_gradient(self.params)
                ks_n, ts_n, xs_n, ss_per_noise, diags = sample_langevin_gibbs_mcmc(
                    k_gibbs, persistent_k[idx], persistent_x[idx], self.times,
                    self._log_probs(frozen), self._log_prob_and_grads(frozen),
                    warm, n_mcmc_steps, n_local_steps, ss_per_noise,
                    target_acceptance=self.target_acceptance)
                persistent_k = persistent_k.at[idx].set(ks_n[-1])
                persistent_x = persistent_x.at[idx].set(xs_n[-1])
                if self.keep_some_mcmc:
                    ts_sel = ts_n[-n_kept:].reshape(-1)
                    xs_sel = xs_n[-n_kept:].reshape(-1, dim)
                else:
                    ts_sel, xs_sel = ts_n[-1], xs_n[-1]
                self.params, opt_state, loss = update(
                    self.params, opt_state, ts_p, xs_p, ts_sel, xs_sel)
                losses.append(float(loss))
                diagnostics.append({"local_acc": float(diags["local_acc"].mean())})
        self.persistent_k, self.persistent_x = persistent_k, persistent_x
        return np.asarray(losses), diagnostics
