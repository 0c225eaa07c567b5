"""NICE normalizing-flow targets (14×14 MNIST), Flax edition.

Re-design of sde_sampler/distr/nice.py:17-611: additive coupling layers with
alternating even/odd masks, a diagonal log-scaling layer, optional
dequantization and stabilized sigmoid transforms, logistic or normal latent.
`Nice` wraps a trained flow as a Target; `MixtureNice` mixes per-digit flows
with 3:1 alternating weights and digit-classification mode metrics.

Checkpoints are flax-serialization msgpack files produced by
scripts/train_nice.py (the reference's per-digit .pt checkpoints are absent
from its own data/ as well — SURVEY.md §2.6 — so they must be trained).
"""
from __future__ import annotations

import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import serialization

from .base import Target

DATA_DIR = Path(__file__).parents[2] / "data"


# ---------------------------------------------------------------------------
# latent priors
# ---------------------------------------------------------------------------

def logistic_log_prob(z):
    return -(jax.nn.softplus(z) + jax.nn.softplus(-z))


def logistic_sample(key, shape, eps: float = 1e-20):
    u = jax.random.uniform(key, shape, minval=eps, maxval=1.0 - eps)
    return jnp.log(u) - jnp.log1p(-u)


# ---------------------------------------------------------------------------
# flow modules
# ---------------------------------------------------------------------------

class Coupling(nn.Module):
    """Additive coupling over even/odd interleaved halves (nice.py:97)."""

    in_out_dim: int
    mid_dim: int
    hidden: int
    mask_config: int

    @nn.compact
    def _shift(self, off):
        h = nn.relu(nn.Dense(self.mid_dim)(off))
        for _ in range(self.hidden - 1):
            h = nn.relu(nn.Dense(self.mid_dim)(h))
        return nn.Dense(self.in_out_dim // 2)(h)

    def __call__(self, x, reverse: bool = False):
        b, w = x.shape
        xr = x.reshape(b, w // 2, 2)
        if self.mask_config:
            on, off = xr[:, :, 0], xr[:, :, 1]
        else:
            off, on = xr[:, :, 0], xr[:, :, 1]
        shift = self._shift(off)
        on = on - shift if reverse else on + shift
        if self.mask_config:
            out = jnp.stack([on, off], axis=2)
        else:
            out = jnp.stack([off, on], axis=2)
        return out.reshape(b, w)


class NiceModel(nn.Module):
    """NICE flow: f (data→latent, with log-det) and g (latent→data)
    (nice.py:179)."""

    coupling: int = 4
    in_out_dim: int = 196
    mid_dim: int = 1000
    hidden: int = 5
    mask_config: int = 1
    latent: str = "logistic"
    use_dequant: bool = False
    use_sigmoid: bool = False
    alpha_sigmoid: float = 1e-5
    quants: float = 256.0

    def setup(self):
        self.couplings = [
            Coupling(in_out_dim=self.in_out_dim, mid_dim=self.mid_dim,
                     hidden=self.hidden, mask_config=(self.mask_config + i) % 2)
            for i in range(self.coupling)
        ]
        self.scale = self.param("scale", nn.initializers.zeros, (1, self.in_out_dim))

    # -- elementwise transforms (nice.py:43-94) ----------------------------
    def _sigmoid_fwd(self, x):
        alpha = self.alpha_sigmoid
        tiny, eps = 1.17549e-38, 1.19209e-07
        x = x * (1.0 - alpha) + 0.5 * alpha
        log_det = math.log1p(-alpha) * x.shape[-1]
        x = jnp.clip(x, tiny, 1.0 - eps)
        log_det = log_det - jnp.sum(jnp.log(x) + jnp.log1p(-x), axis=-1)
        return jnp.log(x) - jnp.log1p(-x), log_det

    def _sigmoid_rev(self, x):
        alpha = self.alpha_sigmoid
        tiny, eps = 1.17549e-38, 1.19209e-07
        x = jnp.clip(jax.nn.sigmoid(x), tiny, 1.0 - eps)
        return (x - 0.5 * alpha) / (1.0 - alpha)

    def _dequant_fwd(self, x, key):
        q = self.quants
        x = (x * (q - 1.0) + jax.random.uniform(key, x.shape)) / q
        return x, -math.log1p(1.0 / (q - 1.0)) * x.shape[-1]

    def _dequant_rev(self, x):
        q = self.quants
        x = jnp.clip(jnp.floor(x * q), 0, q - 1) / (q - 1.0)
        return x

    # -- flow directions ---------------------------------------------------
    def f(self, x, dequant_key=None):
        log_det = jnp.zeros((x.shape[0],))
        if self.use_dequant:
            if dequant_key is None:
                raise ValueError("Dequantization requires a PRNG key.")
            x, ld = self._dequant_fwd(x, dequant_key)
            log_det = log_det + ld
        if self.use_sigmoid:
            x, ld = self._sigmoid_fwd(x)
            log_det = log_det + ld
        for c in self.couplings:
            x = c(x)
        x = x * jnp.exp(self.scale)
        return x, log_det + jnp.sum(self.scale)

    def g(self, z):
        x = z * jnp.exp(-self.scale)
        for c in reversed(self.couplings):
            x = c(x, reverse=True)
        if self.use_sigmoid:
            x = self._sigmoid_rev(x)
        if self.use_dequant:
            x = self._dequant_rev(x)
        return x

    def log_prob(self, x, dequant_key=None):
        z, log_det = self.f(x, dequant_key=dequant_key)
        if self.latent == "normal":
            lp = -0.5 * (z**2 + math.log(2 * math.pi))
        else:
            lp = logistic_log_prob(z)
        return jnp.sum(lp, axis=1) + log_det

    def sample(self, key):
        """One latent draw per call shape baked by caller via vmapped keys."""
        raise NotImplementedError("use Nice.sample (needs batch shape)")

    def __call__(self, x):
        return self.log_prob(x)


# ---------------------------------------------------------------------------
# targets
# ---------------------------------------------------------------------------

class Nice(Target):
    """A trained NICE flow on resized MNIST as a sampling target
    (nice.py:299)."""

    def __init__(self, params=None, model: NiceModel | None = None,
                 checkpoint: str | Path = DATA_DIR / "nice.msgpack",
                 mean_data_path: str | Path = DATA_DIR / "mnist_mean_14.npy",
                 dim: int = 196, log_norm_const: float = 0.0,
                 n_reference_samples: int = int(1e6), **kwargs):
        super().__init__(dim=dim, log_norm_const=log_norm_const,
                         n_reference_samples=n_reference_samples, **kwargs)
        self.shape = (14, 14)
        if dim != math.prod(self.shape):
            raise ValueError(f"Dimension is {dim} but needs to be 196.")
        self.mean = jnp.asarray(np.load(mean_data_path).reshape(1, dim), jnp.float32)
        if model is None or params is None:
            meta, params = load_nice_checkpoint(Path(checkpoint).read_bytes())
            if meta.pop("skip_centering", False):
                self.mean = jnp.zeros_like(self.mean)
            model = NiceModel(**meta)
        self.model = model
        self.params = params

    def log_prob_flow(self, x):
        return self.model.apply(self.params, x, method="log_prob")

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.log_prob_flow(jnp.atleast_2d(x)).reshape(x.shape[:-1]) \
            + self.log_norm_const

    def sample(self, key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
        n = int(np.prod(shape)) if shape else 1
        if self.model.latent == "normal":
            z = jax.random.normal(key, (n, self.dim))
        else:
            z = logistic_sample(key, (n, self.dim))
        x = self.model.apply(self.params, z, method="g")
        return x.reshape(*shape, self.dim)


class MixtureNice(Target):
    """Mixture of per-digit NICE flows (nice.py:397): weights 3:1 alternating
    (equilibrated option), normalization to [-1, 1], digit metrics."""

    def __init__(self, equilibrated: bool = False, normalize: bool = True,
                 digits=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9), nice_dists=None,
                 checkpoints=None, means_data_path=None,
                 local_minimums=None, dim: int = 196,
                 log_norm_const: float = 0.0, n_reference_samples: int = 2048,
                 **kwargs):
        super().__init__(dim=dim, log_norm_const=log_norm_const,
                         n_reference_samples=n_reference_samples, **kwargs)
        self.digits = sorted(tuple(digits))
        self.n_digits = len(self.digits)
        self.normalize = normalize
        if nice_dists is not None:
            self.nice_dists = list(nice_dists)
        else:
            if checkpoints is None:
                checkpoints = [DATA_DIR / f"nice_label_{d}.msgpack" for d in self.digits]
            if means_data_path is None:
                means_data_path = [DATA_DIR / f"mnist_mean_label_{d}.npy"
                                   for d in self.digits]
            self.nice_dists = [
                Nice(checkpoint=c, mean_data_path=m, dim=dim)
                for c, m in zip(checkpoints, means_data_path)]
        if equilibrated:
            w = jnp.ones((self.n_digits,)) / self.n_digits
        else:
            w = np.ones(self.n_digits)
            w[::2] = 3.0
            w = jnp.asarray(w / w.sum(), jnp.float32)
        self.mixture_weights = w
        if local_minimums is not None:
            self.local_minimums = jnp.asarray(local_minimums)
        else:
            lm_path = DATA_DIR / "x_min_nf_mnist.npy"
            if lm_path.exists():
                self.local_minimums = jnp.asarray(np.load(lm_path))[jnp.asarray(self.digits)]
            else:
                self.local_minimums = None

    def _maybe_unnormalize(self, x):
        return (x + 1.0) / 2.0 if self.normalize else x

    def _component_log_probs(self, x):
        """(K, B) per-flow log-probs at (unnormalized, per-flow-centered) x."""
        u = self._maybe_unnormalize(x)
        return jnp.stack([
            d.log_prob_flow(u - d.mean) for d in self.nice_dists], axis=0)

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        lps = self._component_log_probs(jnp.atleast_2d(x))
        lps = lps + jnp.log(self.mixture_weights)[:, None]
        out = jax.scipy.special.logsumexp(lps, axis=0)
        if self.normalize:
            out = out - x.shape[-1] * math.log(2.0)
        return out.reshape(x.shape[:-1])

    def score(self, x: jnp.ndarray) -> jnp.ndarray:
        u = self._maybe_unnormalize(x)
        lps, grads = [], []
        for d in self.nice_dists:
            grads.append(jax.grad(lambda y, d=d: jnp.sum(d.log_prob_flow(y - d.mean)))(u))
            lps.append(d.log_prob_flow(u - d.mean))
        lps = jnp.stack(lps, axis=0)
        grads = jnp.stack(grads, axis=0)
        w = jax.nn.softmax(lps + jnp.log(self.mixture_weights)[:, None], axis=0)
        grad = jnp.sum(w[..., None] * grads, axis=0)
        if self.normalize:
            grad = grad / 2.0
        return grad

    def sample(self, key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
        n = int(np.prod(shape)) if shape else 1
        k_cat, *k_flows = jax.random.split(key, self.n_digits + 1)
        idx = jax.random.categorical(k_cat, jnp.log(self.mixture_weights), shape=(n,))
        # sample all flows and gather (static shapes; K small)
        all_samples = jnp.stack([
            d.sample(k, (n,)) + d.mean for d, k in zip(self.nice_dists, k_flows)],
            axis=0)
        out = jnp.take_along_axis(all_samples, idx[None, :, None], axis=0)[0]
        if self.normalize:
            out = 2.0 * (out - 0.5)
        return out.reshape(*shape, self.dim)

    # -- digit-classification mode metrics (nice.py:538-605) ---------------
    def has_entropy(self) -> bool:
        return True

    def get_classes(self, samples):
        return jnp.argmax(self._component_log_probs(samples), axis=0)

    def compute_mode_count(self, samples):
        labels = self.get_classes(samples)
        return jnp.bincount(labels, length=self.n_digits).astype(jnp.float32)

    def entropy(self, samples, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = counts / counts.sum()
        # 0*log0 = 0 for empty modes (see targets/gauss.py entropy)
        return -jnp.sum(jax.scipy.special.xlogy(hist, hist)) / math.log(
            self.n_digits)

    def kl_weights(self, samples, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = counts / counts.sum()
        return jnp.sum(self.mixture_weights * jnp.log(self.mixture_weights / hist))

    def tv_weights(self, samples, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = counts / counts.sum()
        return jnp.sum(jnp.abs(hist - self.mixture_weights))

    def compute_forgotten_modes(self, samples, tol=0.05, counts=None):
        counts = self.compute_mode_count(samples) if counts is None else counts
        hist = counts / counts.sum()
        return jnp.sum(hist < tol * self.mixture_weights.min()) / self.n_digits

    def compute_mode_weight(self, samples):
        if self.n_digits == 2:
            counts = self.compute_mode_count(samples)
            return 100.0 * counts[0] / counts.sum()
        return jnp.zeros(())

    def compute_stats_sampling(self, key, return_samples: bool = False):
        samples = super().compute_stats_sampling(key, return_samples=True)
        counts = self.compute_mode_count(samples)
        self.expectations["mode_weight"] = float(self.compute_mode_weight(samples))
        self.expectations["emc"] = float(self.entropy(samples, counts=counts))
        self.expectations["kl_weights"] = float(self.kl_weights(samples, counts=counts))
        self.expectations["tv_weights"] = float(self.tv_weights(samples, counts=counts))
        self.expectations["num_forgotten_modes"] = float(
            self.compute_forgotten_modes(samples, counts=counts))
        if return_samples:
            return samples


# ---------------------------------------------------------------------------
# checkpoint format
# ---------------------------------------------------------------------------

def save_nice_checkpoint(path, meta: dict, params) -> None:
    """msgpack blob: {meta (flow hyperparams), params} (scripts/train_nice.py)."""
    blob = serialization.msgpack_serialize({"meta": meta, "params":
                                            serialization.to_state_dict(params)})
    Path(path).write_bytes(blob)


def load_nice_checkpoint(blob: bytes):
    """Returns (meta dict incl. skip_centering flag, params pytree)."""
    data = serialization.msgpack_restore(blob)
    meta = {k: (v.item() if hasattr(v, "item") else v) for k, v in data["meta"].items()}
    model_meta = {k: v for k, v in meta.items() if k != "skip_centering"}
    model = NiceModel(**model_meta)
    dummy = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, model_meta.get("in_out_dim", 196))))
    params = serialization.from_state_dict(dummy, data["params"])
    return meta, params
