"""Time-conditioned control networks (Flax linen).

Re-design of sde_sampler/models/mlp.py (TimeEmbed:57, FourierMLP:99,
DenseNet:146) and the near-zero output initializers of models/utils.py:10-49.
All forward passes are batched matmuls sized for the MXU; time is a (B,)
vector broadcast per-sample (no Python branching on shapes inside jit).

The near-zero last-layer init is load-bearing: the control must start ≈ 0 so
early trajectories follow the reference process (models/utils.py scale 1e-6).
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

INIT_WEIGHT_SCALE = 1e-6


def zero_init_kernel(scale: float = INIT_WEIGHT_SCALE):
    """Uniform(-s/sqrt(fan_in), s/sqrt(fan_in)) kernel init (near-zero output)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = scale / math.sqrt(max(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def zero_init_bias(scale: float = INIT_WEIGHT_SCALE, fan_in: int | None = None, val: float = 0.0):
    """Uniform(val-b, val+b) bias init with b = s/sqrt(fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        f = fan_in if fan_in is not None else max(shape[-1], 1)
        bound = scale / math.sqrt(f)
        return val + jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def _as_time_col(t: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Normalize time input to a (batch, 1) column."""
    t = jnp.asarray(t, jnp.float32)
    t = t.reshape(-1)
    if t.shape[0] == 1:
        t = jnp.broadcast_to(t, (batch,))
    return t[:, None]


class AngleEncoding(nn.Module):
    """x -> [sin x, cos x] (models/mlp.py:47)."""

    @nn.compact
    def __call__(self, x):
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)


class TimeEmbed(nn.Module):
    """Sinusoidal time features (freqs linspace 0.1..100 + learned phase)
    followed by a small MLP (models/mlp.py:57)."""

    dim_out: int
    channels: int = 64
    num_layers: int = 2
    activation: Callable = nn.gelu
    last_kernel_init: Callable | None = None
    last_bias_init: Callable | None = None
    # matmul computation dtype (params stay f32); jnp.bfloat16 puts the
    # Dense layers on the MXU's native precision for the eval path
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, t: jnp.ndarray, *args) -> jnp.ndarray:
        t = jnp.asarray(t, jnp.float32).reshape(-1, 1)
        coeff = jnp.linspace(0.1, 100.0, self.channels)[None, :]
        phase = self.param("timestep_phase", nn.initializers.normal(1.0), (1, self.channels))
        ang = coeff * t + phase
        embed = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        dt = self.compute_dtype
        embed = self.activation(nn.Dense(self.channels, dtype=dt)(embed))
        for _ in range(self.num_layers - 2):
            embed = self.activation(nn.Dense(self.channels, dtype=dt)(embed))
        kwargs = {}
        if self.last_kernel_init is not None:
            kwargs["kernel_init"] = self.last_kernel_init
        if self.last_bias_init is not None:
            kwargs["bias_init"] = self.last_bias_init
        return nn.Dense(self.dim_out, dtype=dt, **kwargs)(embed)


class FourierMLP(nn.Module):
    """x-embedding + t-embedding summed into a residual-free MLP
    (models/mlp.py:99). `zero_init` turns on the near-zero output init."""

    dim: int
    dim_out: int | None = None
    channels: int = 64
    num_layers: int = 4
    activation: Callable = nn.gelu
    use_angle_encoding: bool = False
    zero_init: bool = False
    # matmul computation dtype (params stay f32). The output is cast back to
    # f32 so RND accumulation in the loss scans keeps full precision.
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        # Keep t at its natural length: inside the loss scans t is a per-step
        # scalar, so the time branch runs at batch 1 and broadcasts into h —
        # recomputing identical TimeEmbed rows for every sample would roughly
        # double the control net's per-step FLOPs (the rows are bit-identical,
        # so this is exact, not an approximation).
        t = jnp.asarray(t, jnp.float32).reshape(-1)
        if t.shape[0] not in (1, x.shape[0]):
            raise ValueError(f"time batch {t.shape[0]} != x batch {x.shape[0]}")
        dt = self.compute_dtype
        if self.use_angle_encoding:
            h = nn.Dense(self.channels, dtype=dt)(AngleEncoding()(x))
        else:
            h = nn.Dense(self.channels, dtype=dt)(x)
        embed_t = TimeEmbed(dim_out=self.channels, channels=self.channels,
                            activation=self.activation, compute_dtype=dt)(t)
        h = h + embed_t
        for _ in range(self.num_layers - 2):
            h = nn.Dense(self.channels, dtype=dt)(self.activation(h))
        kwargs = {}
        if self.zero_init:
            kwargs = {"kernel_init": zero_init_kernel(),
                      "bias_init": zero_init_bias(fan_in=self.channels)}
        out = nn.Dense(self.dim_out or self.dim, dtype=dt,
                       **kwargs)(self.activation(h))
        return out.astype(jnp.float32)


class DenseNet(nn.Module):
    """Concatenative DenseNet over [t, x] (models/mlp.py:146)."""

    dim: int
    arch: Sequence[int] = (64, 64)
    dim_out: int | None = None
    activation: Callable = nn.gelu
    use_angle_encoding: bool = False
    zero_init: bool = False
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        batch = x.shape[0]
        t = _as_time_col(t, batch)
        dt = self.compute_dtype
        h = jnp.concatenate([t, x], axis=-1)
        if self.use_angle_encoding:
            h = AngleEncoding()(h)
        for width in self.arch:
            h = jnp.concatenate(
                [h, self.activation(nn.Dense(width, dtype=dt)(h))], axis=-1)
        kwargs = {}
        if self.zero_init:
            kwargs = {"kernel_init": zero_init_kernel(),
                      "bias_init": zero_init_bias(fan_in=h.shape[-1])}
        return nn.Dense(self.dim_out or self.dim, dtype=dt,
                        **kwargs)(h).astype(jnp.float32)
