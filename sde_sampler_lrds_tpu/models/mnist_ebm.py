"""Small convolutional energy network for 14×14-MNIST EBMs (Flax, NHWC).

Re-design of sde_sampler/models/mnist_ebm.py:7-44: three time-conditioned
conv stages downsampling 14→7→3→1, returning a (B, 8·n_f) feature vector
consumed by the tilted-potential energy heads.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .mlp import TimeEmbed


class MNISTNet(nn.Module):
    n_f: int = 14
    side: int = 14

    @nn.compact
    def __call__(self, t, x):
        img = x.reshape(-1, self.side, self.side, 1)
        h = nn.Conv(self.n_f, (3, 3), padding="SAME")(img)
        emb1 = TimeEmbed(dim_out=self.n_f, channels=2 * self.n_f, num_layers=2,
                         activation=nn.silu)(t)
        h = nn.silu(h + emb1[:, None, None, :])
        h = nn.Conv(2 * self.n_f, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))(h)
        emb2 = TimeEmbed(dim_out=2 * self.n_f, channels=4 * self.n_f, num_layers=2,
                         activation=nn.silu)(t)
        h = nn.silu(h + emb2[:, None, None, :])
        h = nn.Conv(4 * self.n_f, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))(h)
        emb3 = TimeEmbed(dim_out=4 * self.n_f, channels=8 * self.n_f, num_layers=2,
                         activation=nn.silu)(t)
        h = nn.silu(h + emb3[:, None, None, :])
        h = nn.Conv(8 * self.n_f, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))(h)
        return h.reshape(x.shape[0], -1)


class MNISTEnergy(nn.Module):
    """Conv energy for GMM-tilted MNIST EBM references: MNISTNet features →
    a near-zero-init scalar head, so E_NN(t, x) ≈ 0 at init and the tilted
    potential starts exactly at the fitted GMM (the invariant every
    GMMTiltedPotential base model must satisfy; FourierMLP gets it from
    zero_init — reference models/utils.py scale 1e-6). Use with
    ``tilt_type='sum'`` (the reference's GMMTitledPotential 'else' branch,
    reparam.py:433: energy = net output summed), since conv features have
    no dot-product pairing with the flat 196-d input."""
    n_f: int = 14
    side: int = 14

    @nn.compact
    def __call__(self, t, x):
        from .mlp import zero_init_bias, zero_init_kernel

        feats = MNISTNet(n_f=self.n_f, side=self.side)(t, x)
        return nn.Dense(1, kernel_init=zero_init_kernel(),
                        bias_init=zero_init_bias(fan_in=feats.shape[-1]))(feats)
