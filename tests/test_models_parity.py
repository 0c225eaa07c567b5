"""Control-reparametrization parity vs the torch reference.

The wrapped base networks are replaced by identical deterministic functions
in both frameworks, so any output difference isolates a formula error in the
reparametrization itself (ScoreCtrl / CancelDriftCtrl / LerpCtrl wiring,
clipping, scale-model application — reference models/reparam.py:18-199).
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")

if REF.exists():
    sys.path.insert(0, str(REF))
    import types

    import torch

    for _mod, _attrs in [("torchquad", {"Boole": type("Boole", (), {})}),
                         ("wandb", {"run": None})]:
        if _mod not in sys.modules:
            try:
                __import__(_mod)
            except ImportError:
                stub = types.ModuleType(_mod)
                for k, v in _attrs.items():
                    setattr(stub, k, v)
                sys.modules[_mod] = stub

    from sde_sampler.eq import sdes as ref_sdes
    from sde_sampler.models import reparam as ref_reparam

from sde_sampler_lrds_tpu.models.reparam import (
    CancelDriftCtrl,
    ClippedCtrl,
    LerpCtrl,
    ScoreCtrl,
)
from sde_sampler_lrds_tpu.sde import VP

B, D = 8, 3


class _JaxFnModule(nn.Module):
    """Deterministic stand-in base model (no params)."""

    fn: object

    def __call__(self, t, x):
        return self.fn(jnp.reshape(jnp.asarray(t, jnp.float32), (-1, 1)), x)


class _TorchFnModule(torch.nn.Module if REF.exists() else object):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, t, x):
        t = torch.as_tensor(t).reshape(-1, 1).expand(x.shape[0], 1)
        return self.fn(t, x)


def base_fn_jax(t, x):
    return jnp.sin(x) + 0.1 * t


def base_fn_torch(t, x):
    return torch.sin(x) + 0.1 * t


def scale_fn_jax(t, x):
    return 0.5 + 0.2 * jnp.reshape(jnp.asarray(t, jnp.float32), (-1, 1))


def scale_fn_torch(t, x):
    return 0.5 + 0.2 * torch.as_tensor(t).reshape(-1, 1)


def target_score_jax(x):
    return -x / 0.7


def target_score_torch(x, create_graph=False):
    return -x / 0.7


def prior_score_jax(x):
    return -x / 2.0


def prior_score_torch(x):
    return -x / 2.0


def compare(my_module, ref_module, t_val=0.37):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, D)).astype(np.float32)
    t = np.full((B,), t_val, np.float32)
    mine = my_module.apply({}, jnp.asarray(t), jnp.asarray(x))
    ref = ref_module(torch.as_tensor(t).reshape(-1, 1), torch.as_tensor(x))
    np.testing.assert_allclose(np.asarray(mine), ref.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_clipped_ctrl_parity():
    mine = ClippedCtrl(base_model=_JaxFnModule(fn=lambda t, x: 10.0 * base_fn_jax(t, x)),
                       clip_model=5.0)
    ref = ref_reparam.ClippedCtrl(
        base_model=_TorchFnModule(lambda t, x: 10.0 * base_fn_torch(t, x)),
        clip_model=5.0)
    compare(mine, ref)


def test_score_ctrl_parity():
    mine = ScoreCtrl(base_model=_JaxFnModule(fn=base_fn_jax), clip_model=1e4,
                     target_score=target_score_jax,
                     score_model=_JaxFnModule(fn=scale_fn_jax),
                     detach_score=False, scale_score=1.3, clip_score=1e4)
    ref = ref_reparam.ScoreCtrl(
        base_model=_TorchFnModule(base_fn_torch), clip_model=1e4,
        target_score=target_score_torch,
        score_model=_TorchFnModule(scale_fn_torch),
        detach_score=False, scale_score=1.3, clip_score=1e4)
    compare(mine, ref)


def test_cancel_drift_ctrl_parity():
    my_sde, ref_sde = VP(), ref_sdes.VP()
    mine = CancelDriftCtrl(base_model=_JaxFnModule(fn=base_fn_jax), clip_model=1e4,
                           target_score=target_score_jax,
                           score_model=_JaxFnModule(fn=scale_fn_jax),
                           detach_score=False, sde=my_sde, clip_score=1e4)
    ref = ref_reparam.CancelDriftCtrl(
        base_model=_TorchFnModule(base_fn_torch), clip_model=1e4,
        target_score=target_score_torch,
        score_model=_TorchFnModule(scale_fn_torch),
        detach_score=False, sde=ref_sde, clip_score=1e4)
    compare(mine, ref)


def test_lerp_ctrl_parity():
    my_sde, ref_sde = VP(), ref_sdes.VP()
    mine = LerpCtrl(base_model=_JaxFnModule(fn=base_fn_jax), clip_model=1e4,
                    target_score=target_score_jax, prior_score=prior_score_jax,
                    score_model=_JaxFnModule(fn=scale_fn_jax),
                    detach_score=False, sde=my_sde, clip_score=1e4)
    ref = ref_reparam.LerpCtrl(
        base_model=_TorchFnModule(base_fn_torch), clip_model=1e4,
        target_score=target_score_torch, prior_score=prior_score_torch,
        score_model=_TorchFnModule(scale_fn_torch),
        detach_score=False, sde=ref_sde, clip_score=1e4)
    compare(mine, ref)


def test_tilted_potential_prior_parity():
    """GMMTiltedPotential's noised-GMM prior log-prob/score vs the reference
    (with the neural part zeroed by construction)."""
    from sde_sampler_lrds_tpu.models.potentials import GMMTiltedPotential

    weights = np.array([0.6, 0.4], np.float32)
    means = np.array([[-1.0, 0.5, 0.2], [1.0, -0.5, -0.2]], np.float32)
    variances = np.array([[0.3, 0.5, 0.4], [0.4, 0.2, 0.6]], np.float32)
    my_sde, ref_sde = VP(), ref_sdes.VP()

    zero_jax = _JaxFnModule(fn=lambda t, x: jnp.zeros_like(x))
    mine = GMMTiltedPotential(base_model=zero_jax, sde=my_sde,
                              weights=jnp.asarray(weights),
                              means=jnp.asarray(means),
                              variances=jnp.asarray(variances), tilt_type="dot")
    ref = ref_reparam.GMMTitledPotential(
        base_model=_TorchFnModule(lambda t, x: torch.zeros_like(x)),
        sde=ref_sde, weights=torch.as_tensor(weights),
        means=torch.as_tensor(means), variances=torch.as_tensor(variances),
        tilt_type="dot")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, 3)).astype(np.float32)
    t = np.full((B,), 0.42, np.float32)
    lp_mine, g_mine = mine.apply({}, jnp.asarray(t), jnp.asarray(x),
                                 method="unnorm_log_prob_and_grad")
    lp_ref, g_ref = ref.unnorm_log_prob_and_grad(
        torch.as_tensor(t).reshape(-1, 1), torch.as_tensor(x))
    np.testing.assert_allclose(np.asarray(lp_mine), lp_ref.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_mine), g_ref.detach().numpy(),
                               rtol=1e-4, atol=1e-4)


def test_better_potential_residual_sq_norm_no_gaussian_prior():
    """energy_type='residual_sq_norm' with use_gaussian_prior=False keeps
    coef_t the scalar 1.0 (reparam.py:250-254) — it used to crash indexing
    the float."""
    import jax
    import jax.numpy as jnp
    from sde_sampler_lrds_tpu.models import BetterPotentialCtrl, FourierMLP
    from sde_sampler_lrds_tpu.sde import VP

    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    pot = BetterPotentialCtrl(
        base_model=FourierMLP(dim=3, channels=16), sde=sde,
        data_mean=jnp.zeros(3), data_scalar_var=jnp.ones(()),
        use_gaussian_prior=False, energy_type="residual_sq_norm")
    t = jnp.full((4,), 0.3)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    params = pot.init(jax.random.PRNGKey(1), t, x, method="energy")
    e = pot.apply(params, t, x, method="energy")
    assert e.shape == (4,) and bool(jnp.isfinite(e).all())
