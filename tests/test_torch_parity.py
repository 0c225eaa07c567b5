"""Numerical parity vs the PyTorch reference implementation.

Runs each loss simulator in BOTH frameworks with noise patched to the same
deterministic constant (so Brownian increments agree exactly) and identical
controls/targets, then compares the per-sample RND. This pins the drift,
cost, ω-weight, Itô and terminal bookkeeping of every loss to the reference
bit-for-bit (up to f32 roundoff).

Skipped automatically when /root/reference is not mounted (CI standalone).
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")

if REF.exists():
    sys.path.insert(0, str(REF))
    import types

    import torch

    # Stub optional heavy deps of the reference that parity tests never touch.
    for _mod, _attrs in [("torchquad", {"Boole": type("Boole", (), {})}),
                         ("wandb", {"run": None, "log": lambda *a, **k: None})]:
        if _mod not in sys.modules:
            try:
                __import__(_mod)
            except ImportError:
                stub = types.ModuleType(_mod)
                for k, v in _attrs.items():
                    setattr(stub, k, v)
                sys.modules[_mod] = stub

    from sde_sampler.eq import sdes as ref_sdes
    from sde_sampler.losses import oc as ref_oc

from sde_sampler_lrds_tpu.losses import (
    ControlledLangevinSDELoss,
    DDPMLikeReferenceSDELoss,
    DiscreteTimeReversalLossEI,
    EIReferenceSDELoss,
    EMReferenceSDELoss,
    ExponentialIntegratorSDELoss,
    TimeReversalLoss,
)
from sde_sampler_lrds_tpu.sde import VP, PinnedBM, ControlledLangevinSDE
from sde_sampler_lrds_tpu.sde.linear import OU

NOISE_C = 0.37  # constant standing in for every standard-normal draw
B, D = 16, 3
MU = np.array([0.4, -0.2, 0.1], dtype=np.float32)
VAR = np.array([0.7, 1.2, 0.5], dtype=np.float32)


@pytest.fixture
def const_noise(monkeypatch):
    def fake_jax_normal(key, shape=(), dtype=jnp.float32, **kw):
        return jnp.full(shape, NOISE_C, dtype)

    def fake_randn_like(x, **kw):
        return torch.full_like(x, NOISE_C)

    def fake_rand(*size, **kw):
        # used only by torch RNG fallbacks inside losses; keep deterministic
        return torch.full(size if size else (1,), 0.5, **{k: v for k, v in kw.items() if k in ("device", "dtype")})

    monkeypatch.setattr(jax.random, "normal", fake_jax_normal)
    monkeypatch.setattr(torch, "randn_like", fake_randn_like)
    yield


def torch_ctrl(t, x):
    return 0.3 * torch.tanh(x) + 0.05 * torch.sin(t) * torch.ones_like(x)


def jax_ctrl(t, x):
    t = jnp.reshape(jnp.asarray(t, jnp.float32), (-1, 1))
    return 0.3 * jnp.tanh(x) + 0.05 * jnp.sin(t) * jnp.ones_like(x)


def gauss_log_prob_torch(x, mu, var):
    mu_t = torch.as_tensor(mu)
    var_t = torch.as_tensor(var)
    lp = -0.5 * ((x - mu_t) ** 2 / var_t).sum(-1, keepdim=True)
    lp = lp - 0.5 * (np.log(2 * np.pi) * len(mu) + np.log(var).sum())
    return lp


def gauss_log_prob_jax(x, mu, var):
    lp = -0.5 * jnp.sum((x - mu) ** 2 / var, axis=-1)
    return lp - 0.5 * (np.log(2 * np.pi) * len(mu) + np.log(var).sum())


def x0_grid():
    rng = np.random.default_rng(0)
    return (rng.standard_normal((B, D)) * 1.5).astype(np.float32)


def run_pair(name, ts_np, x0, my_fn, ref_fn):
    rnd_mine = np.asarray(my_fn(jnp.asarray(ts_np), jnp.asarray(x0)))
    rnd_ref = ref_fn(torch.as_tensor(ts_np), torch.as_tensor(x0)).detach().numpy().reshape(-1)
    np.testing.assert_allclose(rnd_mine, rnd_ref, rtol=2e-3, atol=2e-3, err_msg=name)


SDE_PAIRS = {
    "vp": (lambda: VP(), lambda: ref_sdes.VP()),
    "pbm": (lambda: PinnedBM(diff_coeff=2.0), lambda: ref_sdes.PinnedBM(diff_coeff=2.0)),
}


def make_grids(sde_name, loss_name):
    start = 0.02 if sde_name == "pbm" else 0.0
    end = 1.0 - (0.02 if loss_name == "ddpm" else 0.0)
    return np.linspace(start, end, 13, dtype=np.float32)


@pytest.mark.parametrize("sde_name", ["vp", "pbm"])
@pytest.mark.parametrize("loss_name,mine_cls,ref_cls", [
    ("em", EMReferenceSDELoss, lambda: ref_oc.EMReferenceSDELoss),
    ("ei", EIReferenceSDELoss, lambda: ref_oc.EIReferenceSDELoss),
    ("ddpm", DDPMLikeReferenceSDELoss, lambda: ref_oc.DDPMLikeReferenceSDELoss),
])
def test_rds_losses_parity(const_noise, sde_name, loss_name, mine_cls, ref_cls):
    my_sde, torch_sde = SDE_PAIRS[sde_name]
    my_sde, torch_sde = my_sde(), torch_sde()
    ts = make_grids(sde_name, loss_name)
    x0 = x0_grid()

    my_ref_ctrl = lambda t, x: my_sde.marginal_score(t, x, jnp.asarray(MU), var_init=jnp.asarray(VAR))
    my_ref_lp = lambda x: my_sde.marginal_log_prob(jnp.asarray(0.0), x, jnp.asarray(MU), var_init=jnp.asarray(VAR))
    loss = mine_cls(sde=my_sde, method="kl", reference_ctrl=my_ref_ctrl, remat=False)

    t_ref_ctrl = lambda t, x: torch_sde.marginal_score(
        t=t, x=x, x_init=torch.as_tensor(MU), var_init=torch.as_tensor(VAR))
    t_ref_lp = lambda x: torch_sde.marginal_distr(
        t=torch.tensor(0.0), x_init=torch.as_tensor(MU), var_init=torch.as_tensor(VAR)).log_prob(x)

    ref_loss = ref_cls()(generative_ctrl=torch_ctrl, generative_ctrl_ema=torch_ctrl,
                         sde=torch_sde, method="kl", reference_ctrl=t_ref_ctrl)

    run_pair(
        f"rds-{loss_name}-{sde_name}", ts, x0,
        lambda ts_, x_: loss.simulate(jax.random.PRNGKey(0), ts_, x_, jax_ctrl,
                                      lambda y: gauss_log_prob_jax(y, MU, VAR), my_ref_lp)[1],
        lambda ts_, x_: ref_loss.simulate(ts_, x_, lambda y: gauss_log_prob_torch(y, MU, VAR),
                                          t_ref_lp)[1],
    )


@pytest.mark.parametrize("sde_name", ["vp"])
@pytest.mark.parametrize("loss_name,mine_cls,ref_cls,train", [
    ("em", EMReferenceSDELoss, lambda: ref_oc.EMReferenceSDELoss, None),
    ("ei", EIReferenceSDELoss, lambda: ref_oc.EIReferenceSDELoss, None),
])
def test_rds_eubo_parity(const_noise, sde_name, loss_name, mine_cls, ref_cls, train):
    my_sde, torch_sde = SDE_PAIRS[sde_name]
    my_sde, torch_sde = my_sde(), torch_sde()
    ts = make_grids(sde_name, loss_name)
    x0 = x0_grid()
    my_ref_ctrl = lambda t, x: my_sde.marginal_score(t, x, jnp.asarray(MU), var_init=jnp.asarray(VAR))
    my_ref_lp = lambda x: my_sde.marginal_log_prob(jnp.asarray(0.0), x, jnp.asarray(MU), var_init=jnp.asarray(VAR))
    loss = mine_cls(sde=my_sde, method="kl", reference_ctrl=my_ref_ctrl, remat=False)
    t_ref_ctrl = lambda t, x: torch_sde.marginal_score(
        t=t, x=x, x_init=torch.as_tensor(MU), var_init=torch.as_tensor(VAR))
    t_ref_lp = lambda x: torch_sde.marginal_distr(
        t=torch.tensor(0.0), x_init=torch.as_tensor(MU), var_init=torch.as_tensor(VAR)).log_prob(x)
    ref_loss = ref_cls()(generative_ctrl=torch_ctrl, generative_ctrl_ema=torch_ctrl,
                         sde=torch_sde, method="kl", reference_ctrl=t_ref_ctrl)
    run_pair(
        f"eubo-{loss_name}", ts, x0,
        lambda ts_, x_: loss.compute_eubo(jax.random.PRNGKey(0), ts_, x_, jax_ctrl,
                                          lambda y: gauss_log_prob_jax(y, MU, VAR), my_ref_lp),
        lambda ts_, x_: ref_loss.compute_eubo(ts_, x_.clone(),
                                              lambda y: gauss_log_prob_torch(y, MU, VAR), t_ref_lp),
    )


@pytest.mark.parametrize("train", [True, False])
def test_cmcd_parity(const_noise, train):
    mu0 = np.zeros(D, dtype=np.float32)
    var0 = 4.0 * np.ones(D, dtype=np.float32)
    t_score = lambda x: -(x - torch.as_tensor(MU)) / torch.as_tensor(VAR)
    j_score = lambda x: -(x - MU) / VAR
    t_prior_score = lambda x: -(x - torch.as_tensor(mu0)) / torch.as_tensor(var0)
    j_prior_score = lambda x: -(x - mu0) / var0
    my_sde = ControlledLangevinSDE(target_score=j_score, prior_score=j_prior_score,
                                   diff_coeff=1.0, terminal_t=1.0)
    torch_sde = ref_sdes.ControlledLangevinSDE(
        target_score=t_score, prior_score=t_prior_score, diff_coeff=1.0, terminal_t=1.0)
    loss = ControlledLangevinSDELoss(sde=my_sde, method="kl", remat=False)
    ref_loss = ref_oc.ControlledLangevinSDELoss(
        generative_ctrl=torch_ctrl, generative_ctrl_ema=torch_ctrl,
        sde=torch_sde, method="kl")
    ts = np.linspace(0.0, 1.0, 13, dtype=np.float32)
    x0 = x0_grid()
    run_pair(
        f"cmcd-train{train}", ts, x0,
        lambda ts_, x_: loss.simulate(jax.random.PRNGKey(0), ts_, x_, jax_ctrl,
                                      lambda y: gauss_log_prob_jax(y, MU, VAR),
                                      initial_log_prob=lambda y: gauss_log_prob_jax(y, mu0, var0),
                                      train=train)[1],
        lambda ts_, x_: ref_loss.simulate(ts_, x_, lambda y: gauss_log_prob_torch(y, MU, VAR),
                                          initial_log_prob=lambda y: gauss_log_prob_torch(y, mu0, var0),
                                          train=train)[1],
    )


@pytest.mark.parametrize("train", [True, False])
def test_discrete_dis_parity(const_noise, train):
    my_sde, torch_sde = VP(), ref_sdes.VP()
    loss = DiscreteTimeReversalLossEI(sde=my_sde, method="kl", remat=False)
    ref_loss = ref_oc.DiscreteTimeReversalLossEI(
        generative_ctrl=torch_ctrl, generative_ctrl_ema=torch_ctrl,
        sde=torch_sde, method="kl")
    mu0 = np.zeros(D, dtype=np.float32)
    var0 = np.ones(D, dtype=np.float32)
    ts = np.linspace(0.0, 1.0, 13, dtype=np.float32)
    x0 = x0_grid()
    run_pair(
        f"ddis-train{train}", ts, x0,
        lambda ts_, x_: loss.simulate(jax.random.PRNGKey(0), ts_, x_, jax_ctrl,
                                      lambda y: gauss_log_prob_jax(y, MU, VAR),
                                      initial_log_prob=lambda y: gauss_log_prob_jax(y, mu0, var0),
                                      train=train)[1],
        lambda ts_, x_: ref_loss.simulate(ts_, x_, lambda y: gauss_log_prob_torch(y, MU, VAR),
                                          initial_log_prob=lambda y: gauss_log_prob_torch(y, mu0, var0),
                                          train=train)[1],
    )


@pytest.mark.parametrize("train,ito", [(True, True), (False, True), (True, False)])
def test_orig_dis_parity(const_noise, train, ito):
    my_sde, torch_sde = VP(), ref_sdes.VP()
    loss = TimeReversalLoss(sde=my_sde, method="kl", remat=False)
    ref_loss = ref_oc.TimeReversalLoss(
        generative_ctrl=torch_ctrl, generative_ctrl_ema=torch_ctrl,
        sde=torch_sde, method="kl")
    mu0 = np.zeros(D, dtype=np.float32)
    var0 = np.ones(D, dtype=np.float32)
    ts = np.linspace(0.0, 1.0, 13, dtype=np.float32)
    x0 = x0_grid()
    run_pair(
        f"odis-train{train}-ito{ito}", ts, x0,
        lambda ts_, x_: loss.simulate(jax.random.PRNGKey(0), ts_, x_, jax_ctrl,
                                      lambda y: gauss_log_prob_jax(y, MU, VAR),
                                      initial_log_prob=lambda y: gauss_log_prob_jax(y, mu0, var0),
                                      train=train, compute_ito_int=ito)[1],
        lambda ts_, x_: ref_loss.simulate(ts_, x_, lambda y: gauss_log_prob_torch(y, MU, VAR),
                                          initial_log_prob=lambda y: gauss_log_prob_torch(y, mu0, var0),
                                          train=train, compute_ito_int=ito)[1],
    )


def test_orig_dds_parity(const_noise):
    loss = ExponentialIntegratorSDELoss(sde=None, method="kl", alpha=0.8, sigma=1.1, remat=False)
    ref_loss = ref_oc.ExponentialIntegratorSDELoss(
        generative_ctrl=torch_ctrl, generative_ctrl_ema=torch_ctrl,
        sde=None, method="kl", alpha=0.8, sigma=1.1)
    mu0 = np.zeros(D, dtype=np.float32)
    var0 = 1.1**2 * np.ones(D, dtype=np.float32)
    ts = np.linspace(0.0, 6.4, 13, dtype=np.float32)
    x0 = x0_grid()
    run_pair(
        "odds", ts, x0,
        lambda ts_, x_: loss.simulate(jax.random.PRNGKey(0), ts_, x_, jax_ctrl,
                                      lambda y: gauss_log_prob_jax(y, MU, VAR),
                                      lambda y: gauss_log_prob_jax(y, mu0, var0),
                                      compute_ito_int=True)[1],
        lambda ts_, x_: ref_loss.simulate(ts_, x_, lambda y: gauss_log_prob_torch(y, MU, VAR),
                                          lambda y: gauss_log_prob_torch(y, mu0, var0),
                                          compute_ito_int=True)[1],
    )


def torch_inf_ctrl(t, x):
    return 0.2 * torch.sin(x) + 0.1 * torch.cos(t) * torch.ones_like(x)


def jax_inf_ctrl(t, x):
    t = jnp.reshape(jnp.asarray(t, jnp.float32), (-1, 1))
    return 0.2 * jnp.sin(x) + 0.1 * jnp.cos(t) * jnp.ones_like(x)


@pytest.mark.parametrize("train", [True, False])
@pytest.mark.parametrize("ito", [True, False])
def test_gbs_inference_ctrl_parity(const_noise, train, ito):
    """GBS = original DIS with a learned inference control: the divergence
    cost term (losses/oc.py:1194-1210) and — in eval mode — the
    drift_div_int correction (losses/oc.py:1219) match the reference RND
    exactly under identical noise."""
    my_sde, torch_sde = VP(), ref_sdes.VP()
    loss = TimeReversalLoss(sde=my_sde, method="kl", remat=False,
                            inference_ctrl=jax_inf_ctrl)
    ref_loss = ref_oc.TimeReversalLoss(
        generative_ctrl=torch_ctrl, generative_ctrl_ema=torch_ctrl,
        sde=torch_sde, method="kl", inference_ctrl=torch_inf_ctrl)
    mu0 = np.zeros(D, dtype=np.float32)
    var0 = np.ones(D, dtype=np.float32)
    ts = np.linspace(0.0, 1.0, 13, dtype=np.float32)
    x0 = x0_grid()
    run_pair(
        f"gbs-train{train}-ito{ito}", ts, x0,
        lambda ts_, x_: loss.simulate(jax.random.PRNGKey(0), ts_, x_, jax_ctrl,
                                      lambda y: gauss_log_prob_jax(y, MU, VAR),
                                      initial_log_prob=lambda y: gauss_log_prob_jax(y, mu0, var0),
                                      train=train, compute_ito_int=ito)[1],
        lambda ts_, x_: ref_loss.simulate(ts_, x_, lambda y: gauss_log_prob_torch(y, MU, VAR),
                                          initial_log_prob=lambda y: gauss_log_prob_torch(y, mu0, var0),
                                          train=train, compute_ito_int=ito)[1],
    )
