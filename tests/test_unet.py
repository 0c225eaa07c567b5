"""MNIST UNet control network: shape/zero-init contract, make_ctrl wiring,
and a short RDS training run with the UNet as the control
(reference conf/model/basic_unet.yaml + benchmark_utils.py:31-38)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.models.mnist_unet import Unet


@pytest.mark.slow
def test_unet_forward_shapes_and_zero_init():
    """(t (B,), x (B, side²)) -> (B, side²); near-zero output at init when
    init_last_layer_with_zeros=True (the load-bearing contract of
    conf/model/base/unet.yaml: n_channels=16, zero-init last conv)."""
    net = Unet(n_channels=16, side=14, init_last_layer_with_zeros=True)
    t = jnp.linspace(0.1, 0.9, 3)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 196))
    params = net.init(jax.random.PRNGKey(1), t, x)
    out = net.apply(params, t, x)
    assert out.shape == (3, 196)
    # last conv kernel/bias are 1e-6-scale => output magnitude tiny vs input
    assert float(jnp.max(jnp.abs(out))) < 1e-3

    # without zero init the output is O(1)
    net2 = Unet(n_channels=16, side=14, init_last_layer_with_zeros=False)
    params2 = net2.init(jax.random.PRNGKey(1), t, x)
    out2 = net2.apply(params2, t, x)
    assert float(jnp.max(jnp.abs(out2))) > 1e-3


@pytest.mark.slow
def test_make_ctrl_builds_unet():
    """api.make_ctrl must build the UNet for *unet_zero_init model types
    (VERDICT r1 #1; reference benchmark_utils.py:31-38)."""
    from sde_sampler_lrds_tpu.api import make_ctrl
    from sde_sampler_lrds_tpu.models import ClippedCtrl, ScoreCtrl
    from sde_sampler_lrds_tpu.sde import VP
    from sde_sampler_lrds_tpu.targets import Gauss, IsotropicGauss

    dim = 16  # 4x4: the same architecture at test scale
    target = Gauss(dim=dim, loc=0.0, scale=1.0)
    prior = IsotropicGauss(dim=dim)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)

    ctrl = make_ctrl("unet_zero_init", dim, target, prior, sde)
    assert isinstance(ctrl, ClippedCtrl)
    assert isinstance(ctrl.base_model, Unet)
    t = jnp.full((2,), 0.5)
    x = jnp.zeros((2, dim))
    params = ctrl.init(jax.random.PRNGKey(0), t, x)
    assert ctrl.apply(params, t, x).shape == (2, dim)

    ctrl = make_ctrl("target_informed_unet_zero_init", dim, target, prior, sde)
    assert isinstance(ctrl, ScoreCtrl)
    assert isinstance(ctrl.base_model, Unet)
    params = ctrl.init(jax.random.PRNGKey(0), t, x)
    assert ctrl.apply(params, t, x).shape == (2, dim)

    with pytest.raises(ValueError, match="square"):
        make_ctrl("unet_zero_init", 5, target, prior, sde)


def test_make_ctrl_densenet():
    """base_arch='densenet' selects the DenseNet family
    (conf/model/base/densenet.yaml; VERDICT r1 #5/#8)."""
    from sde_sampler_lrds_tpu.api import make_ctrl
    from sde_sampler_lrds_tpu.models.mlp import DenseNet

    ctrl = make_ctrl("base_zero_init", 3, None, None, None, base_arch="densenet")
    assert isinstance(ctrl.base_model, DenseNet)
    t = jnp.full((2,), 0.5)
    x = jnp.zeros((2, 3))
    params = ctrl.init(jax.random.PRNGKey(0), t, x)
    assert ctrl.apply(params, t, x).shape == (2, 3)


@pytest.mark.slow
def test_unet_rds_short_training():
    """VP-RDS trains with the UNet control on a 4x4 image-shaped Gaussian:
    losses stay finite and decrease."""
    from sde_sampler_lrds_tpu.losses import EIReferenceSDELoss
    from sde_sampler_lrds_tpu.api import make_ctrl
    from sde_sampler_lrds_tpu.sde import VP, get_timesteps
    from sde_sampler_lrds_tpu.solvers import RDS
    from sde_sampler_lrds_tpu.solvers.base import TrainConfig
    from sde_sampler_lrds_tpu.targets import Gauss, IsotropicGauss

    dim = 16
    target = Gauss(dim=dim, loc=0.4, scale=0.8, n_reference_samples=4096)
    prior = IsotropicGauss(dim=dim)
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0)
    ctrl = make_ctrl("unet_zero_init", dim, target, prior, sde)
    cfg = TrainConfig(train_steps=30, train_batch_size=32, eval_batch_size=64,
                      lr=2e-3, eval_interval=1000, log_interval=10)
    solver = RDS(target, prior, sde, ctrl, EIReferenceSDELoss,
                 {"method": "lv", "max_rnd": 1e8},
                 train_ts=get_timesteps(0.0, 1.0, steps=8), cfg=cfg)
    solver.setup()
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        key, sub = jax.random.split(key)
        losses.append(float(solver.step(sub)["train/loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
