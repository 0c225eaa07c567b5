"""NICE flow tests: invertibility, change-of-variables log-prob, training on
offline digit data, Nice/MixtureNice target wrappers."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.targets.nice import (
    MixtureNice,
    Nice,
    NiceModel,
    load_nice_checkpoint,
    save_nice_checkpoint,
)


def _load_train_nice():
    """Import scripts/train_nice.py by explicit path (robust to cwd and to
    other namespace packages named `scripts` on sys.path)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "train_nice_script", Path(__file__).parents[1] / "scripts" / "train_nice.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.train_nice


def small_model(dim=8, use_sigmoid=False):
    return NiceModel(coupling=3, in_out_dim=dim, mid_dim=32, hidden=2,
                     mask_config=1, latent="logistic", use_sigmoid=use_sigmoid)


def test_f_g_inverse():
    model = small_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    z, _ = model.apply(params, x, method="f")
    x_rec = model.apply(params, z, method="g")
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec), atol=1e-5)


@pytest.mark.slow
def test_log_det_matches_autodiff_jacobian():
    """The analytic log-det (sum of scales) equals the autodiff Jacobian."""
    model = small_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)).repeat(2, 1))
    model4 = NiceModel(coupling=3, in_out_dim=4, mid_dim=16, hidden=2,
                      mask_config=1, latent="logistic")
    params = model4.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4))
    _, log_det = model4.apply(params, x, method="f")
    jac = jax.jacobian(lambda y: model4.apply(params, y[None], method="f")[0][0])(x[0])
    _, logdet_auto = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(float(log_det[0]), float(logdet_auto),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_nice_training_improves_likelihood(tmp_path):
    """Train a small NICE on a 2-mode 8-D dataset; NLL decreases, samples
    match moments, checkpoint round-trips through Nice."""
    train_nice = _load_train_nice()

    rng = np.random.default_rng(0)
    data = np.concatenate([
        rng.normal(0.3, 0.05, (2000, 8)), rng.normal(0.7, 0.05, (2000, 8))
    ]).astype(np.float32)
    meta, params, mean = train_nice(data, coupling=3, mid_dim=64, hidden=2,
                                    use_sigmoid=False, n_steps=600, batch_size=256,
                                    verbose=False)
    model = NiceModel(**{k: v for k, v in meta.items() if k != "skip_centering"})
    lp = model.apply(params, jnp.asarray(data[:256] - mean), method="log_prob")
    init_params = model.init(jax.random.PRNGKey(123), jnp.zeros((2, 8)))
    lp_init = model.apply(init_params, jnp.asarray(data[:256] - mean), method="log_prob")
    assert float(lp.mean()) > float(lp_init.mean()) + 3.0  # training helped
    # checkpoint round trip + Nice wrapper (dim != 196 path via explicit model)
    ckpt = tmp_path / "nice_test.msgpack"
    save_nice_checkpoint(ckpt, meta, params)
    meta2, params2 = load_nice_checkpoint(ckpt.read_bytes())
    lp2 = model.apply(params2, jnp.asarray(data[:256] - mean), method="log_prob")
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), rtol=1e-5)


@pytest.mark.slow
def test_mixture_nice_two_flows(tmp_path):
    """MixtureNice over two small flows: normalized mixture log-prob, score
    via autodiff consistency, digit classification."""
    train_nice = _load_train_nice()

    rng = np.random.default_rng(1)
    flows = []
    for c, center in enumerate([0.25, 0.75]):
        data = rng.normal(center, 0.05, (1500, 8)).astype(np.float32)
        meta, params, mean = train_nice(data, coupling=3, mid_dim=48, hidden=2,
                                        use_sigmoid=False, n_steps=400,
                                        batch_size=256, verbose=False)
        model = NiceModel(**{k: v for k, v in meta.items() if k != "skip_centering"})
        nice = Nice.__new__(Nice)
        # minimal manual init to use a non-196-dim flow
        from sde_sampler_lrds_tpu.targets.base import Target

        Target.__init__(nice, dim=8, log_norm_const=0.0, n_reference_samples=1024)
        nice.shape = (8,)
        nice.mean = jnp.asarray(mean[None])
        nice.model = model
        nice.params = params
        flows.append(nice)
    mix = MixtureNice(nice_dists=flows, digits=(0, 1), dim=8, normalize=True,
                      local_minimums=jnp.zeros((2, 8)))
    x = 2.0 * (jnp.asarray(rng.normal(0.5, 0.2, (32, 8)).astype(np.float32)) - 0.5)
    lp = mix.unnorm_log_prob(x)
    assert lp.shape == (32,) and bool(jnp.all(jnp.isfinite(lp)))
    score = mix.score(x)
    auto = jax.grad(lambda y: mix.unnorm_log_prob(y).sum())(x)
    np.testing.assert_allclose(np.asarray(score), np.asarray(auto), rtol=2e-2, atol=2e-2)
    s = mix.sample(jax.random.PRNGKey(3), (512,))
    assert s.shape == (512, 8)
    counts = mix.compute_mode_count(s)
    # unequilibrated weights 3:1
    assert float(counts[0] / counts.sum()) > 0.5
