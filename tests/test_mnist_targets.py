"""MixtureNice MNIST targets backed by the shipped per-digit flow
checkpoints (trained offline by scripts/train_nice.py --per-label)."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

DATA = Path(__file__).parents[1] / "data"
pytestmark = pytest.mark.skipif(
    not (DATA / "nice_label_0.msgpack").exists(),
    reason="per-digit NICE checkpoints not trained")

from sde_sampler_lrds_tpu.api import make_target, make_target_details


@pytest.mark.slow
def test_mnist_zero_one_target():
    target = make_target(make_target_details("mnist_zero_one"))
    assert target.dim == 196 and target.n_digits == 2
    s = target.sample(jax.random.PRNGKey(0), (64,))
    assert s.shape == (64, 196)
    # normalized samples live roughly in [-1, 1] (flow tails overshoot a bit)
    assert float(jnp.abs(s).max()) < 6.0
    lp = target.unnorm_log_prob(s)
    assert lp.shape == (64,) and bool(jnp.all(jnp.isfinite(lp)))
    # samples classify to the digits that generated them with sane frequencies
    counts = target.compute_mode_count(s)
    assert float(counts.sum()) == 64
    # unequilibrated 3:1 weights favor digit 0
    s_big = target.sample(jax.random.PRNGKey(1), (512,))
    counts = target.compute_mode_count(s_big)
    assert float(counts[0] / counts.sum()) > 0.55


@pytest.mark.slow
def test_mnist_full_mixture():
    target = make_target(make_target_details("mnist"))
    assert target.n_digits == 10
    s = target.sample(jax.random.PRNGKey(2), (32,))
    lp = target.unnorm_log_prob(s)
    assert bool(jnp.all(jnp.isfinite(lp)))
    # score is finite and matches autodiff
    score = target.score(s[:4])
    auto = jax.grad(lambda y: target.unnorm_log_prob(y).sum())(s[:4])
    np.testing.assert_allclose(np.asarray(score), np.asarray(auto),
                               rtol=5e-2, atol=5e-2)
