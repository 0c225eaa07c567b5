"""Pallas Sinkhorn tile kernel (ops/sinkhorn_lse) vs dense references.

The kernel fuses the pairwise-cost tile and the online logsumexp (the N2
native-equivalent component, SURVEY.md §2.3); off-TPU it runs in interpret
mode, so these tests check exact semantics: padding/masking correctness,
p = 1/2/3 cost branches, and end-to-end agreement of the 'pallas' backend
with the blocked-XLA backend on identical duals.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.eval.sinkhorn import Sinkhorn, _pairwise_m
from sde_sampler_lrds_tpu.ops.sinkhorn_lse import (pallas_lse,
                                                   pallas_transport_cost)


def _dense_lse(x, y, dual, eps, p):
    m = _pairwise_m(x, y, p)
    return jax.scipy.special.logsumexp((-m + dual[None, :]) / eps, axis=1)


@pytest.mark.parametrize("p", [1, 2, 3])
@pytest.mark.parametrize("n,m,d", [(64, 64, 2), (100, 130, 3)])
def test_pallas_lse_matches_dense(p, n, m, d):
    kx, ky, kd = jax.random.split(jax.random.PRNGKey(p * 100 + n), 3)
    x = jax.random.normal(kx, (n, d))
    y = 0.5 * jax.random.normal(ky, (m, d)) + 0.3
    dual = 0.1 * jax.random.normal(kd, (m,))
    for eps in (1.0, 0.05):
        got = pallas_lse(x, y, dual, eps, p=p, bn=32, bm=128)
        want = _dense_lse(x, y, dual, eps, p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_pallas_lse_masks_neg_inf_duals():
    """−inf dual entries (the padding mask) drop those columns exactly."""
    x = jax.random.normal(jax.random.PRNGKey(0), (40, 2))
    y = jax.random.normal(jax.random.PRNGKey(1), (50, 2))
    dual = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (50,))
    dual = dual.at[37:].set(-jnp.inf)
    got = pallas_lse(x, y, dual, 0.1, p=2, bn=16, bm=128)
    want = _dense_lse(x, y[:37], dual[:37], 0.1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pallas_lse_multi_tile_accumulation():
    """Column count spanning several tiles exercises the online-LSE rescale."""
    x = jax.random.normal(jax.random.PRNGKey(3), (24, 4))
    y = jax.random.normal(jax.random.PRNGKey(4), (700, 4))
    dual = jax.random.normal(jax.random.PRNGKey(5), (700,))
    got = pallas_lse(x, y, dual, 0.3, p=2, bn=8, bm=128)
    want = _dense_lse(x, y, dual, 0.3, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("p", [1, 2])
def test_pallas_transport_cost_matches_dense(p):
    kx, ky, ku, kv = jax.random.split(jax.random.PRNGKey(7 + p), 4)
    n, m, d = 60, 90, 3
    x = jax.random.normal(kx, (n, d))
    y = jax.random.normal(ky, (m, d))
    eps = 0.5
    u = 0.1 * jax.random.normal(ku, (n,))
    v = 0.1 * jax.random.normal(kv, (m,))
    got = pallas_transport_cost(x, y, u, v, eps, p=p, bn=16, bm=128)
    mat = _pairwise_m(x, y, p)
    want = jnp.sum(jnp.exp((-mat + u[:, None] + v[None, :]) / eps) * mat)
    np.testing.assert_allclose(float(got), float(want), rtol=3e-5)


def test_sinkhorn_pallas_backend_matches_xla():
    """Full scaling loop: the 'pallas' backend reproduces the blocked-XLA
    distance (identical deterministic dual iterations)."""
    kx, ky = jax.random.split(jax.random.PRNGKey(11))
    x = jax.random.normal(kx, (96, 2))
    y = jax.random.normal(ky, (80, 2)) + 0.5
    sk_ref = Sinkhorn(p=2, eps=1e-2, max_iters=40, backend="xla")
    sk_pal = Sinkhorn(p=2, eps=1e-2, max_iters=40, backend="pallas")
    d_ref = float(sk_ref(x, y))
    d_pal = float(sk_pal(x, y))
    np.testing.assert_allclose(d_pal, d_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sinkhorn_pallas_backend_with_weights():
    kx, ky, kw = jax.random.split(jax.random.PRNGKey(13), 3)
    x = jax.random.normal(kx, (70, 3))
    y = jax.random.normal(ky, (50, 3))
    w_x = jax.nn.softmax(jax.random.normal(kw, (70,)))
    sk_ref = Sinkhorn(p=2, eps=1e-2, max_iters=30, backend="xla")
    sk_pal = Sinkhorn(p=2, eps=1e-2, max_iters=30, backend="pallas")
    d_ref = float(sk_ref(x, y, w_x=w_x))
    d_pal = float(sk_pal(x, y, w_x=w_x))
    np.testing.assert_allclose(d_pal, d_ref, rtol=1e-4, atol=1e-5)
