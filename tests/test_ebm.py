"""EBM-layer tests: tilted potentials, MLE/DAEBM/DRL trainers, score matching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.ebm import (
    DAEBM,
    DiffusionRecoveryLikelihood,
    MaximumLikelihoodEBM,
    PerfectScoreMatching,
    ScoreMatching,
    TargetScoreMatching,
)
from sde_sampler_lrds_tpu.models import FourierMLP, GMMTiltedPotential
from sde_sampler_lrds_tpu.sde import VP
from sde_sampler_lrds_tpu.targets import Gauss, GMM

MEANS = jnp.asarray([[-1.0, 0.5], [1.0, -0.5]])
VARS = jnp.asarray([[0.3, 0.5], [0.4, 0.2]])
WEIGHTS = jnp.asarray([0.6, 0.4])


def make_potential(sde, zero_init=True):
    return GMMTiltedPotential(
        base_model=FourierMLP(dim=2, channels=32, zero_init=zero_init),
        sde=sde, weights=WEIGHTS, means=MEANS, variances=VARS, tilt_type="dot")


@pytest.mark.slow
def test_gmm_tilted_potential_init_is_noised_gmm():
    """With a near-zero-init net the tilted score equals the exact noised-GMM
    score at every level (the whole point of the construction)."""
    sde = VP()
    pot = make_potential(sde)
    params = pot.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, 2)))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    for t in (0.05, 0.4, 0.9):
        tv = jnp.full((16,), t)
        score = pot.apply(params, tv, x)
        expected = sde.marginal_gmm_score(jnp.asarray(t), x, MEANS, VARS, WEIGHTS)
        np.testing.assert_allclose(np.asarray(score), np.asarray(expected),
                                   rtol=1e-3, atol=1e-3)
        lp = pot.apply(params, tv, x, method="unnorm_log_prob")
        expected_lp = sde.marginal_gmm_log_prob(jnp.asarray(t), x, MEANS, VARS, WEIGHTS)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(expected_lp),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_gmm_tilted_grad_consistency():
    """unnorm_log_prob_and_grad's grad equals autodiff of unnorm_log_prob."""
    sde = VP()
    pot = make_potential(sde, zero_init=False)
    params = pot.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, 2)))
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
    t = jnp.full((8,), 0.3)
    _, grad = pot.apply(params, t, x, method="unnorm_log_prob_and_grad")
    auto = jax.grad(lambda y: pot.apply(params, t, y, method="unnorm_log_prob").sum())(x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(auto), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_gmm_tilted_sample_prior():
    sde = VP()
    pot = make_potential(sde)
    params = pot.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, 2)))
    ts = jnp.full((5000,), 0.01)
    s = pot.apply(params, jax.random.PRNGKey(3), ts, method="sample_prior")
    assert s.shape == (5000, 2)
    mean = jnp.sum((WEIGHTS / WEIGHTS.sum())[:, None] * MEANS, axis=0)
    np.testing.assert_allclose(np.asarray(s.mean(0)), np.asarray(mean), atol=0.1)


@pytest.mark.slow
@pytest.mark.parametrize("sampler", ["annealed_mcmc", "smc", "replica_exchange", "cd"])
def test_mle_ebm_trains(sampler):
    sde = VP()
    target = GMM(dim=2, loc=MEANS, scale=jnp.sqrt(VARS), mixture_weights=WEIGHTS)
    prior = Gauss(dim=2, loc=0.0, scale=1.0)
    data = target.sample(jax.random.PRNGKey(4), (256,))
    pot = make_potential(sde)
    trainer = MaximumLikelihoodEBM(sde, prior, pot, sampler_type=sampler,
                                   step_sizes_per_noise=1e-2, n_steps=6,
                                   use_ula=(sampler == "cd"))
    losses, gnorms, diags = trainer.train(
        jax.random.PRNGKey(5), data, batch_size=32, n_epochs=2,
        initial_n_warmup_mcmc_steps=8, n_mcmc_steps=4)
    assert np.isfinite(losses).all()
    assert len(losses) >= 2


@pytest.mark.slow
def test_gmm_tilted_eig_covariances_match_dense():
    """Eigendecomposed full covariances (the cheap no-Cholesky noised-marginal
    path, sde/linear.py _factored_noised_mog) must agree with dense ones."""
    D, K, B = 12, 2, 64
    rng = np.random.default_rng(0)
    A = rng.normal(size=(K, D, D)) * 0.3
    v_dense = jnp.asarray(np.einsum("kij,kpj->kip", A, A) + np.eye(D)[None] * 0.5)
    eig, p = np.linalg.eigh(np.asarray(v_dense))
    sde = VP()
    m = jnp.asarray(rng.normal(size=(K, D)))
    w = jnp.asarray([0.6, 0.4])
    x = jnp.asarray(rng.normal(size=(B, D)))
    ts = jnp.asarray(rng.uniform(0.05, 0.95, size=(B,)))
    outs = []
    for v in (v_dense, (jnp.asarray(eig), jnp.asarray(p))):
        pot = GMMTiltedPotential(base_model=FourierMLP(dim=D, zero_init=False),
                                 sde=sde, weights=w, means=m, variances=v,
                                 tilt_type="dot")
        params = pot.init(jax.random.PRNGKey(1), jnp.zeros((2,)), jnp.zeros((2, D)))
        outs.append(pot.apply(params, ts, x, method="unnorm_log_prob_and_grad"))
    np.testing.assert_allclose(np.asarray(outs[0][0]), np.asarray(outs[1][0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(outs[0][1]), np.asarray(outs[1][1]),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("sampler", ["replica_exchange", "smc", "cd"])
def test_mle_ebm_fused_matches_unfused(sampler):
    """batches_per_call must not change the numerics (fold_in key schedule)."""
    sde = VP()
    target = GMM(dim=2, loc=MEANS, scale=jnp.sqrt(VARS), mixture_weights=WEIGHTS)
    prior = Gauss(dim=2, loc=0.0, scale=1.0)
    data = target.sample(jax.random.PRNGKey(4), (192,))

    def run(bpc):
        trainer = MaximumLikelihoodEBM(
            sde, prior, make_potential(sde), sampler_type=sampler,
            step_sizes_per_noise=1e-2, n_steps=4, use_ula=(sampler == "cd"))
        losses, gnorms, _ = trainer.train(
            jax.random.PRNGKey(5), data, batch_size=32, n_epochs=2,
            initial_n_warmup_mcmc_steps=4, n_mcmc_steps=4,
            batches_per_call=bpc)
        return losses, gnorms, trainer.params

    l1, g1, p1 = run(1)
    l4, g4, p4 = run(4)
    assert len(l1) == len(l4) > 2
    np.testing.assert_allclose(l1, l4, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(g1, g4, rtol=1e-5, atol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), p1, p4)


@pytest.mark.slow
def test_mle_ebm_gradient_accumulation():
    """A>1 reproduces the reference's accumulation (ebm_mle.py:702,785):
    negatives refresh every A batches, one optimizer step per group, and the
    fused scan matches batches_per_call=1 exactly."""
    sde = VP()
    target = GMM(dim=2, loc=MEANS, scale=jnp.sqrt(VARS), mixture_weights=WEIGHTS)
    prior = Gauss(dim=2, loc=0.0, scale=1.0)
    data = target.sample(jax.random.PRNGKey(4), (256,))

    def run(bpc):
        trainer = MaximumLikelihoodEBM(
            sde, prior, make_potential(sde), sampler_type="replica_exchange",
            step_sizes_per_noise=1e-2, n_steps=4)
        losses, gnorms, _ = trainer.train(
            jax.random.PRNGKey(5), data, batch_size=32, n_epochs=2,
            initial_n_warmup_mcmc_steps=4, n_mcmc_steps=4,
            n_accumulation_steps=3, batches_per_call=bpc,
            use_ema=True, ema_decay=0.9)
        return losses, trainer.params, trainer.ema_params

    l1, p1, e1 = run(1)
    l4, p4, e4 = run(4)
    assert np.isfinite(l1).all() and len(l1) == len(l4)
    np.testing.assert_allclose(l1, l4, rtol=1e-5, atol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), p1, p4)
    # EMA blends once per accumulation group (not per micro-step) and is
    # fusion-invariant too
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), e1, e4)
    leaves_p = jax.tree.leaves(p1)
    leaves_e = jax.tree.leaves(e1)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_p, leaves_e)), "EMA should lag params"
    with pytest.raises(ValueError):
        MaximumLikelihoodEBM(
            sde, prior, make_potential(sde), sampler_type="cd",
            step_sizes_per_noise=1e-2, n_steps=4, use_ula=True).train(
            jax.random.PRNGKey(5), data, batch_size=32, n_epochs=1,
            n_accumulation_steps=2)


@pytest.mark.slow
def test_daebm_trains():
    sde = VP()
    target = Gauss(dim=2, loc=0.5, scale=0.8)
    prior = Gauss(dim=2, loc=0.0, scale=1.0)
    data = target.sample(jax.random.PRNGKey(6), (256,))
    pot = make_potential(sde)
    trainer = DAEBM(sde, prior, pot, step_size=1e-2, persistent_size=128, n_steps=6)
    losses, diags = trainer.train(jax.random.PRNGKey(7), data, batch_size=32,
                                  n_epochs=1, initial_n_warmup_mcmc_steps=4,
                                  n_mcmc_steps=4, n_local_steps=2)
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_drl_trains():
    sde = VP()
    target = Gauss(dim=2, loc=0.5, scale=0.8)
    prior = Gauss(dim=2, loc=0.0, scale=1.0)
    data = target.sample(jax.random.PRNGKey(8), (256,))
    pot = make_potential(sde)
    trainer = DiffusionRecoveryLikelihood(sde, prior, pot, n_steps=6)
    losses, accs = trainer.train(jax.random.PRNGKey(9), data, batch_size=64,
                                 n_epochs=2, n_mcmc_steps=4)
    assert np.isfinite(losses).all()
    assert 0.0 <= np.mean(accs) <= 1.0


@pytest.mark.slow
def test_score_matching_learns_gaussian_score():
    """DSM on N(mu, v) data: the learned score at small t approaches the
    analytic noised score; ancestral samples match the data moments."""
    sde = VP()
    mu, var = 0.7, 0.6
    target = Gauss(dim=2, loc=mu, scale=float(np.sqrt(var)))
    prior = Gauss(dim=2, loc=0.0, scale=1.0)
    data = target.sample(jax.random.PRNGKey(10), (4096,))
    net = FourierMLP(dim=2, channels=64)
    sm = ScoreMatching(sde, prior, net, t_start=0.01, t_end=0.99, n_steps=32)
    losses = sm.train(jax.random.PRNGKey(11), data, batch_size=512, n_epochs=60,
                      lr=2e-3)
    assert losses[-5:].mean() < losses[:5].mean()
    samples = sm.sample(jax.random.PRNGKey(12), 4096)
    np.testing.assert_allclose(np.asarray(samples.mean(0)), [mu, mu], atol=0.15)
    # short training leaves the variance a bit diffuse; just require the
    # samples to have contracted well away from the prior N(0,1) toward 0.6
    assert float(samples.var(0).max()) < 1.0
    assert float(samples.var(0).min()) > 0.35


@pytest.mark.slow
def test_target_and_perfect_score_matching_losses():
    sde = VP()
    target = Gauss(dim=2, loc=0.5, scale=0.8)
    prior = Gauss(dim=2, loc=0.0, scale=1.0)
    data = target.sample(jax.random.PRNGKey(13), (512,))
    net = FourierMLP(dim=2, channels=32)
    tsm = TargetScoreMatching(target_score=target.score, sde=sde, prior=prior,
                              score_net=net, t_start=0.01, t_end=0.99, n_steps=8)
    losses = tsm.train(jax.random.PRNGKey(14), data, batch_size=128, n_epochs=3)
    assert np.isfinite(losses).all()
    mu = jnp.asarray([0.5, 0.5])
    v = jnp.asarray([0.64, 0.64])
    perfect = lambda t, y: sde.marginal_score(t[0], y, mu, var_init=v)
    psm = PerfectScoreMatching(perfect_score=perfect, sde=sde, prior=prior,
                               score_net=net, t_start=0.01, t_end=0.99, n_steps=8)
    losses = psm.train(jax.random.PRNGKey(15), data, batch_size=128, n_epochs=3)
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_mle_ebm_select_fn_tracks_best_checkpoint():
    """select_fn checkpoint selection: scored at (at most) every
    select_every steps; best_params/score/step hold the argmax, and
    best_params reproduce best_score when re-scored."""
    sde = VP()
    target = GMM(dim=2, loc=MEANS, scale=jnp.sqrt(VARS), mixture_weights=WEIGHTS)
    prior = Gauss(dim=2, loc=0.0, scale=1.0)
    data = target.sample(jax.random.PRNGKey(4), (256,))
    pot = make_potential(sde)
    trainer = MaximumLikelihoodEBM(sde, prior, pot, sampler_type="replica_exchange",
                                   step_sizes_per_noise=1e-2, n_steps=6)
    scores = []

    def select_fn(params):
        lw = pot.apply(params, jnp.full((128,), 1e-4), data[:128],
                       method="unnorm_log_prob") - target.unnorm_log_prob(data[:128])
        from sde_sampler_lrds_tpu.utils.common import normalized_ess
        ess = float(normalized_ess(lw))
        scores.append(ess)
        return ess

    trainer.train(jax.random.PRNGKey(5), data, batch_size=32, n_epochs=3,
                  initial_n_warmup_mcmc_steps=8, n_mcmc_steps=4,
                  batches_per_call=4, select_fn=select_fn, select_every=4)
    assert trainer.best_params is not None
    assert len(scores) >= 3
    assert trainer.best_score == pytest.approx(max(scores))
    # the stored params really are the ones that scored best
    assert select_fn(trainer.best_params) == pytest.approx(trainer.best_score,
                                                           rel=1e-6)


def test_negative_flatten_is_level_major(monkeypatch):
    """sample_negatives must flatten its (L, n_kept, B, D) buffer
    level-major so ts_neg = repeat(times, n_kept*B) labels every negative
    with its own noise level (a step-major swapaxes mislabeled levels for
    n_kept > 1). Checked for both the smc and cd branches by encoding the
    level into the sample values."""
    import sde_sampler_lrds_tpu.ebm.mle as mle_mod

    sde = VP()
    prior = Gauss(dim=2, loc=0.0, scale=1.0)
    pot = make_potential(sde)
    L, n_kept, B, D = 6, 3, 4, 2

    trainer = MaximumLikelihoodEBM(sde, prior, pot, sampler_type="smc",
                                   step_sizes_per_noise=1e-2, n_steps=L - 1)
    trainer.init_params(jax.random.PRNGKey(0), D)
    assert trainer.times.shape[0] == L

    def fake_smc(key, x_init, times, lpg, **kw):
        # value-code the level into every sample of that level
        lvl = jnp.arange(L, dtype=jnp.float32)[:, None, None, None]
        return (jnp.broadcast_to(lvl, (L, kw["n_mcmc_steps"], B, D)),
                kw["step_sizes_per_noise"], {})

    monkeypatch.setattr(mle_mod, "smc_sampler", fake_smc)
    xs_neg, _, _, _ = trainer.sample_negatives(
        trainer.params, jax.random.PRNGKey(1), B,
        jnp.full((L, 1), 1e-2), n_warmup=0, n_mcmc=n_kept)
    ts_neg_level = jnp.repeat(jnp.arange(L), xs_neg.shape[0] // L)
    np.testing.assert_array_equal(np.asarray(xs_neg[:, 0]),
                                  np.asarray(ts_neg_level, dtype=np.float32))

    # cd branch: positives are level-coded; ULA with step 0 keeps values
    trainer_cd = MaximumLikelihoodEBM(sde, prior, pot, sampler_type="cd",
                                      step_sizes_per_noise=0.0,
                                      n_steps=L - 1, use_ula=True,
                                      target_acceptance=-1.0)
    trainer_cd.init_params(jax.random.PRNGKey(0), D)
    xs_pos = jnp.repeat(jnp.arange(L, dtype=jnp.float32), B)[:, None]
    xs_pos = jnp.concatenate([xs_pos, xs_pos], axis=-1)
    xs_neg, _, _, _ = trainer_cd.sample_negatives(
        trainer_cd.params, jax.random.PRNGKey(1), B,
        jnp.full((L, B), 0.0), n_warmup=0, n_mcmc=n_kept, xs_pos=xs_pos)
    ts_neg_level = jnp.repeat(jnp.arange(L), xs_neg.shape[0] // L)
    np.testing.assert_allclose(np.asarray(xs_neg[:, 0]),
                               np.asarray(ts_neg_level, dtype=np.float32),
                               atol=1e-6)
