"""Public-API tests: the six-axis make_model factory, the dataset/reference
pipeline (mcmc_sample -> fit_gmm -> change_reference_type), tempering-path
SMC/RE baselines, and the TrainableWrapper benchmark protocol with EUBO."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.api import (
    fit_gmm,
    make_model,
    make_target,
    make_target_details,
    mcmc_sample,
    run_re_sampler,
    run_smc_sampler,
)
from sde_sampler_lrds_tpu.solvers.wrappers import TrainableWrapper
from sde_sampler_lrds_tpu.targets import TwoModes

TRAIN = {"train_steps": 12, "train_batch_size": 64, "eval_batch_size": 256}
TARGET = make_target_details("two_modes", dim=2)

# All make_model end-to-end configs are @slow (each ~15-30 s of compile on
# the 1-CPU CI budget — SURVEY.md §4); the default tier keeps the fast
# validation-rule and fit_gmm coverage, and test_solvers' defaults cover
# the flagship path.
_slow = pytest.mark.slow
CONFIGS = [
    ("vp-ref-em-lv", dict(solver_type="vp-ref", ref_type="default", loss_type="lv",
                          integrator_type="em", model_type="base_zero_init",
                          time_type="uniform"), _slow),
    ("vp-ref-ei-snr", dict(solver_type="vp-ref", ref_type="default", loss_type="lv",
                           integrator_type="ei", model_type="base_zero_init",
                           time_type="snr"), _slow),
    ("vp-ref-ddpm-snr", dict(solver_type="vp-ref", ref_type="default", loss_type="kl",
                             integrator_type="ddpm_like", model_type="base_zero_init",
                             time_type="snr"), _slow),
    ("pbm-ref-ei-snr", dict(solver_type="pbm-ref", ref_type="default", loss_type="lv",
                            integrator_type="ei", model_type="base_zero_init",
                            time_type="snr"), _slow),
    ("pis-orig", dict(solver_type="pis_orig", ref_type="default", loss_type="lv",
                      integrator_type="em", model_type="target_informed_zero_init",
                      time_type="uniform"), _slow),
    ("dds-orig", dict(solver_type="dds_orig", ref_type="default", loss_type="lv",
                      integrator_type="em", model_type="target_informed_zero_init",
                      time_type="uniform"), _slow),
    ("dis-orig", dict(solver_type="dis_orig", ref_type="default", loss_type="lv",
                      integrator_type="em", model_type="target_informed_lerp_tempering",
                      time_type="uniform"), _slow),
    # base_zero_init with CMCD needs force_base_zero_init — the api mirrors
    # the reference's inverted check (benchmark_utils.py:122)
    ("cmcd", dict(solver_type="cmcd", ref_type="default", loss_type="lv",
                  integrator_type="em", model_type="base_zero_init",
                  time_type="uniform", force_base_zero_init=True), _slow),
    ("vp-ref-langevin", dict(solver_type="vp-ref", ref_type="default", loss_type="kl",
                             integrator_type="em",
                             model_type="target_informed_langevin_init",
                             time_type="uniform"), _slow),
]


@pytest.mark.parametrize(
    "name,axes",
    [pytest.param(n, a, id=n, marks=[m] if m else []) for n, a, m in CONFIGS])
def test_make_model_trains(name, axes):
    model = make_model(**axes, solver_details={"sigma": 1.0}, target_details=TARGET,
                       training_details=TRAIN, n_steps=8,
                       compute_samples_based_metrics=False)
    model.setup()
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        m = model.step(sub)
    assert np.isfinite(float(m["train/loss"]))
    res = model.evaluate(jax.random.PRNGKey(1), return_traj=False)
    assert np.isfinite(res.metrics["eval/elbo"])


def test_make_model_validation_rules():
    kw = dict(solver_details={"sigma": 1.0}, target_details=TARGET,
              training_details=TRAIN, n_steps=4)
    with pytest.raises(ValueError):  # EI with orig solvers
        make_model("dds_orig", "default", "kl", "ei",
                   "target_informed_zero_init", "uniform", **kw)
    with pytest.raises(ValueError):  # PBM with uniform grid
        make_model("pbm-ref", "default", "kl", "em", "base_zero_init", "uniform", **kw)
    with pytest.raises(ValueError):  # DDPM with uniform grid
        make_model("vp-ref", "default", "kl", "ddpm_like", "base_zero_init", "uniform", **kw)
    with pytest.raises(ValueError):  # non-ref solver with a gmm reference
        make_model("pis_orig", "gmm", "kl", "em",
                   "target_informed_zero_init", "uniform", **kw)
    with pytest.raises(ValueError):  # langevin init with EI
        make_model("vp-ref", "default", "kl", "ei",
                   "target_informed_langevin_init", "snr", **kw)


@pytest.mark.slow
def test_full_lrds_pipeline_gmm_reference():
    """The LRDS flagship pipeline: MALA dataset -> sklearn GMM fit -> RDS with
    the fitted GMM reference -> short train -> wrapper eval with EUBO."""
    target = TwoModes(dim=2, n_reference_samples=16384)
    key = jax.random.PRNGKey(0)
    k_mcmc, k_run = jax.random.split(key)
    data = mcmc_sample(k_mcmc, target, x_init=target.loc, step_size=1e-2,
                       n_chains_per_mode=8, dataset_length=8000, n_warmup_steps=64)
    assert data.shape == (8000, 2)
    # dataset covers both modes
    mw = float(target.compute_mode_weight(data))
    assert 40.0 < mw < 90.0
    w, m, v = fit_gmm(2, data, em_type="diag")
    assert w.shape == (2,) and m.shape == (2, 2) and v.shape == (2, 2)
    model = make_model(
        "vp-ref", "gmm", "lv", "ei", "base_zero_init", "snr",
        solver_details={"sigma": 1.0, "weights_ref": w, "means_ref": m,
                        "variances_ref": v},
        target_details=make_target_details("two_modes", dim=2),
        training_details={"train_steps": 48, "train_batch_size": 256,
                          "eval_batch_size": 1024},
        n_steps=24, compute_samples_based_metrics=False)
    wrapper = TrainableWrapper(model)
    results = wrapper.run(k_run)
    assert "eval/eubo" in results.metrics
    assert "eval/log_norm_const_is_f" in results.metrics
    assert np.isfinite(results.metrics["eval/eubo"])
    # with a fitted 2-component reference the sampler covers both modes fast
    mw = float(target.compute_mode_weight(results.samples))
    assert 45.0 < mw < 90.0, f"mode weight {mw}"
    assert abs(results.log_norm_const_preds["log_norm_const_is"]) < 0.5


@pytest.mark.slow
def test_fit_gmm_full_covariance():
    key = jax.random.PRNGKey(2)
    data = jax.random.normal(key, (2000, 3)) * jnp.asarray([1.0, 2.0, 0.5])
    w, m, v = fit_gmm(2, data, em_type="full")
    assert v.shape == (2, 3, 3)


@pytest.mark.slow
@pytest.mark.parametrize("em_type", ["diag", "full"])
def test_fit_gmm_jax_matches_sklearn(em_type):
    """Device-resident EM (utils/gmm_fit.py) recovers the same mixture as the
    reference's sklearn fitter on a well-separated 2-component problem."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    a = jax.random.normal(k1, (3000, 4)) * 0.5 + jnp.asarray([3.0, 0.0, 0.0, 0.0])
    b = jax.random.normal(k2, (1500, 4)) * 0.8 - jnp.asarray([3.0, 0.0, 0.0, 0.0])
    data = jnp.concatenate([a, b])
    mi = jnp.asarray([[2.0, 0, 0, 0], [-2.0, 0, 0, 0]])
    w_j, m_j, v_j = fit_gmm(2, data, means_init=mi, em_type=em_type,
                            backend="jax")
    w_s, m_s, v_s = fit_gmm(2, data, means_init=mi, em_type=em_type,
                            backend="sklearn")
    np.testing.assert_allclose(np.asarray(w_j), np.asarray(w_s), atol=5e-3)
    np.testing.assert_allclose(np.asarray(m_j), np.asarray(m_s), atol=5e-2)
    diag_j = np.asarray(v_j if em_type == "diag"
                        else jnp.diagonal(v_j, axis1=-2, axis2=-1))
    diag_s = np.asarray(v_s if em_type == "diag"
                        else jnp.diagonal(v_s, axis1=-2, axis2=-1))
    np.testing.assert_allclose(diag_j, diag_s, rtol=0.05, atol=5e-2)


@pytest.mark.slow
def test_tempering_smc_and_re_baselines():
    target = TwoModes(dim=2, n_reference_samples=16384)
    mean = jnp.zeros(2)
    var = 4.0 * jnp.ones(2)
    s1 = run_smc_sampler(jax.random.PRNGKey(3), mean, var, n_steps=16,
                         step_size=0.05, n_particles=512, n_mcmc_steps=4,
                         n_warmup_mcmc_steps=8,
                         target_log_prob=target.unnorm_log_prob,
                         target_score=target.score)
    # full level-0 block: every MCMC slot, reference tuple-then-level [0][0]
    assert s1.shape == (4, 512, 2)
    mw = float(target.compute_mode_weight(s1.reshape(-1, 2)))
    assert 40.0 < mw < 95.0
    s2 = run_re_sampler(jax.random.PRNGKey(4), mean, var, n_steps=8,
                        step_size=0.05, batch_size=256, swap_frequency=4,
                        n_mcmc_steps=64, n_warmup_mcmc_steps=64,
                        target_log_prob=target.unnorm_log_prob,
                        target_score=target.score)
    assert s2.shape == (64, 256, 2)


def test_make_target_registry():
    for name in ("two_modes", "bracket_two_modes", "two_modes_full", "many_modes",
                 "rings", "checkerboard", "ionosphere"):
        details = make_target_details(name) if name != "ionosphere" \
            else make_target_details("ionosphere")
        t = make_target(details)
        assert t.dim >= 2
    pf = make_target(make_target_details("phi_four", dim=16))
    assert pf.dim == 16


@pytest.mark.slow
def test_make_model_gbs_inference_ctrl():
    """inference_ctrl_arch composes the GBS configuration: a dis_orig run
    with a learned (zero-init) inference control trains end-to-end and its
    divergence term reaches the loss (reference solver/oc.py:194-208)."""
    model = make_model("dis_orig", "default", "kl", "em",
                       "target_informed_zero_init", "uniform",
                       solver_details={"sigma": 1.0}, target_details=TARGET,
                       training_details=TRAIN, n_steps=8,
                       compute_samples_based_metrics=False,
                       inference_ctrl_arch="base_zero_init",
                       loss_details={"div_estimator": "rademacher"})
    assert model.inference_ctrl_module is not None
    model.setup()
    assert "inference" in model.state.params  # second net is trained
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        m = model.step(sub)
    assert np.isfinite(float(m["train/loss"]))
    res = model.evaluate(jax.random.PRNGKey(1), return_traj=False)
    assert np.isfinite(res.metrics["eval/elbo"])


def test_make_model_inference_ctrl_validation():
    kw = dict(solver_details={"sigma": 1.0}, target_details=TARGET,
              training_details=TRAIN, n_steps=4)
    with pytest.raises(ValueError):  # GBS only composes on dis_orig
        make_model("vp-ref", "default", "kl", "em", "base_zero_init",
                   "uniform", inference_ctrl_arch="base_zero_init", **kw)
    with pytest.raises(ValueError):  # arch must be a model-type enum value
        make_model("dis_orig", "default", "kl", "em",
                   "target_informed_zero_init", "uniform",
                   inference_ctrl_arch="mlp", **kw)


def test_make_model_rejects_sde_models_for_cmcd():
    kw = dict(solver_details={"sigma": 1.0}, target_details=TARGET,
              training_details=TRAIN, n_steps=4)
    for mt in ("target_informed_lerp_tempering", "target_informed_langevin_init"):
        with pytest.raises(ValueError, match="CMCD"):
            make_model("cmcd", "default", "kl", "em", mt, "uniform", **kw)
