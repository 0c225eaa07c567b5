"""TrainableWrapper protocol tests (additions/hacking.py parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from sde_sampler_lrds_tpu.losses import EIReferenceSDELoss
from sde_sampler_lrds_tpu.models import ClippedCtrl, FourierMLP
from sde_sampler_lrds_tpu.sde import VP, get_timesteps
from sde_sampler_lrds_tpu.solvers import RDS, TrainConfig
from sde_sampler_lrds_tpu.solvers.wrappers import (
    TrainableWrapper,
    TrainableWrapperWithIntermediates,
    list_of_dict_2_dict_of_list,
)
from sde_sampler_lrds_tpu.targets import Gauss, IsotropicGauss
import pytest


def make_solver(train_steps=24):
    target = Gauss(dim=2, loc=0.4, scale=1.1, n_reference_samples=5000)
    cfg = TrainConfig(train_steps=train_steps, train_batch_size=64,
                      eval_batch_size=256, eval_interval=10**9, log_interval=8,
                      lr=3e-3)
    return RDS(target, IsotropicGauss(dim=2), VP(),
               ClippedCtrl(base_model=FourierMLP(dim=2, channels=16, zero_init=True),
                           clip_model=1e4),
               EIReferenceSDELoss, {"method": "lv", "max_rnd": 1e8},
               train_ts=get_timesteps(0.0, 1.0, steps=8), cfg=cfg)


def test_list_of_dict_2_dict_of_list():
    out = list_of_dict_2_dict_of_list([{"a": 1, "b": 2}, {"a": 3, "b": 4}])
    assert out == {"a": [1, 3], "b": [2, 4]}


@pytest.mark.slow
def test_trainable_wrapper_run_with_eubo():
    wrapper = TrainableWrapper(make_solver())
    results, train_metrics = wrapper.run(jax.random.PRNGKey(0),
                                         keep_training_metrics=True)
    assert "eval/eubo" in results.metrics
    assert "eval/log_norm_const_is_f" in results.metrics
    assert "eval/norm_effective_sample_size_f" in results.metrics
    assert "eval/training_time" in results.metrics
    assert len(train_metrics["train/loss"]) == 24
    # forward log-Z bound >= IS estimate in expectation (EUBO sandwich);
    # here just check both are finite and ordered sanely for a near-trivial fit
    assert np.isfinite(results.metrics["eval/log_norm_const_is_f"])


@pytest.mark.slow
def test_wrapper_respects_steps_per_call():
    """With fused multi-step training (steps_per_call>1) the wrapper must
    stride its host loop, not call step() once per optimizer step."""
    solver = make_solver(train_steps=24)
    solver.cfg.steps_per_call = 8
    wrapper = TrainableWrapper(solver)
    results, train_metrics = wrapper.run(jax.random.PRNGKey(3),
                                         keep_training_metrics=True)
    # 24 optimizer steps / 8 per call = 3 host-side step() calls
    assert len(train_metrics["train/loss"]) == 3
    assert int(solver.state.step) == 24
    assert "eval/training_time" in results.metrics


@pytest.mark.slow
def test_wrapper_with_intermediates():
    wrapper = TrainableWrapperWithIntermediates(make_solver(train_steps=16))
    results, train_m, eval_m = wrapper.run(jax.random.PRNGKey(1), results_freq=8,
                                           n_seeds=2)
    assert len(train_m["train/loss"]) == 16
    assert len(eval_m["eval/elbo"]) == 2      # two snapshots
    assert len(eval_m["eval/elbo"][0]) == 2   # two seeds each


@pytest.mark.slow
def test_eubo_sandwich_on_trained_model():
    """After training on an easy Gaussian, EUBO (upper) and ELBO (lower)
    bracket log Z = 0 in expectation — allow finite-sample slack at this
    small eval batch / short training budget."""
    solver = make_solver(train_steps=200)
    solver.cfg.eval_batch_size = 1024
    wrapper = TrainableWrapper(solver)
    results = wrapper.run(jax.random.PRNGKey(2))
    elbo = results.metrics["eval/elbo"]
    eubo = results.metrics["eval/eubo"]
    assert elbo <= eubo + 0.25, (elbo, eubo)
    assert abs(results.log_norm_const_preds["log_norm_const_is"]) < 0.3
    assert abs(results.metrics["eval/log_norm_const_is_f"]) < 0.5


def test_forward_logz_shifts_with_target_normalization():
    """Adding a constant c to the target's unnormalized log-density raises
    log Z by c, so eval/log_norm_const_is_f must shift by +c (the old
    logsumexp(-rnd) form shifted by -c — invisible on log Z = 0 targets).
    Same keys both calls -> the shift is exact."""
    from sde_sampler_lrds_tpu.solvers.wrappers import evaluate_eubo
    from sde_sampler_lrds_tpu.utils.common import Results

    solver = make_solver()
    solver.setup()
    key = jax.random.PRNGKey(7)
    empty = lambda: Results(samples=None, weights=None, rnd=None,
                            log_norm_const_preds={}, ts=None, xs=None,
                            metrics={})
    r0 = evaluate_eubo(solver, empty(), solver.reference_log_prob, key)
    orig = solver.clipped_target_unnorm_log_prob
    c = 3.7
    solver.clipped_target_unnorm_log_prob = lambda x: orig(x) + c
    r1 = evaluate_eubo(solver, empty(), solver.reference_log_prob, key)
    np.testing.assert_allclose(
        r1.metrics["eval/log_norm_const_is_f"]
        - r0.metrics["eval/log_norm_const_is_f"], c, rtol=1e-5)
    # EUBO itself also shifts by +c (it estimates log Z + KL)
    np.testing.assert_allclose(r1.metrics["eval/eubo"]
                               - r0.metrics["eval/eubo"], c, rtol=1e-5)
    # ESS is shift-invariant
    np.testing.assert_allclose(r1.metrics["eval/norm_effective_sample_size_f"],
                               r0.metrics["eval/norm_effective_sample_size_f"],
                               rtol=1e-5)
