"""Scheduler + profiling-hook tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_lrds_tpu.solvers.schedulers import (
    CombinedScheduler,
    MultiStepParams,
    make_lr_schedule,
    multi_step_lr,
    pis_lr,
    step_lr,
)


def test_step_lr():
    s = step_lr(1e-3, step_size=10, gamma=0.5)
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(25)), 2.5e-4, rtol=1e-6)


def test_multi_step_lr():
    s = multi_step_lr(1.0, milestones=[5, 15], gamma=0.1)
    assert float(s(0)) == 1.0
    np.testing.assert_allclose(float(s(6)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(16)), 0.01, rtol=1e-6)


def test_pis_lr_total_decay():
    s = pis_lr(1.0, train_steps=1000, step_size=100, final_factor=0.02)
    np.testing.assert_allclose(float(s(1000)), 0.02, rtol=1e-4)


def test_make_lr_schedule_registry():
    assert make_lr_schedule(None, 1e-3, 100) is None
    for name in ("step", "multi_step", "pis"):
        assert make_lr_schedule(name, 1e-3, 100) is not None


class Dummy:
    def __init__(self):
        self.lr = 1.0
        self.loss = type("L", (), {"sde_ctrl_noise": 0.4})()


def test_multi_step_params_dotted():
    obj = Dummy()
    sched = MultiStepParams(obj, milestones=[2, 4],
                            gammas={"lr": 0.1, "loss.sde_ctrl_noise": 0.5})
    for _ in range(2):
        sched.step()
    np.testing.assert_allclose(obj.lr, 0.1, rtol=1e-6)
    np.testing.assert_allclose(obj.loss.sde_ctrl_noise, 0.2, rtol=1e-6)
    for _ in range(2):
        sched.step()
    np.testing.assert_allclose(obj.lr, 0.01, rtol=1e-6)
    # state-dict round trip restores the schedule position
    state = sched.state_dict()
    obj2 = Dummy()
    sched2 = MultiStepParams(obj2, milestones=[2, 4], gammas={"lr": 0.1})
    sched2.load_state_dict(state)
    np.testing.assert_allclose(obj2.lr, 0.01, rtol=1e-6)


def test_combined_scheduler():
    obj = Dummy()
    c = CombinedScheduler([MultiStepParams(obj, [1], {"lr": 0.5})])
    c.step()
    np.testing.assert_allclose(obj.lr, 0.5, rtol=1e-6)
    assert "lr" in c.get()


@pytest.mark.slow
def test_lr_schedule_in_train_step():
    """An optax schedule wired through TrainConfig actually decays the lr."""
    from sde_sampler_lrds_tpu.losses import EMReferenceSDELoss
    from sde_sampler_lrds_tpu.models import ClippedCtrl, FourierMLP
    from sde_sampler_lrds_tpu.sde import VP, get_timesteps
    from sde_sampler_lrds_tpu.solvers import RDS
    from sde_sampler_lrds_tpu.solvers.base import TrainConfig
    from sde_sampler_lrds_tpu.targets import Gauss, IsotropicGauss

    target = Gauss(dim=2, loc=0.5, scale=1.0, n_reference_samples=1000)
    cfg = TrainConfig(train_steps=10, train_batch_size=32, eval_batch_size=64,
                      lr=1e-2, lr_schedule=step_lr(1e-2, step_size=2, gamma=0.1))
    solver = RDS(target, IsotropicGauss(dim=2), VP(),
                 ClippedCtrl(base_model=FourierMLP(dim=2, channels=16, zero_init=True),
                             clip_model=1e4),
                 EMReferenceSDELoss, {"method": "kl"},
                 train_ts=get_timesteps(0.0, 1.0, steps=4), cfg=cfg)
    solver.setup()
    m = solver.step(jax.random.PRNGKey(0))
    assert np.isfinite(float(m["train/loss"]))


def test_compiled_cost():
    from sde_sampler_lrds_tpu.utils.profiling import compiled_cost

    stats = compiled_cost(lambda x: (x @ x).sum(), jnp.ones((64, 64)))
    assert stats["flops"] > 0 or np.isnan(stats["flops"])  # backend-dependent


@pytest.mark.slow
def test_param_schedule_decays_in_run_loop():
    """cfg.param_schedule wires MultiStepParams into Trainable.run: the
    dotted loss attribute decays at its milestone mid-run and the decayed
    value reaches the simulated trajectories (solver/base.py:505-534,
    conf/utils/scheduler.yaml)."""
    from sde_sampler_lrds_tpu.losses import EMReferenceSDELoss
    from sde_sampler_lrds_tpu.models import ClippedCtrl, FourierMLP
    from sde_sampler_lrds_tpu.sde import VP, get_timesteps
    from sde_sampler_lrds_tpu.solvers import RDS
    from sde_sampler_lrds_tpu.solvers.base import TrainConfig
    from sde_sampler_lrds_tpu.targets import Gauss, IsotropicGauss

    cfg = TrainConfig(
        train_steps=8, train_batch_size=16, eval_batch_size=32, lr=1e-3,
        eval_interval=10**6, log_interval=2, steps_per_call=2,
        param_schedule={"loss.sde_ctrl_noise": {"milestones": [4], "gamma": 0.1}})
    target = Gauss(dim=2, loc=0.0, scale=1.0, n_reference_samples=500)
    solver = RDS(target, IsotropicGauss(dim=2), VP(),
                 ClippedCtrl(base_model=FourierMLP(dim=2, channels=8, zero_init=True),
                             clip_model=1e4),
                 EMReferenceSDELoss, {"method": "lv", "sde_ctrl_noise": 0.5},
                 train_ts=get_timesteps(0.0, 1.0, steps=4), cfg=cfg)
    solver.setup()
    assert solver.loss.sde_ctrl_noise == 0.5
    seen = []
    orig_step = solver.step

    def spying_step(key):
        seen.append(solver.loss.sde_ctrl_noise)
        return orig_step(key)

    solver.step = spying_step
    metrics = solver.run()
    # chunks start at steps 0,2,4,6: noise is 0.5 before the milestone and
    # 0.05 for the chunks after it
    np.testing.assert_allclose(seen, [0.5, 0.5, 0.05, 0.05], rtol=1e-6)
    np.testing.assert_allclose(solver.loss.sde_ctrl_noise, 0.05, rtol=1e-6)
    # logged alongside train metrics
    np.testing.assert_allclose(metrics["sched/loss.sde_ctrl_noise"], 0.05,
                               rtol=1e-6)


@pytest.mark.slow
def test_param_schedule_fast_forwards_on_resume():
    """A resumed run (state.step > 0) applies all milestones already passed
    before training continues."""
    from sde_sampler_lrds_tpu.losses import EMReferenceSDELoss
    from sde_sampler_lrds_tpu.models import ClippedCtrl, FourierMLP
    from sde_sampler_lrds_tpu.sde import VP, get_timesteps
    from sde_sampler_lrds_tpu.solvers import RDS
    from sde_sampler_lrds_tpu.solvers.base import TrainConfig
    from sde_sampler_lrds_tpu.targets import Gauss, IsotropicGauss

    cfg = TrainConfig(
        train_steps=6, train_batch_size=16, eval_batch_size=32, lr=1e-3,
        eval_interval=10**6, log_interval=10**6, steps_per_call=2,
        param_schedule={"loss.sde_ctrl_noise": {"milestones": [2], "gamma": 0.2}})
    target = Gauss(dim=2, loc=0.0, scale=1.0, n_reference_samples=500)

    def build():
        return RDS(target, IsotropicGauss(dim=2), VP(),
                   ClippedCtrl(base_model=FourierMLP(dim=2, channels=8,
                                                     zero_init=True),
                               clip_model=1e4),
                   EMReferenceSDELoss, {"method": "lv", "sde_ctrl_noise": 1.0},
                   train_ts=get_timesteps(0.0, 1.0, steps=4), cfg=cfg)

    first = build()
    first.setup()
    for _ in range(2):  # 4 optimizer steps -> past the milestone
        first.step(jax.random.PRNGKey(0))
    state = first.state

    resumed = build()
    resumed.setup()
    resumed.state = state
    assert resumed.loss.sde_ctrl_noise == 1.0  # fresh object, pre-schedule
    resumed.run()
    np.testing.assert_allclose(resumed.loss.sde_ctrl_noise, 0.2, rtol=1e-6)


def test_param_schedule_wiring_fast():
    """Default-tier coverage of the cfg.param_schedule wiring without a
    neural end-to-end run: a scalar Trainable whose loss closes over a
    scheduled attribute shows the decay at its milestone, the jitted-step
    rebuild (the knob is a trace-time constant), and resume fast-forward."""
    from types import SimpleNamespace

    from sde_sampler_lrds_tpu.solvers.base import Trainable, TrainConfig

    class ScalarSolver(Trainable):
        def __init__(self, cfg):
            target = SimpleNamespace(dim=1, compute_stats=lambda key=None: None)
            super().__init__(target, cfg=cfg)
            self.loss = SimpleNamespace(knob=8.0)

        def init_params(self, key):
            return {"w": jnp.zeros(())}

        def loss_fn(self, params, key):
            # the scheduled knob is closed over at trace time, like the
            # real losses' sde_ctrl_noise
            return (params["w"] - self.loss.knob) ** 2, {}

        def eval_metrics(self, key):
            return {}  # run() evals at the final step; nothing to measure

    cfg = TrainConfig(train_steps=6, train_batch_size=1, eval_batch_size=1,
                      lr=0.5, optimizer="sgd", eval_interval=10**6,
                      log_interval=2, steps_per_call=2,
                      param_schedule={"loss.knob": {"milestones": [2, 4],
                                                    "gamma": 0.5}})
    s = ScalarSolver(cfg)
    s.setup()
    knobs, steps = [], []
    orig = s.step

    def spy(key):
        knobs.append(s.loss.knob)
        steps.append(orig(key))
        return steps[-1]

    s.step = spy
    m = s.run()
    np.testing.assert_allclose(knobs, [8.0, 4.0, 2.0])
    np.testing.assert_allclose(m["sched/loss.knob"], 2.0)
    # gradient chased the CURRENT knob each chunk: with lr .5 the first
    # step lands on the target, so w tracks 8 -> 4 -> 2 decays exactly
    np.testing.assert_allclose(float(s.state.params["w"]), 2.0, rtol=1e-6)

    # resume fast-forward: fresh solver, pre-trained state past milestone 2
    s2 = ScalarSolver(cfg)
    s2.setup()
    s2.state = s.state.replace(step=jnp.asarray(3))
    assert s2.loss.knob == 8.0
    s2.run()
    np.testing.assert_allclose(s2.loss.knob, 2.0)


def test_param_schedule_reaches_ctrl_module_attrs():
    """conf/utils/scheduler.yaml's example schedules
    generative_ctrl.clip_model / clip_score; our flax control wrappers are
    mutable pre-bind and apply() re-binds from the dataclass fields, so the
    MultiStepParams mutation reaches the traced computation after the
    rebuild."""
    from types import SimpleNamespace

    from sde_sampler_lrds_tpu.models import ClippedCtrl, FourierMLP

    ctrl = ClippedCtrl(base_model=FourierMLP(dim=2, zero_init=True),
                       clip_model=1e4)
    host = SimpleNamespace(generative_ctrl=ctrl)
    sched = MultiStepParams(host, [1], {"generative_ctrl.clip_model": 1e-10})
    p = ctrl.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.ones((2, 2)))
    x = 100.0 * jnp.ones((2, 2))
    before = float(jnp.abs(ctrl.apply(p, jnp.zeros((2,)), x)).max())
    sched.step()
    np.testing.assert_allclose(host.generative_ctrl.clip_model, 1e4 * 1e-10)
    after = float(jnp.abs(ctrl.apply(p, jnp.zeros((2,)), x)).max())
    assert before > after
    np.testing.assert_allclose(after, 1e-6, rtol=1e-5)


def test_param_schedule_typo_raises():
    """A mistyped dotted key or spec field fails at setup, like the other
    --set override paths — never a silent no-op over a long run."""
    from types import SimpleNamespace

    from sde_sampler_lrds_tpu.solvers.base import Trainable, TrainConfig

    class S(Trainable):
        def __init__(self, cfg):
            target = SimpleNamespace(dim=1, compute_stats=lambda key=None: None)
            super().__init__(target, cfg=cfg)
            self.loss = SimpleNamespace(knob=1.0)

        def init_params(self, key):
            return {"w": jnp.zeros(())}

        def loss_fn(self, params, key):
            return params["w"] ** 2, {}

    def build(schedule):
        return S(TrainConfig(train_steps=2, param_schedule=schedule))

    with pytest.raises(ValueError, match="does not resolve"):
        build({"loss.knbo": {"milestones": [1]}}).setup()
    with pytest.raises(ValueError, match="unknown spec field"):
        build({"loss.knob": {"milestones": [1], "gammas": 0.1}}).setup()
    with pytest.raises(ValueError, match="milestones"):
        build({"loss.knob": {"gamma": 0.1}}).setup()
    build({"loss.knob": {"milestones": [1], "gamma": 0.1}}).setup()  # valid
