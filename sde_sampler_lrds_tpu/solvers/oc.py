"""Diffusion-based sampler algorithms: PIS, DDS, Bridge (DIS/GBS), CMCD, RDS.

Re-design of sde_sampler/solver/oc.py:22-666. Each algorithm is a thin
configuration over a loss family:

  PIS   (oc.py:349): Dirac prior; reference = the SDE marginal of the prior
        point; analytic inference control = the marginal score.
  DDS   (oc.py:426): Gaussian prior IS the reference.
  Bridge(oc.py:185): DIS / GBS — TimeReversal losses, optional learned
        inference control.
  CMCD  (oc.py:264): annealed-Langevin SDE built from prior/target scores.
  RDS   (oc.py:495): reference process switchable at runtime between
        default / fitted Gaussian / fitted GMM / frozen EBM
        (change_reference_type, oc.py:513).

The control network is a Flax module; ``ctrl_fn(params)`` binds it to the
current parameters so losses stay pure functions inside the jitted step.
"""
from __future__ import annotations

import logging
import time
from typing import Callable

import jax
import jax.numpy as jnp
from flax import serialization

from ..losses.base import compute_results
from ..parallel.mesh import constrain_batch
from ..sde.langevin import ControlledLangevinSDE, ControlledSDE
from ..sde.integrator import integrate_sde
from ..targets.base import Target, WrapperDistrNN
from ..targets.delta import Delta
from ..targets.gauss import Gauss, GaussFull
from ..utils.common import Results, clip_norm
from .base import Trainable, TrainConfig


class TrainableDiff(Trainable):
    """Shared machinery for diffusion samplers (solver/oc.py:22)."""

    eubo_available = True  # PIS/DDS disable (solver/oc.py:356,435)

    def __init__(self, target: Target, prior, sde, generative_ctrl,
                 loss_cls, loss_kwargs: dict | None = None,
                 train_ts=None, eval_ts=None, clip_target: float | None = None,
                 cfg: TrainConfig | None = None, **kwargs):
        super().__init__(target, cfg=cfg, **kwargs)
        self.prior = prior
        self.sde = sde
        self.generative_ctrl = generative_ctrl
        self.loss_cls = loss_cls
        self.loss_kwargs = dict(loss_kwargs or {})
        self.train_ts = train_ts
        self.eval_ts = eval_ts if eval_ts is not None else train_ts
        self.clip_target = clip_target
        self.loss = None
        self.setup_models()

    # -- model / loss wiring ----------------------------------------------
    def setup_models(self):
        self.loss_kwargs.setdefault("filter_samples", getattr(self.target, "filter", None))
        self.loss = self.loss_cls(sde=self.sde, **self.loss_kwargs)

    def init_params(self, key: jax.Array):
        x = jnp.zeros((2, self.target.dim))
        t = jnp.zeros((2,))
        return self.generative_ctrl.init(key, t, x)

    def ctrl_fn(self, params) -> Callable:
        return lambda t, x: self.generative_ctrl.apply(params, t, x)

    def ctrl_params(self, params):
        """The generative control's sub-pytree of the solver params (the
        fused-kernel plan builder consumes module params directly; Bridge
        nests them under 'generative')."""
        return params

    def clipped_target_unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        return clip_norm(self.target.unnorm_log_prob(x), self.clip_target)

    def loss_call_args(self, use_ema: bool = False) -> dict:
        """Terminal/initial/reference log-prob wiring per algorithm."""
        raise NotImplementedError

    # -- training / evaluation --------------------------------------------
    def loss_fn(self, params, key: jax.Array):
        k_prior, k_sim = jax.random.split(key)
        x = self.prior.sample(k_prior, (self.cfg.train_batch_size,))
        x = constrain_batch(x, self.mesh)
        if self._flat_lv_ok():
            return self.loss.lv_flat_call(
                k_sim, self.train_ts, x, self.ctrl_fn(params),
                traj_fn=self._flat_traj_fn(params), **self.loss_call_args())
        kl_fn = self._fused_kl_fn(params)
        if kl_fn is not None:
            return self.loss.kl_fused_call(
                k_sim, self.train_ts, x, self.ctrl_fn(params),
                traj_rnd_fn=kl_fn, **self.loss_call_args())
        loss, metrics = self.loss(k_sim, self.train_ts, x, self.ctrl_fn(params),
                                  **self.loss_call_args())
        return loss, metrics

    def _flat_lv_ok(self) -> bool:
        """Flat LV training path eligibility (lv_flat_call on the loss):
        gradient-identical restructuring that removes backprop-through-scan.
        ``TrainConfig.flat_lv='off'`` forces the reference-shaped scan;
        otherwise the loss decides (losses/base.py supports_flat_lv)."""
        mode = getattr(self.cfg, "flat_lv", "auto")
        if mode not in ("auto", "off"):
            raise ValueError(f"train.flat_lv must be 'auto' or 'off', "
                             f"got {mode!r}")
        if mode == "off":
            return False
        loss = self.loss
        return (getattr(loss, "lv_flat_call", None) is not None
                and loss.is_lv
                and loss.sde_ctrl_noise is None
                and loss.sde_ctrl_dropout is None
                and loss.supports_flat_lv(self.train_ts,
                                          frozenset(self.loss_call_args())))

    def _fused_kl_fn(self, params):
        """Differentiable fused-kernel trajectory for KL training
        (ops/fused_traj.fused_kl_traj): returns ``(x0, zs) -> (x_T, rnd)``
        or None when out of scope. Unlike ``_flat_traj_fn``, the plan is
        built from the TRACED params — build_plan's table extraction is
        differentiable jnp, so the custom VJP's table cotangents flow back
        to the param pytree. Scope: plain-KL RDS loss, fused-kernel
        structural scope, single-device mesh, f32 controls, TPU backend
        (or 'force' for interpret-mode tests)."""
        mode = getattr(self.cfg, "fused_kl", "auto")
        if mode not in ("auto", "off", "force"):
            raise ValueError(f"train.fused_kl must be 'auto', 'off' or "
                             f"'force', got {mode!r}")
        if mode == "off" or self.cfg.train_batch_size % self.mesh.size:
            return None
        if mode != "force" and jax.default_backend() != "tpu":
            return None
        loss = self.loss
        if (getattr(loss, "kl_fused_call", None) is None
                or not loss.supports_fused_kl(
                    self.train_ts, frozenset(self.loss_call_args()))):
            return None
        from ..ops.fused_traj import build_plan, fused_kl_traj

        try:
            plan = build_plan(loss, self.generative_ctrl,
                              self.ctrl_params(params), self.train_ts,
                              ito=getattr(loss, "fused_train_ito", True))
        except Exception:  # plan-builder crash ≠ legitimate out-of-scope
            logging.warning("fused traj plan builder raised; KL training "
                            "falls back to the scan simulation",
                            exc_info=True)
            return None
        if plan is None or plan[0].bf16:
            return None
        cfg, arrays = plan
        mesh = self.mesh if self.mesh.size > 1 else None
        return lambda x0, zs: fused_kl_traj(cfg, mesh, arrays, x0, zs)

    def _flat_traj_fn(self, params):
        """Fused-Pallas simulation for the flat LV path when the config is
        in kernel scope and the backend is TPU. On a multi-device mesh the
        kernel runs per shard under shard_map (a pallas_call does not
        SPMD-partition a sharded operand itself); None -> lv_flat_call
        simulates with the scan instead."""
        if jax.default_backend() != "tpu":
            return None
        if self.mesh.size > 1 and self.cfg.train_batch_size % self.mesh.size:
            return None
        from ..ops.fused_traj import (build_plan, fused_traj_states,
                                      fused_traj_states_sharded)

        try:
            plan = build_plan(self.loss, self.generative_ctrl,
                              jax.lax.stop_gradient(self.ctrl_params(params)),
                              self.train_ts)
        except Exception:  # plan-builder crash ≠ legitimate out-of-scope
            logging.warning("fused traj plan builder raised; training "
                            "falls back to the scan simulation",
                            exc_info=True)
            return None
        if plan is None:
            return None
        cfg, arrays = plan
        if self.mesh.size > 1:
            return lambda x0, zs: fused_traj_states_sharded(
                self.mesh, cfg, arrays, x0, zs)
        return lambda x0, zs: fused_traj_states(cfg, arrays, x0, zs)

    def train_path(self) -> str:
        """Which training path ``loss_fn`` resolves to for the CURRENT
        config/state — telemetry only (bench.py records it next to the
        timing so an artifact proves on its face which path ran):

          'flat_lv_fused'  flat LV restructuring, fused Pallas simulation
          'flat_lv_scan'   flat LV restructuring, scan simulation
          'kl_fused'       custom-VJP fused-kernel KL path
          'scan'           reference-shaped scan (solver/base.py:401-457)
        """
        params = self.state.params if getattr(self, "state", None) is not None \
            else self.init_params(jax.random.PRNGKey(0))
        if self._flat_lv_ok():
            return ("flat_lv_fused" if self._flat_traj_fn(params) is not None
                    else "flat_lv_scan")
        if self._fused_kl_fn(params) is not None:
            return "kl_fused"
        return "scan"

    def evaluate(self, key: jax.Array, use_ema: bool = True,
                 compute_weights: bool = True, return_traj: bool = False) -> Results:
        """Evaluation pass. ``return_traj`` defaults to False (the reference
        keeps trajectories by default, solver/oc.py:133 — here only the
        plotting paths ask for them, and dropping them keeps eval in scope
        for the fused whole-trajectory kernel). With ``return_traj=False``,
        a TPU backend, a single-device mesh, and an in-scope (loss, control,
        reference) triple, the pass runs through ops/fused_traj instead of
        the lax.scan — same estimator, on-core PRNG stream
        (TrainConfig.fused_eval: 'auto'|'off'|'force')."""
        params = self.state.ema_params if (use_ema and self.cfg.use_ema) else self.state.params
        if not return_traj and self._fused_eval_ok(params):
            return self._cached_eval(params, key, compute_weights, False,
                                     self._eval_sim_fused)
        return self._cached_eval(params, key, compute_weights, return_traj,
                                 self._eval_sim)

    def _eval_sim(self, params, key, compute_weights, return_traj):
        k_prior, k_sim = jax.random.split(key)
        x = self.prior.sample(k_prior, (self.cfg.eval_batch_size,))
        x = constrain_batch(x, self.mesh)
        return self.loss.eval(k_sim, self.eval_ts, x, self.ctrl_fn(params),
                              compute_weights=compute_weights,
                              return_traj=return_traj, **self.loss_call_args())

    def _fused_eval_ok(self, params) -> bool:
        """Fused-eval eligibility: TPU backend unless forced, batch
        divisible over the mesh (multi-device meshes run the kernel per
        shard under shard_map), and a (loss, control, reference) triple
        inside ops/fused_traj's scope. The scope probe builds (and
        discards) a plan, so the verdict is cached per mode alongside the
        eval jits — it is structural, not value-dependent, and the cache
        is dropped whenever the loss is rebuilt."""
        mode = getattr(self.cfg, "fused_eval", "auto")
        if mode not in ("auto", "off", "force"):
            raise ValueError(f"train.fused_eval must be 'auto', 'off' or "
                             f"'force', got {mode!r}")
        if mode == "off" or self.cfg.eval_batch_size % self.mesh.size:
            return False
        if mode != "force" and jax.default_backend() != "tpu":
            return False
        args = set(self.loss_call_args())
        if ("terminal_unnorm_log_prob" not in args
                or not args <= {"terminal_unnorm_log_prob",
                                "reference_log_prob", "initial_log_prob"}):
            return False
        cache = getattr(self, "_eval_jit_cache", None)
        if cache is None:
            cache = self._eval_jit_cache = {}
        ok = cache.get(("fused_ok", mode))
        if ok is None:
            from ..ops.fused_traj import build_plan

            try:
                ok = build_plan(self.loss, self.generative_ctrl,
                                self.ctrl_params(params),
                                self.eval_ts) is not None
            except Exception:  # crash ≠ legitimate out-of-scope
                logging.warning("fused traj plan builder raised; eval "
                                "falls back to the scan", exc_info=True)
                ok = False
            cache[("fused_ok", mode)] = ok
        return ok

    def _eval_sim_fused(self, params, key, compute_weights, return_traj):
        from ..ops.fused_traj import (build_plan, fused_simulate,
                                      fused_simulate_sharded)

        args = self.loss_call_args()
        k_prior, k_sim = jax.random.split(key)
        x = self.prior.sample(k_prior, (self.cfg.eval_batch_size,))
        # ito=compute_weights only matters for DDS, whose eval makes the
        # RND's u·z term optional (compute_ito_int=compute_weights)
        cfg, arrays = build_plan(self.loss, self.generative_ctrl,
                                 self.ctrl_params(params), self.eval_ts,
                                 ito=compute_weights)
        if self.mesh.size > 1:
            x = constrain_batch(x, self.mesh)
            samples, rnd = fused_simulate_sharded(self.mesh, cfg, arrays,
                                                  k_sim, x, **args)
        elif jax.default_backend() == "tpu":
            samples, rnd = fused_simulate(cfg, arrays, k_sim, x, **args)
        else:  # interpret mode ('force', tests): it lacks the on-core PRNG
            zs = jax.random.normal(
                k_sim, (self.eval_ts.shape[0] - 1, *x.shape))
            samples, rnd = fused_simulate(cfg, arrays, None, x, noise=zs,
                                          **args)
        return compute_results(rnd, compute_weights=compute_weights,
                               ts=self.eval_ts,
                               max_rnd=getattr(self.loss, "max_rnd", None),
                               samples=samples, xs=None)

    def _cached_eval(self, params, key, compute_weights, return_traj, sim):
        """One cached jit per (flags): repeated evals dispatch instead of
        re-tracing the full trajectory scan (minutes per call for the UNet).
        The cache is dropped whenever the loss is rebuilt
        (change_reference_type / _rebuild_loss)."""
        cache = getattr(self, "_eval_jit_cache", None)
        if cache is None:
            cache = self._eval_jit_cache = {}
        cache_key = (compute_weights, return_traj, sim.__name__)
        fn = cache.get(cache_key)
        if fn is None:
            fn = cache[cache_key] = jax.jit(
                lambda p, k: sim(p, k, compute_weights, return_traj))
        res = fn(params, key)
        res.metrics = {k: float(v) for k, v in res.metrics.items()}
        res.log_norm_const_preds = {
            k: float(v) for k, v in res.log_norm_const_preds.items()}
        return res

    def fused_eval_sampler(self, use_ema: bool = True, block_b: int = 2048):
        """Whole-trajectory fused Pallas eval sampler (ops/fused_traj): a
        jitted ``key -> (x_T, rnd)`` drawing ``eval_batch_size`` trajectories
        with the entire K-step loop fused into one TPU kernel per batch tile.
        Returns None when the (loss, control, reference) triple is outside
        the kernel's scope — callers fall back to the scan path. Plans are
        built per call (cheap) so they always see the current params."""
        from ..ops.fused_traj import (build_plan, fused_simulate,
                                      fused_simulate_sharded)

        params = self.state.ema_params if (use_ema and self.cfg.use_ema) \
            else self.state.params
        args = self.loss_call_args(use_ema=use_ema)
        if ("terminal_unnorm_log_prob" not in args
                or not set(args) <= {"terminal_unnorm_log_prob",
                                     "reference_log_prob",
                                     "initial_log_prob"}):
            return None
        if self.cfg.eval_batch_size % self.mesh.size:
            return None
        plan = build_plan(self.loss, self.generative_ctrl,
                          self.ctrl_params(params), self.eval_ts,
                          block_b=block_b)
        if plan is None:
            return None
        cfg, arrays = plan

        @jax.jit
        def sample(key):
            k_p, k_s = jax.random.split(key)
            x0 = self.prior.sample(k_p, (self.cfg.eval_batch_size,))
            if self.mesh.size > 1:  # kernel-per-shard over the data axis
                x0 = constrain_batch(x0, self.mesh)
                return fused_simulate_sharded(self.mesh, cfg, arrays, k_s,
                                              x0, **args)
            if jax.default_backend() != "tpu":
                # interpret mode lacks the on-core PRNG — draw host noise
                # (same fallback as _eval_sim_fused) so the returned sampler
                # honors the None-or-working contract off-TPU too
                zs = jax.random.normal(
                    k_s, (self.eval_ts.shape[0] - 1, *x0.shape))
                return fused_simulate(cfg, arrays, None, x0, noise=zs,
                                      **args)
            return fused_simulate(cfg, arrays, k_s, x0, **args)

        return sample

    def compute_eubo(self, key: jax.Array, x_target: jnp.ndarray,
                     use_ema: bool = True) -> jnp.ndarray:
        if not self.eubo_available or getattr(self.loss, "compute_eubo", None) is None:
            raise NotImplementedError(
                f"EUBO is not defined for {type(self).__name__} with "
                f"{type(self.loss).__name__} (e.g. the DDPM-like integrator "
                f"has no reverse pass)")
        params = self.state.ema_params if (use_ema and self.cfg.use_ema) else self.state.params
        return self.loss.compute_eubo(key, self.eval_ts, x_target,
                                      self.ctrl_fn(params), **self.loss_call_args())

    def sample_inference_traj(self, key: jax.Array, n: int) -> jnp.ndarray:
        """Noising trajectories from target samples for diagnostics/plots
        (solver/oc.py:163-180)."""
        k_t, k_sde = jax.random.split(key)
        x = self.target.sample(k_t, (n,))
        sde = getattr(self, "inference_sde", self.sde)
        return integrate_sde(sde, k_sde, self.eval_ts, x, return_traj=True)


class Bridge(TrainableDiff):
    """GBS / DIS (solver/oc.py:185). Optional learned inference control."""

    def __init__(self, *args, inference_ctrl=None, **kwargs):
        self.inference_ctrl_module = inference_ctrl
        super().__init__(*args, **kwargs)

    def setup_models(self):
        super().setup_models()
        self.inference_sde = self.sde
        if self.inference_ctrl_module is None and not isinstance(self.prior, Gauss):
            raise ValueError("Can only be used with Gaussian prior.")

    def init_params(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        params = {"generative": super().init_params(k1)}
        if self.inference_ctrl_module is not None:
            x = jnp.zeros((2, self.target.dim))
            params["inference"] = self.inference_ctrl_module.init(k2, jnp.zeros((2,)), x)
        return params

    def ctrl_fn(self, params) -> Callable:
        return lambda t, x: self.generative_ctrl.apply(params["generative"], t, x)

    def inference_ctrl_fn(self, params) -> Callable | None:
        if self.inference_ctrl_module is None:
            return None
        return lambda t, x: self.inference_ctrl_module.apply(params["inference"], t, x)

    def loss_call_args(self, use_ema: bool = False) -> dict:
        return {"terminal_unnorm_log_prob": self.clipped_target_unnorm_log_prob,
                "initial_log_prob": self.prior.log_prob}

    def ctrl_params(self, params):
        return params["generative"]

    def loss_fn(self, params, key: jax.Array):
        k_prior, k_sim = jax.random.split(key)
        x = self.prior.sample(k_prior, (self.cfg.train_batch_size,))
        x = constrain_batch(x, self.mesh)
        kwargs = self.loss_call_args()
        if self.inference_ctrl_module is not None:
            kwargs["inference_ctrl"] = self.inference_ctrl_fn(params)
            return self.loss(k_sim, self.train_ts, x, self.ctrl_fn(params),
                             **kwargs)
        if self._flat_lv_ok():
            return self.loss.lv_flat_call(
                k_sim, self.train_ts, x, self.ctrl_fn(params),
                traj_fn=self._flat_traj_fn(params), **kwargs)
        kl_fn = self._fused_kl_fn(params)
        if kl_fn is not None:
            return self.loss.kl_fused_call(
                k_sim, self.train_ts, x, self.ctrl_fn(params),
                traj_rnd_fn=kl_fn, **kwargs)
        return self.loss(k_sim, self.train_ts, x, self.ctrl_fn(params), **kwargs)

    def _fused_eval_ok(self, params) -> bool:
        # the kernel has no learned inference control; evals with one keep
        # the scan (TrainableDiff.evaluate handles the fused routing)
        if self.inference_ctrl_module is not None:
            return False
        return super()._fused_eval_ok(params)

    def fused_eval_sampler(self, use_ema: bool = True, block_b: int = 2048):
        if self.inference_ctrl_module is not None:
            return None
        return super().fused_eval_sampler(use_ema=use_ema, block_b=block_b)

    def _eval_sim(self, params, key, compute_weights, return_traj):
        k_prior, k_sim = jax.random.split(key)
        x = self.prior.sample(k_prior, (self.cfg.eval_batch_size,))
        x = constrain_batch(x, self.mesh)
        kwargs = self.loss_call_args()
        if self.inference_ctrl_module is not None:
            kwargs["inference_ctrl"] = self.inference_ctrl_fn(params)
        return self.loss.eval(k_sim, self.eval_ts, x, self.ctrl_fn(params),
                              compute_weights=compute_weights,
                              return_traj=return_traj, **kwargs)


class CMCD(TrainableDiff):
    """Controlled MC diffusion over the tempering path (solver/oc.py:264)."""

    def setup_models(self):
        if not isinstance(self.prior, (Gauss, GaussFull)):
            raise ValueError("Can only be used with gaussian prior.")
        if not isinstance(self.sde, ControlledLangevinSDE):
            # build the annealed-Langevin SDE from the prior/target scores.
            # clip_score=1e5 is the reference default
            # (conf/sde/controlled_langevin.yaml:4) and is load-bearing:
            # without it a single large-|x| excursion feeds an unclipped
            # tempering drift back into the trajectory and the LV training
            # diverges (TwoModes d=16, all seeds, ~step 1000 — round-5
            # repro /tmp/cmcd_variants vs the stable torch reference run).
            self.sde = ControlledLangevinSDE(
                target_score=self.target.score, prior_score=self.prior.score,
                diff_coeff=getattr(self.sde, "diff_coeff", 1.0),
                terminal_t=getattr(self.sde, "terminal_t", 1.0),
                clip_score=getattr(self.sde, "clip_score", None) or 1e5)
        self.inference_sde = self.sde
        super().setup_models()

    def update_prior(self, mean, var):
        """Refit the Gaussian base distribution (solver/oc.py:291)."""
        dim = mean.shape[0]
        if jnp.ndim(var) == 2:
            self.prior = GaussFull(dim=dim, loc=mean, cov=var)
        else:
            self.prior = Gauss(dim=dim, loc=mean, scale=jnp.sqrt(var))
        self.sde = ControlledLangevinSDE(
            target_score=self.target.score, prior_score=self.prior.score,
            diff_coeff=self.sde.diff_coeff, terminal_t=self.sde.terminal_t,
            clip_score=self.sde.clip_score)
        self.inference_sde = self.sde
        self.loss = self.loss_cls(sde=self.sde, **self.loss_kwargs)
        # cached eval jits (and the fused-eligibility verdict) close over
        # the pre-refit loss/SDE/prior — drop them, and rebuild the jitted
        # train step if training already started
        self._eval_jit_cache = {}
        if getattr(self, "state", None) is not None:
            self._train_step = self.build_train_step()

    def loss_call_args(self, use_ema: bool = False) -> dict:
        return {"terminal_unnorm_log_prob": self.clipped_target_unnorm_log_prob,
                "initial_log_prob": self.prior.log_prob}


class PIS(TrainableDiff):
    """Path integral sampler (solver/oc.py:349): Dirac prior, reference =
    the SDE marginal of the prior point."""

    eubo_available = False

    def setup_models(self):
        if not isinstance(self.prior, Delta):
            raise ValueError("Can only be used with dirac delta prior.")
        loc = self.prior.loc[0]
        T = self.sde.terminal_t
        self.reference_log_prob = lambda x: self.sde.marginal_log_prob(
            jnp.asarray(T), x, loc)
        self.inference_sde = ControlledSDE(self.sde, self.analytic_inference_ctrl)
        super().setup_models()

    def analytic_inference_ctrl(self, t, x):
        """g(t)·∇log(noised-prior marginal) (solver/oc.py:380)."""
        score = self.sde.marginal_score(t, x, self.prior.loc[0])
        return self.sde.diff(t, x) * jnp.clip(score, max=1e5)

    def loss_call_args(self, use_ema: bool = False) -> dict:
        return {"terminal_unnorm_log_prob": self.clipped_target_unnorm_log_prob,
                "reference_log_prob": self.reference_log_prob}


class DDS(TrainableDiff):
    """Denoising diffusion sampler (solver/oc.py:426): the Gaussian prior is
    the reference distribution."""

    eubo_available = False

    def setup_models(self):
        if not isinstance(self.prior, Gauss):
            raise ValueError("Can only be used with Gaussian prior.")
        self.reference_log_prob = self.prior.log_prob
        super().setup_models()

    def loss_call_args(self, use_ema: bool = False) -> dict:
        return {"terminal_unnorm_log_prob": self.clipped_target_unnorm_log_prob,
                "reference_log_prob": self.reference_log_prob}


class GaussianReferenceCtrl:
    """Time-t score of a noised Gaussian reference with a precompute protocol.

    ``precompute(t_grid)`` evaluates the noised marginal parameters for every
    grid time at once (vectorized scalar transcendentals); losses then feed
    the per-step parameter slices through the scan and call ``apply`` — no
    schedule scalars remain in the scan body (docs/ARCHITECTURE.md).
    Falls back to plain ``__call__(t, x)`` anywhere else.
    """

    def __init__(self, sde, x_init, var_init):
        self.sde = sde
        self.x_init = x_init
        self.var_init = var_init

    def __call__(self, t, x):
        return self.sde.marginal_score(t, x, self.x_init, var_init=self.var_init)

    def precompute(self, t_grid):
        import jax

        return jax.vmap(lambda t: self.sde.marginal_params(
            t, self.x_init, var_init=self.var_init))(t_grid)

    @staticmethod
    def apply(step_params, x):
        from ..targets.gauss import score_gauss, score_gauss_full

        loc, var = step_params
        if isinstance(var, tuple):
            return score_gauss_full(x, loc, None, precisions=var[0])
        if var.ndim == 2:
            return score_gauss_full(x, loc, var)
        return score_gauss(x, loc, var)


class GMMReferenceCtrl:
    """Time-t score of a noised GMM reference with a precompute protocol."""

    def __init__(self, sde, means, variances, weights):
        self.sde = sde
        self.means = means
        self.variances = variances
        self.weights = weights

    def __call__(self, t, x):
        return self.sde.marginal_gmm_score(t, x, self.means, self.variances,
                                           self.weights)

    def precompute(self, t_grid):
        import jax

        return jax.vmap(lambda t: self.sde.marginal_gmm_params(
            t, self.means, self.variances, self.weights))(t_grid)

    @staticmethod
    def apply(step_params, x):
        from ..targets.gauss import score_mog, score_mog_full

        w, m, v = step_params
        if isinstance(v, tuple):
            return score_mog_full(x, w, m, None, precisions=v[0],
                                  covariances_log_det=v[1])
        if v.ndim == 3:
            return score_mog_full(x, w, m, v)
        v = jnp.broadcast_to(v, m.shape)
        return score_mog(x, w, m, v)


class RDS(TrainableDiff):
    """Learned reference-based diffusion sampler (solver/oc.py:495)."""

    _nn_apply = None
    _nn_params = None
    _nn_eps = 1e-4

    def setup_models(self):
        self.inference_sde = self.sde
        self.change_reference_type(ref_type="default")
        self.loss_kwargs.setdefault("filter_samples", getattr(self.target, "filter", None))
        self._rebuild_loss()

    def _rebuild_loss(self):
        kwargs = dict(self.loss_kwargs)
        # pass the ctrl OBJECT so losses can use its precompute protocol
        kwargs["reference_ctrl"] = self.reference_score_t
        self.loss = self.loss_cls(sde=self.sde, **kwargs)
        self._eval_jit_cache = {}  # old jits close over the stale loss
        # a reference switch after training started must also retrace the
        # train step, whose closure holds the old reference tables
        if getattr(self, "state", None) is not None:
            self._train_step = self.build_train_step()

    def change_reference_type(self, ref_type: str = "default", net=None, eps=None,
                              mean=None, var=None, means=None, variances=None,
                              weights=None):
        """Install the reference process (solver/oc.py:513):
        'default' (prior-derived), 'gaussian', 'gmm', or 'nn' (frozen EBM)."""
        from ..sde.linear import VP, PinnedBM

        sde = self.sde
        if ref_type == "default":
            loc = jnp.reshape(self.prior.loc, (-1,))
            if isinstance(sde, VP):
                var0 = jnp.reshape(jnp.square(self.prior.scale), (-1,))
            elif isinstance(sde, PinnedBM):
                var0 = sde.terminal_t * sde.diff_coeff**2 * jnp.ones_like(loc)
            else:
                raise ValueError(f"Default reference for SDE type {type(sde)} unsupported.")
            self.reference_distr_utils = {"x_init": loc, "var_init": var0}
            self.reference_log_prob = lambda x: sde.marginal_log_prob(
                jnp.asarray(0.0), x, loc, var_init=var0)
            self.reference_score_t = GaussianReferenceCtrl(sde, loc, var0)
        elif ref_type == "gaussian":
            mean = jnp.asarray(mean, jnp.float32)
            var = tuple(jnp.asarray(v, jnp.float32) for v in var) \
                if isinstance(var, tuple) else jnp.asarray(var, jnp.float32)
            self.reference_distr_utils = {"x_init": mean, "var_init": var}
            self.reference_log_prob = lambda x: sde.marginal_log_prob(
                jnp.asarray(0.0), x, mean, var_init=var)
            self.reference_score_t = GaussianReferenceCtrl(sde, mean, var)
        elif ref_type == "gmm":
            means = jnp.asarray(means, jnp.float32)
            variances = tuple(jnp.asarray(v, jnp.float32) for v in variances) \
                if isinstance(variances, tuple) else jnp.asarray(variances, jnp.float32)
            weights = jnp.asarray(weights, jnp.float32)
            self.reference_distr_utils = {
                "means_init": means, "variances_init": variances, "weights_init": weights}
            self.reference_log_prob = lambda x: sde.marginal_gmm_log_prob(
                jnp.asarray(0.0), x, means, variances, weights)
            self.reference_score_t = GMMReferenceCtrl(sde, means, variances, weights)
        elif ref_type == "nn":
            # Two accepted forms (solver/oc.py:577-587):
            #   (score, log_prob)                — closures (t, x) -> ...; the
            #       EBM params are baked in and CANNOT be checkpointed.
            #   (score_apply, log_prob_apply, params) — pure apply fns
            #       (params, t, x) -> ...; params are a pytree serialized into
            #       checkpoints and restored via restore_attrs.
            if len(net) == 3:
                score_apply, log_prob_apply, params = net
                self._nn_apply = (score_apply, log_prob_apply)
                self._nn_params = params
                net_score = lambda t, x: score_apply(params, t, x)
                net_log_prob = lambda t, x: log_prob_apply(params, t, x)
            else:
                net_score, net_log_prob = net
                self._nn_apply = None
                self._nn_params = None
            self._nn_eps = float(eps if eps is not None else 1e-4)
            self.reference_distr_utils = {"net": net}
            wrapper = WrapperDistrNN(dim=self.target.dim,
                                     unnorm_log_prob_t=net_log_prob, t=self._nn_eps)
            self.reference_log_prob = wrapper.unnorm_log_prob
            self.reference_score_t = lambda t, x: net_score(
                jnp.broadcast_to(jnp.reshape(t, (-1,)), (x.shape[0],)), x)
        else:
            raise NotImplementedError(f"Reference type {ref_type!r} is unknown.")
        self.ref_type = ref_type
        if self.loss is not None:
            self._rebuild_loss()

    def reference_ctrl(self, t, x):
        return self.reference_score_t(t, x)

    def loss_call_args(self, use_ema: bool = False) -> dict:
        return {"terminal_unnorm_log_prob": self.clipped_target_unnorm_log_prob,
                "reference_log_prob": self.reference_log_prob}

    # -- checkpointing: persist the fitted reference (solver/oc.py:634-666) -
    def save_attrs(self) -> dict:
        attrs = super().save_attrs()
        ref = {"ref_type": self.ref_type}
        for k, v in self.reference_distr_utils.items():
            if k == "net":
                continue  # callables; the params pytree is saved below
            ref[k] = v
        if self.ref_type == "nn":
            ref["eps"] = self._nn_eps
            if self._nn_params is not None:
                ref["net_params"] = self._nn_params
        attrs["reference"] = ref
        return attrs

    def restore_attrs(self, raw: dict):
        super().restore_attrs(raw)
        ref = raw.get("reference")
        if ref is None:
            return  # pre-round-2 checkpoint without reference info
        ref_type = ref["ref_type"]
        if ref_type == "default":
            self.change_reference_type("default")
        elif ref_type == "gaussian":
            self.change_reference_type(
                "gaussian", mean=ref["x_init"], var=_maybe_tuple(ref["var_init"]))
        elif ref_type == "gmm":
            self.change_reference_type(
                "gmm", weights=ref["weights_init"], means=ref["means_init"],
                variances=_maybe_tuple(ref["variances_init"]))
        elif ref_type == "nn":
            if "net_params" not in ref:
                # saved from a closure-form net (no serializable params):
                # honour the documented workaround — if the user already
                # re-installed an 'nn' reference, keep it and only restore
                # the train state; raise only when nothing is installed
                if self.ref_type == "nn":
                    logging.warning(
                        "Checkpoint has ref_type='nn' with no serialized "
                        "params (closure-form net); keeping the currently "
                        "installed 'nn' reference.")
                    return
                raise ValueError(
                    "Checkpoint has ref_type='nn' but no serialized params: it "
                    "was saved from a closure-form net. Re-install the EBM via "
                    "change_reference_type('nn', net=...) before loading, "
                    "or save with the (score_apply, log_prob_apply, params) form.")
            if self._nn_apply is None:
                raise ValueError(
                    "Restoring an 'nn' reference needs the apply fns: install "
                    "the same EBM architecture via change_reference_type('nn', "
                    "net=(score_apply, log_prob_apply, init_params)) first, "
                    "then load_checkpoint() to restore the trained params.")
            params = serialization.from_state_dict(self._nn_params, ref["net_params"]) \
                if self._nn_params is not None else ref["net_params"]
            self.change_reference_type(
                "nn", net=(*self._nn_apply, params), eps=ref.get("eps"))
        else:
            raise NotImplementedError(f"Reference type {ref_type!r} in checkpoint.")


def _maybe_tuple(v):
    """Undo flax's tuple→{'0':…} state-dict encoding for variance payloads."""
    if isinstance(v, dict):
        return tuple(v[str(i)] for i in range(len(v)))
    if isinstance(v, (list, tuple)):
        return tuple(v)
    return v
