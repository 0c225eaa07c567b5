"""Training loop: jitted optax step with EMA and finite-guards, host-side
run loop with eval/log/checkpoint intervals.

Re-design of sde_sampler/solver/base.py:29-620. The reference's
zero_grad→backward→guard→step sequence (base.py:401-457) becomes ONE jitted
``train_step(state, key) -> (state, metrics)``: value_and_grad through the
trajectory scan, non-finite/max-loss/max-grad guards as jnp.where-masked
updates (no Python branching), optax transform + EMA tree update. The
particle axis is sharded over the device mesh; XLA inserts the psum for the
gradient mean.

Checkpointing serializes the TrainState pytree with flax.serialization
(orbax-compatible layout); metrics stream to ``{out_dir}/metrics.jsonl`` as
in the reference (base.py:96,173).
"""
from __future__ import annotations

import json
import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import serialization, struct

from ..parallel.mesh import batch_sharding, get_mesh, replicate
from ..utils.common import Results

CKPT_DIR = "ckpt"


class TrainState(struct.PyTreeNode):
    """Parameters + optimizer + EMA + counters, one replicated pytree."""

    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray
    n_skipped: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params),
                   ema_params=jax.tree.map(jnp.copy, params),
                   step=jnp.zeros((), jnp.int32), n_skipped=jnp.zeros((), jnp.int32))


@dataclass
class TrainConfig:
    """Flat config for the training loop (replaces the hydra cfg surface of
    conf/solver/basic_oc_base.yaml)."""

    train_steps: int = 10_000
    train_batch_size: int = 512
    eval_batch_size: int = 6000
    lr: float = 3e-4
    optimizer: str = "adam"
    grad_clip: float | None = None
    max_loss: float | None = None
    max_grad: float | None = None
    scale_loss: float | None = None
    use_ema: bool = False
    ema_decay: float = 0.995
    eval_interval: int = 500
    log_interval: int = 50
    # NOTE: train loops stride by steps_per_call; a train_steps that is not a
    # multiple of it truncates to the last full chunk.
    ckpt_interval: int | None = None
    seed: int = 0
    lr_schedule: Callable | None = None
    # number of optimizer steps fused into one jitted call (a lax.scan over
    # steps); >1 amortizes host dispatch latency — essential on runtimes with
    # a high per-call round trip and harmless elsewhere
    steps_per_call: int = 1
    # host-side hyperparameter schedule (solver/base.py:505-534 MultiStepParams
    # via conf/utils/scheduler.yaml): dotted solver attribute -> decay spec,
    # e.g. {"loss.sde_ctrl_noise": {"milestones": [5000], "gamma": 0.1}}.
    # The scheduled knobs are Python-level attributes baked into the jitted
    # step at trace time, so a milestone triggers ONE retrace; with
    # steps_per_call > 1, a mid-chunk milestone applies at the next chunk
    # boundary. The scheduled attribute must have a non-None starting value.
    param_schedule: dict | None = None
    # flat LV training (losses/rds.py lv_flat_call): 'auto' uses it whenever
    # the loss is a plain LV RDS loss on a linear SDE (gradient-identical to
    # the scan path; no backprop-through-scan, fused Pallas simulation on a
    # single-device TPU mesh); 'off' forces the reference-shaped scan path.
    flat_lv: str = "auto"
    # fused whole-trajectory eval (ops/fused_traj, TrainableDiff.evaluate):
    # 'auto' routes no-trajectory evals through the Pallas kernel on a
    # single-device TPU mesh when the config is in scope; 'off' forces the
    # scan; 'force' also allows non-TPU backends (interpret mode — tests).
    fused_eval: str = "auto"
    # fused KL training (losses/rds.py kl_fused_call + the custom-VJP
    # ops/fused_traj.fused_kl_traj): 'auto' uses it for plain-KL RDS losses
    # in fused-kernel scope on a single-device TPU mesh (f32 controls) —
    # Pallas forward, one adjoint scan backward, gradient-identical to the
    # scan path; 'off' forces the scan; 'force' also allows non-TPU
    # backends (interpret mode — tests).
    fused_kl: str = "auto"


class Solver:
    """Minimal solver shell: target, output dir, metrics logging
    (solver/base.py:29)."""

    def __init__(self, target, out_dir: str | Path | None = None,
                 eval_marginal_dims: tuple[int, ...] = (0,), sample_losses=None):
        self.target = target
        self.out_dir = Path(out_dir) if out_dir else None
        if self.out_dir:
            self.out_dir.mkdir(parents=True, exist_ok=True)
            (self.out_dir / CKPT_DIR).mkdir(exist_ok=True)
        self.eval_marginal_dims = list(eval_marginal_dims)
        self.sample_losses = sample_losses or {}

    def setup(self, key: jax.Array | None = None):
        self.target.compute_stats(key)

    def log_metrics(self, metrics: dict, step: int):
        record = {"step": step, **{k: _to_float(v) for k, v in metrics.items()}}
        if self.out_dir:
            with open(self.out_dir / "metrics.jsonl", "a") as f:
                f.write(json.dumps(record) + "\n")
        logging.info("step %d: %s", step,
                     {k: round(v, 5) for k, v in record.items() if isinstance(v, float)})


class Trainable(Solver):
    """Gradient-trained solver: builds the optimizer, the jitted sharded
    train step, and the host run loop (solver/base.py:257-502)."""

    def __init__(self, target, cfg: TrainConfig | None = None, mesh=None, **kwargs):
        super().__init__(target, **kwargs)
        self.cfg = cfg or TrainConfig()
        self.mesh = mesh if mesh is not None else get_mesh()
        self.state: TrainState | None = None
        self._train_step = None
        self.train_time = 0.0

    # -- subclass surface --------------------------------------------------
    def init_params(self, key: jax.Array):
        raise NotImplementedError

    def loss_fn(self, params, key: jax.Array):
        """Pure (params, key) -> (loss, metrics dict of scalars)."""
        raise NotImplementedError

    def evaluate(self, key: jax.Array, use_ema: bool = True) -> Results:
        raise NotImplementedError

    # -- optimizer ---------------------------------------------------------
    def make_optimizer(self) -> optax.GradientTransformation:
        lr = self.cfg.lr_schedule if self.cfg.lr_schedule is not None else self.cfg.lr
        if self.cfg.optimizer == "adam":
            tx = optax.adam(lr)
        elif self.cfg.optimizer == "sgd":
            tx = optax.sgd(lr)
        elif self.cfg.optimizer == "adamw":
            tx = optax.adamw(lr)
        else:
            raise ValueError(f"Unknown optimizer {self.cfg.optimizer}")
        if self.cfg.grad_clip is not None:
            tx = optax.chain(optax.clip_by_global_norm(self.cfg.grad_clip), tx)
        return tx

    # -- jitted step -------------------------------------------------------
    def build_train_step(self):
        tx = self.make_optimizer()
        cfg = self.cfg

        def train_step(state: TrainState, key: jax.Array):
            def wrapped(params):
                loss, metrics = self.loss_fn(params, key)
                if cfg.scale_loss is not None:
                    loss = loss * cfg.scale_loss
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(state.params)

            # Finite/magnitude guards -> masked (skipped) update
            # (solver/base.py:412-442 without Python branching).
            gnorm = optax.global_norm(grads)
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            if cfg.max_loss is not None:
                ok &= jnp.abs(loss) < cfg.max_loss
            if cfg.max_grad is not None:
                ok &= gnorm < cfg.max_grad
            safe_grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
            updates, new_opt = tx.update(safe_grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_params, state.params)
            new_opt = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_opt, state.opt_state)
            if cfg.use_ema:
                d = cfg.ema_decay
                new_ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                                       state.ema_params, new_params)
            else:
                new_ema = new_params
            new_state = state.replace(
                params=new_params, opt_state=new_opt, ema_params=new_ema,
                step=state.step + 1, n_skipped=state.n_skipped + (~ok).astype(jnp.int32))
            metrics = {"train/loss": loss, "train/grad_norm": gnorm, **metrics}
            return new_state, metrics

        n = self.cfg.steps_per_call
        if n <= 1:
            return jax.jit(train_step, donate_argnums=(0,))

        def multi_step(state: TrainState, key: jax.Array):
            keys = jax.random.split(key, n)
            state, metrics = jax.lax.scan(train_step, state, keys)
            # report the last step's metrics (matches the 1-step contract)
            return state, jax.tree.map(lambda m: m[-1], metrics)

        return jax.jit(multi_step, donate_argnums=(0,))

    # -- lifecycle ---------------------------------------------------------
    def setup(self, key: jax.Array | None = None):
        key = key if key is not None else jax.random.PRNGKey(self.cfg.seed)
        k_stats, k_init = jax.random.split(key)
        super().setup(k_stats)
        params = self.init_params(k_init)
        self.state = TrainState.create(params, self.make_optimizer())
        self.state = replicate(self.state, self.mesh)
        self._train_step = self.build_train_step()
        self._param_schedulers = self._build_param_schedulers()

    def _build_param_schedulers(self) -> list:
        if not self.cfg.param_schedule:
            return []
        from .schedulers import MultiStepParams

        out = []
        for dotted, spec in self.cfg.param_schedule.items():
            # fail loudly like the other --set paths: a typo'd key or spec
            # field silently disabling a 20k-step run's schedule is worse
            # than an upfront error
            if not isinstance(spec, dict) or "milestones" not in spec:
                raise ValueError(
                    f"param_schedule[{dotted!r}] needs a dict with "
                    f"'milestones' (got {spec!r})")
            unknown = set(spec) - {"milestones", "gamma"}
            if unknown:
                raise ValueError(
                    f"param_schedule[{dotted!r}]: unknown spec field(s) "
                    f"{sorted(unknown)}; valid: milestones, gamma")
            s = MultiStepParams(self, list(spec["milestones"]),
                                {dotted: spec.get("gamma", 0.1)})
            if dotted not in s.gammas:
                raise ValueError(
                    f"param_schedule key {dotted!r} does not resolve to a "
                    f"non-None attribute on this solver")
            out.append(s)
        return out

    def _advance_param_schedule(self, step: int) -> bool:
        """Fast-forward every hyperparameter schedule to `step`; True if a
        scheduled value changed (callers must rebuild the jitted step — the
        knobs are trace-time constants)."""
        changed = False
        for s in getattr(self, "_param_schedulers", []):
            before = s.get()
            s.last_step = step
            s.update()
            if s.get() != before:
                changed = True
        return changed

    def _on_scheduled_params_changed(self):
        self._train_step = self.build_train_step()
        cache = getattr(self, "_eval_jit_cache", None)
        if cache is not None:
            cache.clear()

    def step(self, key: jax.Array) -> dict:
        self.state, metrics = self._train_step(self.state, key)
        return metrics

    def run(self, eval_fn: Callable | None = None) -> dict:
        """Host loop: train with periodic eval/log/ckpt (solver/base.py:459)."""
        assert self.state is not None, "call setup() first"
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed + 1)
        last_metrics: dict = {}
        start = time.time()
        start_step = int(self.state.step)
        spc = max(cfg.steps_per_call, 1)
        # resume support: fast-forward schedules past already-trained steps
        if self._advance_param_schedule(start_step):
            self._on_scheduled_params_changed()
        for step_id in range(start_step + spc - 1, cfg.train_steps, spc):
            key, sub = jax.random.split(key)
            metrics = self.step(sub)
            if self._advance_param_schedule(step_id + 1):
                self._on_scheduled_params_changed()
            if (step_id + 1) % cfg.log_interval == 0:
                metrics = {k: _to_float(v) for k, v in metrics.items()}
                for s in getattr(self, "_param_schedulers", []):
                    metrics.update({f"sched/{k}": v for k, v in s.get().items()})
                metrics["train/time_per_step"] = (time.time() - start) / max(step_id + 1 - start_step, 1)
                metrics["train/n_skipped"] = int(self.state.n_skipped)
                self.log_metrics(metrics, step_id + 1)
                last_metrics.update(metrics)
            if (step_id + 1) % cfg.eval_interval == 0 or step_id + 1 == cfg.train_steps:
                key, sub = jax.random.split(key)
                eval_metrics = (eval_fn or self.eval_metrics)(sub)
                self.log_metrics(eval_metrics, step_id + 1)
                last_metrics.update(eval_metrics)
            if cfg.ckpt_interval and (step_id + 1) % cfg.ckpt_interval == 0:
                self.store_checkpoint()
        self.train_time = time.time() - start
        last_metrics["train/time"] = self.train_time
        return last_metrics

    def metrics_from_results(self, results: Results, key: jax.Array) -> dict:
        from ..eval.metrics import get_metrics

        metrics = dict(results.metrics)
        if results.samples is not None:
            k_gt = jax.random.fold_in(key, 7)
            metrics.update(get_metrics(
                self.target, results.samples, weights=results.weights,
                log_norm_const_preds=results.log_norm_const_preds,
                expectation_preds=results.expectation_preds,
                marginal_dims=self.eval_marginal_dims,
                sample_losses=self.sample_losses, sample_key=k_gt))
        return metrics

    def eval_metrics(self, key: jax.Array) -> dict:
        t0 = time.time()
        results = self.evaluate(key)
        metrics = self.metrics_from_results(results, key)
        metrics["eval/sample_time"] = time.time() - t0
        return metrics

    # -- checkpointing (solver/base.py:204-255) ----------------------------
    def save_attrs(self) -> dict:
        """Declarative checkpoint payload; subclasses extend (solver/base.py:204).

        Entries are flax-serializable pytrees (plus plain scalars/strings).
        `restore_attrs` is the mirror: it receives the msgpack-restored raw
        dict and must not rely on template structure matching, so subclasses
        can save variant-shaped payloads (e.g. RDS reference params)."""
        return {"state": self.state, "train_time": self.train_time}

    def restore_attrs(self, raw: dict):
        self.state = serialization.from_state_dict(self.state, raw["state"])
        self.train_time = float(raw["train_time"])

    def store_checkpoint(self, path: Path | None = None) -> Path:
        assert self.out_dir or path
        step = int(self.state.step)
        path = path or self.out_dir / CKPT_DIR / f"ckpt{step:06d}.msgpack"
        blob = serialization.to_bytes(self.save_attrs())
        path.write_bytes(blob)
        return path

    def latest_checkpoint(self) -> Path | None:
        if not self.out_dir:
            return None
        ckpts = sorted((self.out_dir / CKPT_DIR).glob("ckpt*.msgpack"),
                       key=lambda p: p.stat().st_mtime)
        return ckpts[-1] if ckpts else None

    def load_checkpoint(self, path: Path | None = None) -> bool:
        path = path or self.latest_checkpoint()
        if path is None:
            return False
        # msgpack_restore (not from_bytes) so the payload structure need not
        # match save_attrs() of the CURRENT solver — e.g. an RDS checkpoint
        # carries whatever reference params its ref_type has (solver/oc.py:634).
        raw = serialization.msgpack_restore(path.read_bytes())
        self.restore_attrs(raw)
        return True


def _to_float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
