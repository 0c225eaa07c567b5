"""Learning-rate and hyperparameter schedules.

Re-design of sde_sampler/solver/base.py:505-620:
  * optax schedule factories covering the conf/lr_scheduler presets
    (step / multi_step / pis);
  * MultiStepParams — the dotted-attribute hyperparameter scheduler that
    decays arbitrary solver fields (e.g. "loss.sde_ctrl_noise") at
    milestones;
  * CombinedScheduler grouping several of them.

The optax schedules feed TrainConfig.lr_schedule and run inside the jitted
step; MultiStepParams mutates host-side attributes between steps (matching
the reference semantics where scheduled values are Python-level knobs).
"""
from __future__ import annotations

import logging
from bisect import bisect_right
from collections import Counter
from collections.abc import MutableMapping, MutableSequence
from typing import Any

import optax


def step_lr(base_lr: float, step_size: int = 100, gamma: float = 0.95):
    """conf/lr_scheduler/step.yaml: lr · γ^(t // step_size)."""
    return optax.exponential_decay(base_lr, transition_steps=step_size,
                                   decay_rate=gamma, staircase=True)


def multi_step_lr(base_lr: float, milestones: list[int], gamma: float = 0.1):
    """conf/lr_scheduler/multi_step.yaml: decay by γ at each milestone."""
    return optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones})


def pis_lr(base_lr: float, train_steps: int, step_size: int = 100,
           final_factor: float = 0.02):
    """conf/lr_scheduler/pis.yaml: γ = final_factor^(step_size/train_steps)
    every step_size steps — total decay = final_factor over the run."""
    gamma = final_factor ** (step_size / train_steps)
    return optax.exponential_decay(base_lr, transition_steps=step_size,
                                   decay_rate=gamma, staircase=True)


def make_lr_schedule(name: str | None, base_lr: float, train_steps: int, **kwargs):
    if name is None:
        return None
    if name == "step":
        return step_lr(base_lr, **kwargs)
    if name == "multi_step":
        return multi_step_lr(base_lr,
                             kwargs.pop("milestones", [train_steps // 2]),
                             **kwargs)
    if name == "pis":
        return pis_lr(base_lr, train_steps, **kwargs)
    raise ValueError(f"Unknown lr schedule {name!r}")


class MultiStepParams:
    """Decay dotted attributes of an object at milestones (base.py:534)."""

    sep = "."

    def __init__(self, obj: Any, milestones: list[int], gammas: dict[str, float],
                 last_step: int = 0):
        self.obj = obj
        self.milestones = Counter(milestones)
        self.gammas = dict(gammas)
        self.base_values = {k: v for k, v in self.get().items() if v is not None}
        missing = set(self.gammas).difference(self.base_values)
        if missing:
            logging.warning("The keys %s are missing and cannot be scheduled.", missing)
            self.gammas = {k: self.gammas[k] for k in self.base_values}
        self.last_step = last_step
        self.update()

    def dotted_get(self, key: str, default=None):
        obj = self.obj
        for attr in key.split(self.sep):
            if isinstance(obj, MutableSequence):
                idx = int(attr)
                obj = obj[idx] if idx < len(obj) else default
            elif isinstance(obj, MutableMapping):
                obj = obj.get(attr, default)
            else:
                obj = getattr(obj, attr, default)
            if obj is default:
                return default
        return obj

    def get(self) -> dict[str, Any]:
        return {key: self.dotted_get(key) for key in self.gammas}

    def set(self, values: dict[str, Any]):
        for key in self.gammas:
            obj, attr = self.obj, key
            if self.sep in key:
                subkeys, attr = key.rsplit(self.sep, 1)
                obj = self.dotted_get(subkeys)
            if isinstance(obj, MutableSequence):
                obj[int(attr)] = values[key]
            elif isinstance(obj, MutableMapping):
                obj[attr] = values[key]
            else:
                setattr(obj, attr, values[key])

    def step(self):
        self.last_step += 1
        if self.last_step in self.milestones:
            values = {k: v * self.gammas[k] ** self.milestones[self.last_step]
                      for k, v in self.get().items()}
            self.set(values)

    def update(self):
        milestones = sorted(self.milestones.elements())
        values = {k: v * self.gammas[k] ** bisect_right(milestones, self.last_step)
                  for k, v in self.base_values.items()}
        self.set(values)

    def state_dict(self) -> dict:
        return {k: v for k, v in self.__dict__.items() if k != "obj"}

    def load_state_dict(self, state_dict: dict):
        self.__dict__.update(state_dict)
        self.update()


class CombinedScheduler:
    """Group MultiStepParams / schedule objects (base.py:505)."""

    def __init__(self, schedulers):
        self.schedulers = list(schedulers)

    def get(self) -> dict:
        output = {}
        for s in self.schedulers:
            if isinstance(s, MultiStepParams):
                output.update(s.get())
        return output

    def step(self):
        for s in self.schedulers:
            s.step()

    def state_dict(self) -> dict:
        return {i: s.state_dict() for i, s in enumerate(self.schedulers)}

    def load_state_dict(self, state_dict: dict):
        for i, s in enumerate(self.schedulers):
            s.load_state_dict(state_dict[i])
