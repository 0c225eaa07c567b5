"""Optional Weights & Biases logging.

Re-design of sde_sampler/utils/wandb.py:15-93: gated on the package being
importable (the TPU image does not bundle it); run ids are hashed from the
output directory so preempted jobs resume into the same run — the
reference's SLURM auto-resume trick (scripts/main.py:49-53).
"""
from __future__ import annotations

import hashlib
from pathlib import Path


def check_wandb():
    try:
        import wandb  # noqa: F401

        return True
    except ImportError:
        return False


def run_id_from_out_dir(out_dir) -> str:
    """Deterministic id = sha256(out_dir) for preemption-safe resume."""
    return hashlib.sha256(str(Path(out_dir).resolve()).encode()).hexdigest()[:16]


def maybe_init_wandb(enabled: bool, out_dir, config: dict):
    if not enabled:
        return None
    if not check_wandb():
        import logging

        logging.warning("wandb requested but not installed; skipping.")
        return None
    import wandb

    return wandb.init(id=run_id_from_out_dir(out_dir), resume="allow",
                      config=config, dir=str(out_dir))


def wandb_log(run, metrics: dict, step: int):
    if run is None:
        return
    run.log({k: v for k, v in metrics.items() if isinstance(v, (int, float))},
            step=step)


def upload_ckpt_to_wandb(run, ckpt_path, keep_last_only: bool = True):
    """Checkpoint artifact upload with last-only GC (utils/wandb.py:55-93)."""
    if run is None:
        return
    import wandb

    artifact = wandb.Artifact(f"ckpt-{run.id}", type="checkpoint")
    artifact.add_file(str(ckpt_path))
    run.log_artifact(artifact, aliases=["latest"])
