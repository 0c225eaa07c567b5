"""Train NICE flows on 14×14 digit images (the MNIST target pipeline).

Re-design of the reference's scripts/train_nice.py:17-231 in JAX/optax.
Produces data/nice.msgpack (and per-label checkpoints with --per-label, which
the reference never shipped — SURVEY.md §2.6 notes its data/ lacks them too).

Data source: torchvision MNIST when available locally, else sklearn's
load_digits (8×8, offline) bilinearly resized to 14×14 — same pipeline shape,
no network access needed.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from sde_sampler_lrds_tpu.targets.nice import NiceModel, save_nice_checkpoint  # noqa: E402

DATA_DIR = Path(__file__).parents[1] / "data"


def load_digit_images(source: str = "auto", label: int | None = None):
    """(N, 196) images in [0, 1] and (N,) labels."""
    if source in ("auto", "mnist"):
        try:
            from torchvision.datasets import MNIST  # type: ignore

            ds = MNIST(root=str(DATA_DIR / "mnist"), train=True, download=False)
            imgs = ds.data.numpy().astype(np.float32) / 255.0
            labels = ds.targets.numpy()
            from scipy.ndimage import zoom

            imgs = zoom(imgs, (1, 0.5, 0.5), order=1)
        except Exception:
            if source == "mnist":
                raise
            source = "sklearn_digits"
    if source == "sklearn_digits":
        from scipy.ndimage import zoom
        from sklearn.datasets import load_digits

        digits = load_digits()
        imgs = digits.images.astype(np.float32) / 16.0  # 8x8 in [0,1]
        imgs = zoom(imgs, (1, 14 / 8, 14 / 8), order=1)
        labels = digits.target
    imgs = imgs.reshape(imgs.shape[0], -1)
    if label is not None:
        imgs = imgs[labels == label]
        labels = labels[labels == label]
    return imgs, labels


def train_nice(data: np.ndarray, coupling: int = 4, mid_dim: int = 1000,
               hidden: int = 5, mask_config: int = 1, latent: str = "logistic",
               use_sigmoid: bool = False, alpha_sigmoid: float = 1e-5,
               batch_size: int = 256, n_steps: int = 5000, lr: float = 1e-3,
               seed: int = 0, center: bool = True, verbose: bool = True):
    """Maximum-likelihood training of a NiceModel; returns (meta, params, mean)."""
    dim = data.shape[-1]
    mean = data.mean(axis=0, keepdims=True) if center else np.zeros((1, dim), np.float32)
    data_c = jnp.asarray(data - mean, jnp.float32)
    meta = dict(coupling=coupling, in_out_dim=dim, mid_dim=mid_dim, hidden=hidden,
                mask_config=mask_config, latent=latent, use_dequant=False,
                use_sigmoid=use_sigmoid, alpha_sigmoid=alpha_sigmoid)
    model = NiceModel(**meta)
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = model.init(k_init, data_c[:2])
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, batch):
        def loss_fn(p):
            return -jnp.mean(model.apply(p, batch, method="log_prob"))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = data_c.shape[0]
    for step in range(n_steps):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (min(batch_size, n),), 0, n)
        params, opt_state, loss = update(params, opt_state, data_c[idx])
        if verbose and (step + 1) % 500 == 0:
            print(f"step {step + 1}: nll {float(loss):.3f}")
    meta["skip_centering"] = not center
    return meta, params, mean.reshape(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="auto", choices=["auto", "mnist", "sklearn_digits"])
    ap.add_argument("--per-label", action="store_true",
                    help="train one flow per digit (for MixtureNice)")
    ap.add_argument("--labels", type=int, nargs="*", default=list(range(10)))
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--mid-dim", type=int, default=1000)
    ap.add_argument("--hidden", type=int, default=5)
    ap.add_argument("--coupling", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    if args.per_label:
        for label in args.labels:
            imgs, _ = load_digit_images(args.source, label=label)
            print(f"label {label}: {imgs.shape[0]} images")
            meta, params, mean = train_nice(
                imgs, coupling=args.coupling, mid_dim=args.mid_dim,
                hidden=args.hidden, n_steps=args.steps,
                batch_size=args.batch_size, lr=args.lr)
            save_nice_checkpoint(DATA_DIR / f"nice_label_{label}.msgpack", meta, params)
            np.save(DATA_DIR / f"mnist_mean_label_{label}.npy", mean)
    else:
        imgs, _ = load_digit_images(args.source)
        print(f"{imgs.shape[0]} images")
        meta, params, mean = train_nice(
            imgs, coupling=args.coupling, mid_dim=args.mid_dim, hidden=args.hidden,
            n_steps=args.steps, batch_size=args.batch_size, lr=args.lr)
        save_nice_checkpoint(DATA_DIR / "nice.msgpack", meta, params)
        np.save(DATA_DIR / "mnist_mean_14.npy", mean)


if __name__ == "__main__":
    main()
