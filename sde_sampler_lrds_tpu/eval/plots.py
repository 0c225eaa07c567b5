"""Diagnostic plots: contours, 1-D/2-D marginals (plain + IS-reweighted),
trajectory evolution.

Re-design of sde_sampler/eval/plots.py:29-281 in pure matplotlib (plotly is
not available in the TPU image); all histogramming is numpy on host — the
device never touches plotting.
"""
from __future__ import annotations

import itertools
import logging
from pathlib import Path
from typing import Callable

import numpy as np

import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot as plt  # noqa: E402


def plot_contours_2d(log_prob: Callable, domain, nbins: int = 200,
                     levels: int = 50, thresh: float = -1000.0, ax=None):
    """Contours of a 2-D log-density over the box domain (plots.py:29)."""
    import jax.numpy as jnp

    if ax is None:
        _, ax = plt.subplots(1)
    d = np.asarray(domain)
    x = np.linspace(d[0, 0], d[0, 1], nbins)
    y = np.linspace(d[1, 0], d[1, 1], nbins)
    xg, yg = np.meshgrid(x, y, indexing="ij")
    xy = jnp.asarray(np.stack([xg, yg], axis=-1).reshape(-1, 2), jnp.float32)
    lp = np.asarray(log_prob(xy)).reshape(nbins, nbins).clip(min=thresh)
    ax.contour(xg, yg, lp, levels=levels)
    ax.set_ylabel(r"$x_1$")
    ax.set_xlabel(r"$x_2$")
    return ax.get_figure()


def plot_marginal_2d(x, dim1: int = 0, dim2: int = 1, weights=None,
                     nbins: int = 100, domain=None, smoothing: float = 0.1,
                     ax=None, scatter: bool = False):
    """2-D marginal heatmap (plots.py:51/88)."""
    from scipy.ndimage import gaussian_filter

    data = np.asarray(x)[:, [dim1, dim2]]
    if ax is None:
        _, ax = plt.subplots(1, 1)
    rng = None
    if domain is not None:
        d = np.asarray(domain)
        rng = [d[dim1].tolist(), d[dim2].tolist()]
    w = None if weights is None else np.asarray(weights)
    heatmap, binsx, binsy = np.histogram2d(
        data[:, 0], data[:, 1], bins=nbins, range=rng, weights=w, density=True)
    heatmap = gaussian_filter(heatmap, sigma=smoothing)
    extent = [binsx[0], binsx[-1], binsy[0], binsy[-1]]
    palette = plt.get_cmap("Blues").copy()
    palette.set_under("white", 0.0)
    ax.imshow(heatmap.T, extent=extent, vmin=0.0, origin="lower", cmap=palette,
              aspect="auto")
    if scatter:
        ax.scatter(x=data[:, 0], y=data[:, 1], s=0.001, c="k")
    ax.set_ylabel(rf"$x_{dim2 + 1:d}$")
    ax.set_xlabel(rf"$x_{dim1 + 1:d}$")
    return ax.get_figure()


def plot_marginal(x, weights=None, marginal: Callable | None = None,
                  dim: int = 0, nbins: int = 100, domain=None, ax=None):
    """1-D marginal histogram + optional IS-reweighted overlay and true
    marginal curve (plots.py:117)."""
    data = np.asarray(x)[:, dim]
    if ax is None:
        _, ax = plt.subplots(1, 1)
    if domain is None:
        rng = (float(data.min()), float(data.max()))
    else:
        rng = tuple(np.asarray(domain)[dim].tolist())
    ax.hist(data, bins=nbins, range=rng, density=True, alpha=0.6, label="histogram")
    if weights is not None:
        ax.hist(data, bins=nbins, range=rng, density=True, alpha=0.6,
                weights=np.asarray(weights), label="histogram_is")
    if marginal is not None:
        import jax.numpy as jnp

        xlin = np.linspace(*rng, nbins)
        vals = np.asarray(marginal(jnp.asarray(xlin, jnp.float32), dim=dim)).reshape(-1)
        ax.plot(xlin, vals, label="marginal")
    ax.legend()
    return ax.get_figure()


def plot_evolution(ts, xs, dim: int = 0, ntraj: int = 50, domain=None, ax=None):
    """Trajectory fan over time, hue-coded by terminal value (plots.py:168)."""
    if ax is None:
        _, ax = plt.subplots(1, 1)
    trajs = np.asarray(xs)[:, :, dim].T  # (B, K+1)
    mask = np.isfinite(trajs).all(axis=1)
    discard = mask.size - mask.sum()
    if discard > 0:
        logging.warning("Filtering %d trajectories with non-finite values.", discard)
    if discard < mask.size:
        trajs = trajs[mask][:ntraj]
        term = trajs[:, -1]
        hues = (term - term.min()) / (1e-8 + term.max() - term.min())
        cmap = plt.get_cmap("hsv")
        for traj, hue in zip(trajs, hues):
            ax.plot(np.asarray(ts), traj, color=cmap(hue), linewidth=0.4)
    if domain is not None:
        ax.set_ylim(*np.asarray(domain)[dim].tolist())
    return ax.get_figure()


def get_plots(distr, samples, weights=None, ts=None, xs=None,
              marginal_dims=None, nbins: int = 100, domain=None,
              sample_key=None) -> dict:
    """Plot bundle (plots.py:210) — same keys as the reference namespaces."""
    plots = {}
    marginal_dims = [d for d in (marginal_dims or []) if d < distr.dim]
    if domain is None and distr.domain is not None:
        d = np.asarray(distr.domain)
        domain = distr.domain if np.isfinite(d).all() else None

    for d in marginal_dims:
        if ts is not None and xs is not None:
            plots[f"plots/traj_{d}"] = plot_evolution(ts=ts, xs=xs, dim=d, domain=domain)
        plots[f"plots/hist_{d}"] = plot_marginal(
            x=samples, weights=weights, marginal=getattr(distr, "marginal", None),
            dim=d, nbins=nbins, domain=domain)
    for dim1, dim2 in itertools.combinations(marginal_dims, r=2):
        plots[f"plots/density_{dim1}_{dim2}"] = plot_marginal_2d(
            x=samples, dim1=dim1, dim2=dim2, nbins=nbins, domain=domain)
    try:
        import jax

        key = sample_key if sample_key is not None else jax.random.PRNGKey(4321)
        gt = distr.sample(key, (np.asarray(samples).shape[0],))
        for dim1, dim2 in itertools.combinations(marginal_dims, r=2):
            plots[f"plots/groundtruth_density_{dim1}_{dim2}"] = plot_marginal_2d(
                x=gt, dim1=dim1, dim2=dim2, nbins=nbins, domain=domain)
    except NotImplementedError:
        pass
    return plots


def save_fig(fig, path):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
