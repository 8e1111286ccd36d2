"""Plotting: AV-correlation heatmaps and autocorrelation grids.

Equivalent of ssar/plot.py (seaborn heatmaps of per-feature-pair
correlations, :127-215; autocorrelation matrix grids, :342-412) and the
training-time envelope diagnostics (ssar/train.py:118-146).  matplotlib Agg
only — pdf/png artifacts.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def correlation_heatmap(records: list[dict], out_file: str, value_key: str = "correlation"):
    """Per (audio-feature x video-feature) correlation heatmap from
    compare_models records (plot.py:127-215)."""
    plt = _plt()
    pair_keys = sorted({k for r in records for k in r if "|" in k})
    a_names = sorted({k.split("|")[0] for k in pair_keys})
    v_names = sorted({k.split("|")[1] for k in pair_keys})
    grid = np.full((len(a_names), len(v_names)), np.nan)
    for i, a in enumerate(a_names):
        for j, v in enumerate(v_names):
            vals = [r[f"{a}|{v}"] for r in records if f"{a}|{v}" in r]
            if vals:
                grid[i, j] = np.mean(vals)
    fig, ax = plt.subplots(figsize=(2 + len(v_names), 2 + len(a_names) * 0.5))
    im = ax.imshow(grid, cmap="inferno")
    ax.set_xticks(range(len(v_names)), v_names, rotation=90)
    ax.set_yticks(range(len(a_names)), a_names)
    fig.colorbar(im)
    fig.tight_layout()
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file)
    plt.close(fig)
    return out_file


def autocorrelation(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    x = x - x.mean(0)
    x = x / (x.std(0) + 1e-8)
    x = x.reshape(len(x), -1)
    return x @ x.T


def autocorrelation_grid(named_signals: dict, out_file: str, cmap: str = "inferno"):
    """Grid of time-autocorrelation matrices, one per named signal
    (plot.py:342-412, train.py:118-146)."""
    plt = _plt()
    n = len(named_signals)
    cols = min(4, n)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 4 * rows), squeeze=False)
    for ax in axes.flatten():
        ax.axis("off")
    for ax, (name, sig) in zip(axes.flatten(), named_signals.items()):
        ac = autocorrelation(np.asarray(sig))
        ac = ac - ac.min()
        ac = ac / (ac.max() + 1e-8)
        ax.imshow(ac, cmap=cmap)
        ax.set_title(name, fontsize=8)
    fig.tight_layout()
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file)
    plt.close(fig)
    return out_file


def envelope_report(inputs: np.ndarray, envelopes: np.ndarray, out_file: str):
    """Training-time diagnostic: most-correlated input envelopes next to
    generated intermediate envelopes (ssar/train.py:105-148)."""
    plt = _plt()
    from ..train.losses import orthogonal_procrustes_distance
    import jax.numpy as jnp

    n_env = envelopes.shape[-1]
    corrs = np.array([
        1 - float(orthogonal_procrustes_distance(jnp.asarray(inputs[:, i : i + 1]),
                                                 jnp.asarray(envelopes)))
        for i in range(inputs.shape[-1])
    ])
    top = np.argsort(corrs)[::-1][:n_env]
    fig, ax = plt.subplots(n_env, 2, figsize=(8, 2 * n_env), squeeze=False)
    for e in range(n_env):
        ienv = inputs[:, top[e]]
        ax[e, 0].imshow(np.outer(ienv, ienv), cmap="inferno")
        genv = envelopes[:, e]
        ax[e, 1].imshow(np.outer(genv, genv), cmap="inferno")
        ax[e, 0].axis("off")
        ax[e, 1].axis("off")
    ax[0, 0].set_title("most correlated inputs")
    ax[0, 1].set_title("generated envelopes")
    fig.tight_layout()
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file)
    plt.close(fig)
    return out_file
