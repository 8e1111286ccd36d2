"""Chromatic audio-reactivity metric.

Equivalent of ssar/metrics/chroma.py:177-221: the chroma-CENS
autocorrelation matrix and the per-frame RGB-histogram autocorrelation
matrix are compared by (optionally soft-rank spearman) correlation of their
strict upper triangles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.features import harmonic
from ..audio.spectral import chroma_cens
from ..metrics.rhythmic import percentile_clip
from ..ops.gaussian import gaussian_filter
from ..ops.resample import resample
from .correlation import soft_rank


def nn_filter_cosine_median(S: jax.Array, k: int | None = None) -> jax.Array:
    """librosa.decompose.nn_filter(aggregate=median, metric="cosine"):
    each frame is replaced by the elementwise median over its k most
    cosine-similar frames (self included).  S (D, T)."""
    D, T = S.shape
    if k is None:
        k = min(T, 2 * int(np.ceil(np.sqrt(T))))
    norm = S / (jnp.linalg.norm(S, axis=0, keepdims=True) + 1e-12)
    sim = norm.T @ norm  # (T, T)
    _, idx = jax.lax.top_k(sim, k)  # (T, k) nearest frames (incl. self)
    neigh = S.T[idx]  # (T, k, D)
    return jnp.median(neigh, axis=1).T


def corrcoef(target: jax.Array, pred: jax.Array) -> jax.Array:
    pred_n = pred - jnp.mean(pred)
    target_n = target - jnp.mean(target)
    pred_n = pred_n / (jnp.linalg.norm(pred_n) + 1e-12)
    target_n = target_n / (jnp.linalg.norm(target_n) + 1e-12)
    return jnp.sum(pred_n * target_n)


def correlation(target: jax.Array, pred: jax.Array, spearman: bool = False,
                regularization_strength: float = 0.01) -> jax.Array:
    if spearman:
        pred = soft_rank(pred, regularization_strength) / pred.shape[-1]
    return corrcoef(target, pred)


def _frame_histograms(video: jax.Array, bins: int = 32) -> jax.Array:
    """(T, C, H, W) -> (T, C*bins) per-channel torch.histc-style histograms."""
    from ..video.features import _histc

    T, C = video.shape[:2]
    flat = video.reshape(T * C, -1)
    hists = jax.vmap(lambda f: _histc(f, bins))(flat)
    return hists.reshape(T, C * bins)


def chromatic_reactivity(audio: jax.Array, sr: int, video: jax.Array, fps: int,
                         spearman: bool = False) -> jax.Array:
    if audio.ndim == 2:
        audio = jnp.mean(audio, axis=0)
    if round(sr) != round(fps * 1024):
        audio = resample(audio, int(sr), int(fps * 1024), lowpass_filter_width=6)
        sr = int(fps * 1024)

    harm = harmonic(audio)
    chroma = chroma_cens(harm, sr)  # (12, T)
    chroma = nn_filter_cosine_median(chroma)
    chroma = chroma.T  # (T, 12)
    chroma = gaussian_filter(chroma, fps / 12)
    chroma = percentile_clip(chroma, 97.5)
    chroma = jnp.clip(chroma, jnp.quantile(chroma, 0.1), 1.0)
    chroma = gaussian_filter(chroma, fps / 24)
    chroma = chroma / (jnp.linalg.norm(chroma, axis=1, keepdims=True) + 1e-12)

    vhist = _frame_histograms(video)
    vhist = vhist / (jnp.linalg.norm(vhist, axis=1, keepdims=True) + 1e-12)

    n = min(chroma.shape[0], vhist.shape[0])
    chroma, vhist = chroma[:n], vhist[:n]

    chroma_ac = chroma @ chroma.T
    vhist_ac = vhist @ vhist.T

    iu = jnp.triu_indices(n, k=1)
    return correlation(chroma_ac[iu], vhist_ac[iu], spearman=spearman)
