"""Rhythmic audio-reactivity metric.

Equivalent of ssar/metrics/rhythmic.py:266-293: the audio onset envelope of
the percussive component and the video absdiff envelope are identically
postprocessed (smooth -> peak percentile clip -> lower clamp -> smooth ->
L2 norm) and compared by dot product.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.beat import onset_strength
from ..audio.features import percussive
from ..ops.absdiff import absdiff_ref
from ..ops.gaussian import gaussian_filter
from ..ops.quantile import masked_quantile
from ..ops.resample import resample


def percentile_clip(signal: jax.Array, percent: float) -> jax.Array:
    """Peak-quantile clamp to [0, thresh], then per-channel max-normalise
    (ssar/metrics/rhythmic.py:45-63)."""
    squeeze = signal.ndim < 2
    if squeeze:
        signal = signal[:, None]
    T = signal.shape[0]
    prev = signal[jnp.clip(jnp.arange(T) - 1, 0, T - 1)]
    nxt = signal[jnp.clip(jnp.arange(T) + 1, 0, T - 1)]
    peaks = (signal > prev) & (signal > nxt)

    def per_channel(sig, pk):
        thresh = masked_quantile(sig, pk, percent / 100.0)
        sig = jnp.clip(sig, 0.0, thresh)
        return sig / (jnp.max(sig) + 1e-12)

    out = jax.vmap(per_channel, in_axes=1, out_axes=1)(signal, peaks)
    return out[:, 0] if squeeze else out


def _postprocess(x: jax.Array, fps: float, q: float = 0.025) -> jax.Array:
    x = gaussian_filter(x, fps / 12)
    x = percentile_clip(x, (1 - q) * 100)
    x = jnp.clip(x, jnp.quantile(x, 4 * q, axis=0), 1.0)
    x = gaussian_filter(x, fps / 24)
    return x / (jnp.linalg.norm(x) + 1e-12)


def video_absdiff_env(video: jax.Array) -> jax.Array:
    """(T, C, H, W) -> (T,) framewise absdiff (rhythmic.py:255-263)."""
    return absdiff_ref(video)


def rhythmic_reactivity(audio: jax.Array, sr: int, video: jax.Array, fps: int) -> jax.Array:
    if audio.ndim == 2:
        audio = jnp.mean(audio, axis=0)
    if round(sr) != round(fps * 1024):
        audio = resample(audio, int(sr), int(fps * 1024), lowpass_filter_width=6)
        sr = int(fps * 1024)

    perc = percussive(audio)
    audio_env = _postprocess(onset_strength(perc, sr), fps)
    video_env = _postprocess(video_absdiff_env(video), fps)

    n = min(audio_env.shape[0], video_env.shape[0])
    return jnp.dot(audio_env[:n], video_env[:n])


# ------------------------------------------------ metric validation study --
def dtw_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Plain O(T^2) dynamic-time-warping distance (host numpy) — the
    comparison oracle the reference pulls from an external package."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    n, m = len(a), len(b)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    cost = np.abs(a[:, None] - b[None, :])
    for i in range(1, n + 1):
        D[i, 1:] = cost[i - 1]
        for j in range(1, m + 1):
            D[i, j] += min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return float(D[n, m])


def metric_sensitivity_study(audio_env, env_sets: dict, strengths: int = 12,
                             seed: int = 0, out_dir: str | None = None):
    """Sensitivity of candidate similarity metrics under controlled envelope
    perturbations (ssar/metrics/rhythmic.py:203-252): for each transform
    (emphasize / power / scale / offset / permute) over a strength grid,
    score every envelope set against the audio onset envelope with the
    metric panel (xi, cosine, dtw, mse).

    env_sets: {name: (n_envs, T) array}.  Returns records
    [{transform, metric, envelope_set, strength, mean, std}].
    """
    from .correlation import xi

    audio_env = jnp.asarray(audio_env).reshape(-1)
    T = audio_env.shape[0]
    rng = np.random.RandomState(seed)

    def permute_frames(envs, s):
        res = np.array(envs)
        k = round(res.shape[1] * float(s))
        if k > 0:
            for e in range(res.shape[0]):
                to = rng.permutation(res.shape[1])[:k]
                res[e, to] = res[e, to[rng.permutation(k)]]
        return jnp.asarray(res)

    transforms = {
        "emphasize": (lambda e, s: e * (1 + jnp.tanh(s * (e - 0.5))), np.linspace(0.01, 5, strengths)),
        "power": (lambda e, s: jnp.maximum(e, 0.0) ** s, np.linspace(0.01, 5, strengths)),
        "scale": (lambda e, s: s * e, np.linspace(-1, 5, strengths)),
        "offset": (lambda e, s: jnp.roll(e, int(s), axis=-1),
                   np.unique(np.linspace(-T // 4, T // 4, strengths).astype(int))),
        "permute": (permute_frames, np.linspace(0, 1, strengths)),
    }
    cos = lambda a, b: float(jnp.dot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-12))
    metrics = {
        "xi": lambda a, b: float(xi(a, b)),
        "cos": cos,
        "dtw": lambda a, b: dtw_distance(np.asarray(a), np.asarray(b)),
        "mse": lambda a, b: float(jnp.mean((a - b) ** 2)),
    }

    records = []
    for tname, (tf, ss) in transforms.items():
        for mname, metric in metrics.items():
            for ename, envs in env_sets.items():
                envs = jnp.asarray(envs)[:, :T]
                for s in ss:
                    vals = [metric(audio_env, env) for env in tf(envs, s)]
                    records.append({"transform": tname, "metric": mname,
                                    "envelope_set": ename, "strength": float(s),
                                    "mean": float(np.mean(vals)), "std": float(np.std(vals))})
    if out_dir is not None:
        from pathlib import Path
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        try:
            import pandas as pd

            pd.DataFrame(records).to_csv(out / "metric_sensitivity.csv")
        except ImportError:
            pass
    return records
