"""Rhythmic audio-reactivity metric.

Equivalent of ssar/metrics/rhythmic.py:266-293: the audio onset envelope of
the percussive component and the video absdiff envelope are identically
postprocessed (smooth -> peak percentile clip -> lower clamp -> smooth ->
L2 norm) and compared by dot product.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

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
