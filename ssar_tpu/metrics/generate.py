"""Correlation test-set generator: videos with known reactivity levels.

Equivalent of ssar/metrics/generate.py:60-174 — renders clips whose
audio-visual correlation is low / medium / chroma-driven / onset-driven /
both, used to calibrate and validate the reactivity metrics (the
reference's metric-validity methodology, SURVEY.md §4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.beat import onset_strength
from ..audio.features import harmonic, percussive
from ..audio.spectral import chroma_cens
from ..generate.latent import spline_loop_latents
from ..ops.gaussian import gaussian_filter


def my_chromagram(audio: jax.Array, sr: int) -> jax.Array:
    """Median-nn-filtered chroma, (T, 12) (ssar/metrics/chroma.py:29-38)."""
    from .chroma import nn_filter_cosine_median

    chroma = chroma_cens(harmonic(audio), sr)
    chroma = jnp.minimum(chroma, nn_filter_cosine_median(chroma))
    return chroma.T


def my_audio_onsets(audio: jax.Array, sr: int) -> jax.Array:
    """Normalised percussive onsets, (T,) (metric's own onset flavour)."""
    from .rhythmic import percentile_clip

    env = onset_strength(percussive(audio), sr)
    env = percentile_clip(env, 97.5)
    return env / (jnp.max(env) + 1e-12)


def _looped_noise(key, n_keys: int, N: int, size: int) -> jax.Array:
    noise = jax.random.normal(key, (n_keys, 1, size * size))
    noise = spline_loop_latents(noise, N)
    return noise.reshape(N, 1, size, size)


def low_correlation(key, mapper, audio, sr, n_frames, fps=24):
    k1, k2 = jax.random.split(key)
    n_keys = int(jax.random.randint(k1, (), max(2, n_frames // 192), max(3, n_frames // 24)))
    ws = mapper(jax.random.normal(k1, (n_keys, 512)))
    latents = spline_loop_latents(ws, n_frames)
    noise = _looped_noise(k2, n_keys, n_frames, 16)
    return latents, noise


def high_chroma_correlation(key, mapper, audio, sr, n_frames, fps=24):
    chroma = my_chromagram(audio, sr)[:n_frames]
    chroma = chroma / (jnp.sum(chroma, axis=1, keepdims=True) + 1e-12)
    ws = mapper(jax.random.normal(key, (12, 512)))
    latents = jnp.einsum("TC,CNL->TNL", chroma, ws)
    latents = gaussian_filter(latents, fps / 24)
    noise = gaussian_filter(jax.random.normal(key, (n_frames, 1, 32, 32)), 3 * fps)
    noise = noise / (jnp.std(noise) + 1e-12)
    return latents, noise


def high_onset_correlation(key, mapper, audio, sr, n_frames, fps=24):
    ons = my_audio_onsets(audio, sr)[:n_frames]
    ws = mapper(jax.random.normal(key, (2, 512)))
    latents = ws[0:1] * ons[:, None, None] + ws[1:2] * (1 - ons[:, None, None])
    latents = gaussian_filter(latents, fps / 24)
    noise = gaussian_filter(jax.random.normal(key, (n_frames, 1, 64, 64)), 3 * fps / 24)
    noise = noise / (jnp.std(noise) + 1e-12)
    noise = noise * ons[:, None, None, None]
    return latents, noise


def high_both_correlation(key, mapper, audio, sr, n_frames, fps=24):
    chroma = my_chromagram(audio, sr)[:n_frames]
    chroma = chroma / (jnp.sum(chroma, axis=1, keepdims=True) + 1e-12)
    ons = my_audio_onsets(audio, sr)[:n_frames]
    ws = mapper(jax.random.normal(key, (14, 512)))
    latents = (jnp.einsum("TC,CNL->TNL", chroma, ws[:12])
               + ws[12:13] * ons[:, None, None] + ws[13:14] * (1 - ons[:, None, None])) / 2
    latents = gaussian_filter(latents, fps / 24)
    noise = gaussian_filter(jax.random.normal(key, (n_frames, 1, 64, 64)), 3 * fps / 24)
    noise = noise / (jnp.std(noise) + 1e-12)
    noise = noise * ons[:, None, None, None]
    return latents, noise


CORRELATION_RECIPES = {
    "low": low_correlation,
    "high_chroma": high_chroma_correlation,
    "high_onset": high_onset_correlation,
    "high_both": high_both_correlation,
}


def render_correlation_clip(recipe: str, audio, sr: int, G, fps: int = 24, seed: int = 0,
                            batch_size: int = 16):
    """-> (T, C, H, W) video rendered with the chosen correlation recipe."""
    from ..gan.wrapper import make_noise_pyramid

    audio = jnp.asarray(audio, jnp.float32)
    n_frames = audio.shape[0] // 1024
    key = jax.random.PRNGKey(seed)
    latents, noise = CORRELATION_RECIPES[recipe](key, G.mapper, audio, sr, n_frames, fps)
    pyramid = make_noise_pyramid(noise, config=G.config)
    n_used = G.synthesizer.n_noises_used
    frames = []
    for i in range(0, n_frames, batch_size):
        L = latents[i : i + batch_size]
        kw = {f"noise{j}": p[i : i + batch_size] for j, p in enumerate(pyramid[:n_used])}
        f = jnp.clip((G.synthesizer(L, **kw) + 1) / 2, 0, 1)
        frames.append(np.asarray(f))
    video = np.concatenate(frames)  # (T, H, W, C)
    return jnp.asarray(video.transpose(0, 3, 1, 2))
