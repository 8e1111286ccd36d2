"""Inference: audio file + trained reactor -> music video.

Equivalent of ssar/supervised/test.py:469-588 (`audio2video`/`_audio2video`)
— the canonical serve path: features -> model -> (latents, noise pyramid) ->
chunked StyleGAN2 render -> mp4, with the reference's noise-duplication
pattern (noise0, then each pyramid level twice) and optional residual
re-centering around a seeded mapper latent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.features import audio2features
from ..gan.render import render_latents_to_video
from ..gan.wrapper import StyleGAN2Mapper, StyleGAN2Synthesizer


def _duplicate_pyramid(noise_nchw: list[np.ndarray]) -> list[np.ndarray]:
    """[n0, n1, ..., nk] -> [n0, n1, n1, n2, n2, ...] (supervised/test.py:576-582)."""
    return [noise_nchw[0]] + [n for nn in noise_nchw[1:] for n in (nn, nn)]


def _audio2video(model_apply, features, out_file: str, model_file: str | None = None,
                 output_size=(1024, 1024), fps: int = 24, batch_size: int = 8,
                 audio_file: str | None = None, offset: float = 0, duration: float | None = None,
                 seed: int | None = None, residual: bool = False, gan_config=None,
                 noise_key: jax.Array | None = None) -> str:
    latents, noise = model_apply(features[None])
    latents = latents[0]
    noise = [np.asarray(n[0])[:, None] for n in noise]  # (T, 1, s, s)

    if residual:
        mapper = StyleGAN2Mapper(model_file=model_file, config=gan_config)
        z = np.random.RandomState(seed if seed is not None else 0).randn(1, 512).astype(np.float32)
        latents = latents + mapper(z)[0]

    synthesizer = StyleGAN2Synthesizer(model_file=model_file, output_size=output_size,
                                       strategy="stretch", layer=0, config=gan_config)
    dup = _duplicate_pyramid(noise)[: synthesizer.n_noises_used]
    start = int(fps * offset)
    end = int(fps * (offset + duration)) if duration is not None else latents.shape[0]
    return render_latents_to_video(
        synthesizer, latents[start:end], [n[start:end] for n in dup], out_file,
        fps=fps, output_size=output_size, batch_size=batch_size,
        audio_file=audio_file, audio_offset=offset, audio_duration=duration,
    )


def latent2video(audio_file: str | None, latent_file: str, out_file: str,
                 model_file: str | None = None, output_size=(1024, 1024), fps: int = 24,
                 batch_size: int = 8, offset: float = 0, duration: float | None = None,
                 seed: int = 123, gan_config=None) -> str:
    """Render a saved latent sequence (.npy, (T, n_ws, 512)) to video
    (ssar/supervised/test.py:598-652): the sequence is re-centered as a
    residual around a seeded mapper latent, and sibling
    ``" - Noise {4,8,16,32}.npy"`` pyramids are picked up when present
    (the reference's export convention)."""
    latents = jnp.asarray(np.load(latent_file), jnp.float32)
    start = int(fps * offset)
    end = int(fps * (offset + duration)) if duration is not None else latents.shape[0]
    latents = latents[start:end]
    residuals = latents - latents.mean((0, 1))

    noise = []
    for s in (4, 8, 16, 32):
        try:
            n = np.load(latent_file.replace(".npy", f" - Noise {s}.npy"))[start:end]
            noise.append(np.asarray(n, np.float32).reshape(n.shape[0], 1, s, s))
        except FileNotFoundError:
            noise = []
            break

    mapper = StyleGAN2Mapper(model_file=model_file, config=gan_config)
    z = np.random.RandomState(seed).randn(1, 512).astype(np.float32)
    base = mapper(z)[0]

    synthesizer = StyleGAN2Synthesizer(model_file=model_file, output_size=output_size,
                                       strategy="stretch", layer=0, config=gan_config)
    dup = _duplicate_pyramid(noise)[: synthesizer.n_noises_used] if noise else None
    return render_latents_to_video(
        synthesizer, base + residuals, dup, out_file, fps=fps,
        output_size=output_size, batch_size=batch_size, audio_file=audio_file,
        audio_offset=offset, audio_duration=duration,
    )


def audio2video(model, params, audio_file: str | None, out_file: str,
                model_file: str | None = None, output_size=(1024, 1024), fps: int = 24,
                batch_size: int = 8, offset: float = 0, duration: float | None = None,
                seed: int | None = None, residual: bool = False, gan_config=None,
                audio=None, sr: int | None = None) -> str:
    """Full path from an audio file (ssar/supervised/test.py:469-505).

    `model` is a flax LatentNoiseReactor (or anything with the same apply
    signature); `params` its variables.
    """
    if audio is None:
        from ..train.data import load_audio

        audio, sr = load_audio(audio_file)
    features = audio2features(jnp.asarray(audio), int(sr), fps)

    def model_apply(x):
        return model.apply(params, x, rngs={"noise": jax.random.PRNGKey(seed or 0)})

    return _audio2video(model_apply, features, out_file, model_file=model_file,
                        output_size=output_size, fps=fps, batch_size=batch_size,
                        audio_file=audio_file, offset=offset, duration=duration,
                        seed=seed, residual=residual, gan_config=gan_config)
