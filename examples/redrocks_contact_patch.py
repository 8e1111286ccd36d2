"""Example patch: the "Contact" redrocks set piece — robust drop detection
with a constant-floor fallback, fully causal drum smoothing, and a
quiet-section noise modulator.

Ported idioms (reference ssar/patches/examples/4_contact.py):
- drum-stem onsets -> compress -> ``gaussian_filter(..., causal=0)`` (:14-19)
- ``drop_weight = 0.888 * rms(smooth=100) ** 2`` with a constant-0.125
  fallback when the track is too quiet/short for rms peaks (:20-24)
- ``main_weight = 0.888 * compress(onsets(clip=97)) * drop_weight`` (:25-27)
- ``low_noise_mod = normalize((1 - drop_weight) * main_weight)`` — transient
  energy that only bites OUTSIDE the drops, driving the coarse noise (:28-30)

Stems are read from the demucs convention (``<track>/drums.wav`` /
``other.wav``) when present, band-filtered mix otherwise, so the patch
renders standalone.
"""
import os

import jax
import jax.numpy as jnp

import ssar_tpu.generate.audioreactive as ar


def _stem(args, name):
    if not args.audio_file:
        return None
    path = os.path.join(os.path.splitext(args.audio_file)[0], f"{name}.wav")
    if not os.path.exists(path):
        return None
    audio, sr, _ = ar.load_audio(path)
    return audio, sr


def initialize(args):
    drums = _stem(args, "drums")
    daudio, dsr = drums if drums is not None else (args.audio, args.sr)
    args.drum_onsets = ar.onsets(daudio, dsr, args.n_frames, fmin=200,
                                 clip=94, smooth=2, power=1)
    args.drum_onsets = ar.compress(args.drum_onsets, 0.5, 0.5)
    args.drum_onsets = 0.888 * ar.gaussian_filter(args.drum_onsets, 3, causal=0)

    other = _stem(args, "other")
    focus, fsr = other if other is not None else (args.audio, args.sr)
    args.focus_chroma = jnp.argmax(ar.chroma(focus, fsr, args.n_frames), axis=1)

    # the reference guards rms() with a try/except IndexError -> 0.125 floor
    # (4_contact.py:20-24); here the quiet-track case is detected directly
    drop = ar.rms(args.audio, args.sr, args.n_frames, smooth=100) ** 2
    silent = ~jnp.isfinite(drop).all() | (jnp.max(jnp.abs(args.audio)) < 1e-6)
    args.drop_weight = jnp.where(silent, 0.125 * jnp.ones(args.n_frames), 0.888 * drop)

    args.main_weight = 0.888 * (
        ar.compress(ar.onsets(args.audio, args.sr, args.n_frames, clip=97, smooth=3), 0.5, 0.5)
        * args.drop_weight
    )
    args.low_noise_mod = (1 - args.drop_weight) * args.main_weight
    args.low_noise_mod = 0.888 * ar.normalize(args.low_noise_mod)
    return args


def get_latents(selection, args):
    half = selection.shape[0] // 2
    intro = ar.slerp_loops(selection[:half], args.n_frames, 1, smoothing=16)
    drop = ar.slerp_loops(selection[half:], args.n_frames, 2, smoothing=4)

    # focus stem's chroma indexes the palette for the in-drop reactive layer
    reactive = ar.gaussian_filter(selection[args.focus_chroma % selection.shape[0]], 2)
    m = args.main_weight[:, None, None]
    drop = (1 - m) * drop + m * reactive

    intro = ar.ModulatedLatents(0.5 * args.drum_onsets, intro, selection[0])
    w = args.drop_weight[:, None, None]
    return ar.gaussian_filter(w * drop + (1 - w) * intro, 2)


def get_noise(height, width, scale, num_scales, args):
    if height > 256:
        return None
    key = jax.random.PRNGKey(4 + scale)
    k1, k2 = jax.random.split(key)
    base = ar.gaussian_filter(jax.random.normal(k1, (args.n_frames, height, width)), 20)
    noisy = jax.random.normal(k2, (args.n_frames, height, width))
    # quiet-section transients flicker the coarse scales; drops the fine ones
    mod = args.low_noise_mod if scale < num_scales // 2 else args.main_weight
    return ar.ModulatedNoise(mod, base, noisy)
