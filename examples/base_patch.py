"""Shared base patch: the ``from .base import *`` idiom.

Every numbered reference patch (ssar/patches/examples/2_mirage.py …
21_cosmictuba.py) starts from one shared base module that computes the
canonical driving signals — drum onsets, a chroma-argmax "focus" melody
track, a long-window drop weight and a combined main weight — and supplies
default latent/noise hooks that concrete patches then override.

This file is that base, written against the ssar_tpu authoring API.  It is
itself a complete patch (renders standalone); see
``mirage_inherited_patch.py`` for a patch that composes with it.

Stems (``<track>/drums.wav``, ``<track>/other.wav``) are used when present,
with band-filtered fallbacks so the patch runs on a bare mix.
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
    # drums -> sharp compressed onsets (the reference base's exact chain:
    # onsets(fmin=200, clip=94, smooth) -> compress(0.5, 0.5) -> gaussian)
    drums = _stem(args, "drums")
    if drums is not None:
        args.drum_onsets = ar.onsets(drums[0], drums[1], args.n_frames,
                                     fmin=200, clip=94, smooth=2, power=1)
    else:
        args.drum_onsets = ar.onsets(args.audio, args.sr, args.n_frames,
                                     fmin=200, clip=94, smooth=2, power=1)
    args.drum_onsets = ar.gaussian_filter(
        ar.compress(args.drum_onsets, 0.5, 0.5), 2, causal=0)

    # melodic focus -> per-frame pitch class (chroma argmax)
    focus = _stem(args, "other")
    chrom = (ar.chroma(focus[0], focus[1], args.n_frames) if focus is not None
             else ar.chroma(args.audio, args.sr, args.n_frames))
    args.focus_chroma = jnp.argmax(chrom, axis=1)

    # slow build: squared long-window RMS; reference guards short tracks by
    # falling back to a constant eighth (2_mirage.py:33-37)
    if args.n_frames > 100:
        args.drop_weight = ar.rms(args.audio, args.sr, args.n_frames, smooth=100) ** 2
    else:
        args.drop_weight = 0.125 * jnp.ones(args.n_frames)

    args.main_weight = (
        ar.compress(ar.onsets(args.audio, args.sr, args.n_frames, clip=97, smooth=3),
                    0.5, 0.5) * args.drop_weight)
    args.low_noise_mod = (1 - args.drop_weight) * args.main_weight
    return args


def get_latents(selection, args):
    """Default: drop/intro crossfade with drum punches — concrete patches
    override this wholesale."""
    intro = ar.slerp_loops(selection[:4], args.n_frames, 1, smoothing=16)
    drop = ar.slerp_loops(selection[4:8], args.n_frames, 2, smoothing=4)
    intro = ar.ModulatedLatents(0.5 * args.drum_onsets, intro, selection[-1])
    w = args.drop_weight[:, None, None]
    return ar.gaussian_filter(w * drop + (1 - w) * intro, 2)


def get_noise(height, width, scale, num_scales, args):
    if height > 256:
        return None
    key = jax.random.PRNGKey(scale)
    k1, k2, k3 = jax.random.split(key, 3)
    smooth = ar.gaussian_filter(jax.random.normal(k1, (args.n_frames, height, width)), 20)
    noisy = ar.gaussian_filter(jax.random.normal(k2, (args.n_frames, height, width)), 5)
    noisier = ar.gaussian_filter(jax.random.normal(k3, (args.n_frames, height, width)), 1.5)
    noise = smooth
    if height > 8:
        ons = ((args.drum_onsets + args.main_weight) / 2)[:, None, None]
        noise = ons * noisier + (1 - ons) * noise
        lo = args.low_noise_mod[:, None, None]
        noise = lo * noisy + (1 - lo) * noise
    return noise / (3 * noise.std())
