"""Example patch: the "Cosmic Tuba" set closer — a dedicated high-frequency
noise modulator and the triple-smoothness noise stack.

Ported idioms (reference ssar/patches/examples/21_cosmictuba.py):
- ``high_noise_mod = percentile_clip(main_weight ** 2, 97)`` — a separate
  spiky modulator for the finest noise (:51)
- three noise fields at smoothness 20 / 5 / 1.5 blended in order: high mod
  pulls toward the noisiest, low mod toward the middle (:164-174)
- extra onset gating only for ``width > 16`` scales (:175-177)
- ``noise /= noise.std(); noise /= 1.666`` final normalization (:178-179)
- ``height > 128 -> None`` scale cutoff (:161-162)
"""
import jax
import jax.numpy as jnp

import ssar_tpu.generate.audioreactive as ar


def initialize(args):
    args.drum_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmin=200,
                                 clip=94, smooth=2, power=1)
    args.drum_onsets = ar.compress(args.drum_onsets, 0.5, 0.5)
    args.drum_onsets = ar.gaussian_filter(args.drum_onsets, 2, causal=0.25)
    args.drop_weight = ar.rms(args.audio, args.sr, args.n_frames, smooth=100) ** 2
    args.main_weight = (
        ar.compress(ar.onsets(args.audio, args.sr, args.n_frames, clip=97, smooth=2.5), 0.5, 0.5)
        * args.drop_weight
    )
    args.high_noise_mod = ar.percentile_clip(args.main_weight ** 2, 97)
    args.low_noise_mod = ar.normalize((1 - args.drop_weight) * args.main_weight)
    return args


def get_latents(selection, args):
    half = selection.shape[0] // 2
    intro = ar.slerp_loops(selection[:half], args.n_frames, 1, smoothing=16)
    drop = ar.slerp_loops(selection[half:], args.n_frames, 3, smoothing=4)
    w = args.drop_weight[:, None, None]
    return ar.gaussian_filter(w * drop + (1 - w) * intro, 2.5)


def get_noise(height, width, scale, num_scales, args):
    if height > 128:
        return None
    key = jax.random.PRNGKey(21 + scale)
    k1, k2, k3 = jax.random.split(key, 3)
    shape = (args.n_frames, height, width)
    noise = ar.gaussian_filter(jax.random.normal(k1, shape), 20)
    noisy = ar.gaussian_filter(jax.random.normal(k2, shape), 5)
    noisier = ar.gaussian_filter(jax.random.normal(k3, shape), 1.5)

    hi = args.high_noise_mod[:, None, None]
    noise = hi * noisier + (1 - hi) * noise
    lo = args.low_noise_mod[:, None, None]
    noise = lo * noisy + (1 - lo) * noise
    if width > 16:
        onsets = ((args.drum_onsets + args.main_weight) / 2)[:, None, None]
        noise = onsets * noisier + (1 - onsets) * noise
    noise = noise / noise.std()
    return noise / 1.666
