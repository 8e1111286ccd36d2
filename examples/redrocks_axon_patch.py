"""Example patch: the "Axon" redrocks set piece — an "orb" latent
interleaved through the structure pool and THREE color-loop streams
crossfaded across hard-timed sections (Intro / A / B).

Ported idioms (reference ssar/patches/examples/11_axon.py):
- one hand-picked ``orb`` row split out of the palette and tiled into the
  structure pool (``cat([col1]*4 + [orb]*4)`` + shuffle, :41-43)
- three independent color slerp loops at different rates (:60-63)
- section crossfades: intro colors until frame A, stream 2 for the A
  section, stream 3 after B (the reference masks with frame indices)
"""
import jax.numpy as jnp
import numpy as np

import ssar_tpu.generate.audioreactive as ar

A_POS, B_POS = 0.33, 0.66  # section boundaries as track fractions


def initialize(args):
    args.drum_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmin=200,
                                 clip=94, smooth=1, power=1)
    args.drum_onsets = ar.compress(args.drum_onsets, 0.5, 0.5)
    args.drum_onsets = ar.gaussian_filter(args.drum_onsets, 2, causal=0)
    args.drop_weight = ar.rms(args.audio, args.sr, args.n_frames, smooth=100) ** 2
    args.main_weight = (
        ar.compress(ar.onsets(args.audio, args.sr, args.n_frames, clip=97, smooth=2.5), 0.5, 0.5)
        * args.drop_weight
    )
    return args


def get_latents(selection, args):
    rng = np.random.RandomState(11)
    orb = selection[3 % selection.shape[0]][None]
    col1 = selection[:4]
    col2 = selection[4:8]
    col3 = selection[8:]

    structure = jnp.concatenate([col1] * 4 + [orb] * 4)
    structure = structure[jnp.asarray(rng.permutation(structure.shape[0]))]

    half = structure.shape[0] // 2
    intro = ar.slerp_loops(structure[:half], args.n_frames, 0.5, smoothing=16)
    d = args.drum_onsets[:, None, None]
    intro = (1 - 0.5 * d) * intro + 0.5 * d * selection[rng.randint(selection.shape[0])][None]
    drop = ar.slerp_loops(structure[half:], args.n_frames, 2, smoothing=4)

    w = args.drop_weight[:, None, None]
    latents = w * drop + (1 - w) * intro

    loops1 = ar.slerp_loops(col1, args.n_frames, 3, smoothing=16)
    loops2 = ar.slerp_loops(col2, args.n_frames, 3, smoothing=8)
    loops3 = ar.slerp_loops(col3, args.n_frames, 3, smoothing=4)
    t = jnp.arange(args.n_frames)[:, None, None]
    colors = jnp.where(t < int(A_POS * args.n_frames), loops1,
                       jnp.where(t < int(B_POS * args.n_frames), loops2, loops3))
    cut = latents.shape[1] * 2 // 3
    latents = latents.at[:, cut:].set(colors[:, cut:])
    return ar.gaussian_filter(latents, 2)
