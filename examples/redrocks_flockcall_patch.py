"""Example patch: the "Flock Call" redrocks set piece — the canonical full
redrocks skeleton: shuffled color palette, chroma-argmax-indexed reactive
structure latents blended in by transient energy, and an independent slow
color-layer loop overriding the top W+ rows.

Ported idioms (reference ssar/patches/examples/9_flockcall.py):
- ``colors = selection[permutation]`` (:25)
- ``freqs = focus_chroma % len(structure); reactive = structure[freqs]``
  then ``gaussian_filter(reactive, 2)`` — pitch class picks the imagery
  (:38-41)
- ``drop = (1-main)*drop + main*reactive`` (:42-44)
- ``latents[:, 12:] = color_loops[:, 12:]`` — the color override (:47-48)
"""
import jax.numpy as jnp
import numpy as np

import ssar_tpu.generate.audioreactive as ar


def initialize(args):
    args.drum_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmin=200,
                                 clip=94, smooth=2, power=1)
    args.drum_onsets = ar.compress(args.drum_onsets, 0.5, 0.5)
    args.drum_onsets = ar.gaussian_filter(args.drum_onsets, 3, causal=0.25)
    args.focus_chroma = jnp.argmax(ar.chroma(args.audio, args.sr, args.n_frames), axis=1)
    args.drop_weight = ar.rms(args.audio, args.sr, args.n_frames, smooth=100) ** 2
    args.main_weight = (
        ar.compress(ar.onsets(args.audio, args.sr, args.n_frames, clip=97, smooth=2.5), 0.5, 0.5)
        * args.drop_weight
    )
    args.low_noise_mod = ar.normalize((1 - args.drop_weight) * args.main_weight)
    return args


def get_latents(selection, args):
    rng = np.random.RandomState(9)
    colors = selection[jnp.asarray(rng.permutation(selection.shape[0]))]
    structure = selection

    half = structure.shape[0] // 2
    intro = ar.slerp_loops(structure[:half], args.n_frames, 0.75, smoothing=16)
    d = args.drum_onsets[:, None, None]
    intro = (1 - 0.5 * d) * intro + 0.5 * d * selection[rng.randint(selection.shape[0])][None]

    drop = ar.slerp_loops(structure[half:], args.n_frames, 3, smoothing=6)

    freqs = args.focus_chroma % structure.shape[0]
    reactive = ar.gaussian_filter(structure[freqs], 2)
    m = args.main_weight[:, None, None]
    drop = (1 - m) * drop + m * reactive

    w = args.drop_weight[:, None, None]
    latents = w * drop + (1 - w) * intro

    color_loops = ar.slerp_loops(colors, args.n_frames, 3, smoothing=16)
    cut = latents.shape[1] * 2 // 3  # the reference's row 12 of 18
    latents = latents.at[:, cut:].set(color_loops[:, cut:])
    return ar.gaussian_filter(latents, 2.5)
