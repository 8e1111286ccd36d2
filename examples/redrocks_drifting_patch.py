"""Example patch: the "Drifting" redrocks set piece — a six-section
tracklist, early-track damping, a tiled-palette fallback when no structure
file matches, and a mid-track color-palette switch.

Ported idioms (reference ssar/patches/examples/8_drifting.py):
- six named sections with absolute timestamps (:1-9); here expressed as
  track fractions
- the first stretch of every envelope is damped (``args.*[:3500] *= 0.666``,
  :30-33) so the intro stays subdued
- ``try: structure = load(random structure file) except: structure =
  cat([selection]*4)[perm]`` — the shuffled-tile fallback (:37-44)
- a second color set takes over the color layers mid-track (move_colors,
  :60-63)
"""
import jax.numpy as jnp
import numpy as np

import ssar_tpu.generate.audioreactive as ar

SECTIONS = [0.0, 0.15, 0.4, 0.55, 0.62, 0.8, 1.0]  # intro/1st/2nd/build/3rd/outro


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
    args.low_noise_mod = ar.normalize((1 - args.drop_weight) * args.main_weight)

    # damp everything until the first movement lands
    early = jnp.arange(args.n_frames) < int(SECTIONS[1] * args.n_frames)
    for name in ("drum_onsets", "drop_weight", "main_weight", "low_noise_mod"):
        setattr(args, name, jnp.where(early, getattr(args, name) * 0.666, getattr(args, name)))
    return args


def get_latents(selection, args):
    rng = np.random.RandomState(8)
    # structure-file-missing fallback: tile the palette 4x and shuffle
    structure = jnp.concatenate([selection] * 4)
    structure = structure[jnp.asarray(rng.permutation(structure.shape[0]))]

    half = structure.shape[0] // 2
    intro = ar.slerp_loops(structure[:half], args.n_frames, 0.5, smoothing=16)
    drop = ar.slerp_loops(structure[half:], args.n_frames, 2, smoothing=4)

    d = args.drum_onsets[:, None, None]
    intro = (1 - 0.5 * d) * intro + 0.5 * d * selection[rng.randint(selection.shape[0])][None]

    w = args.drop_weight[:, None, None]
    latents = w * drop + (1 - w) * intro

    # color layers: palette A for the first movements, palette B afterwards
    colors_a = ar.slerp_loops(selection[: selection.shape[0] // 2], args.n_frames, 2, smoothing=16)
    colors_b = ar.slerp_loops(selection[selection.shape[0] // 2:], args.n_frames, 2, smoothing=16)
    switch = jnp.arange(args.n_frames)[:, None, None] >= int(SECTIONS[3] * args.n_frames)
    colors = jnp.where(switch, colors_b, colors_a)
    cut = latents.shape[1] * 2 // 3
    latents = latents.at[:, cut:].set(colors[:, cut:])
    return ar.gaussian_filter(latents, 2)
