"""Example patch file: Laplacian-segmentation scene switching.

Each musical section (verse/chorus/bridge, found by the differentiable
Laplacian segmentation — reference idiom: ssar/random/mir.py feeding
segmentation-type subpatches, ssar/random/latent.py) gets its own latent
"scene": a slow slerp loop through a section-specific palette slice.
Scene changes crossfade over ~half a second; within a scene, onsets punch
an accent latent on the structure layers only.

Render with::

    from ssar_tpu.generate import audioreactive as ar
    mod = ar.load_patch_module("examples/section_scene_switch.py")
    latents, noises = ar.render_patch(mod, audio, sr, palette=palette,
                                      synthesizer=syn, out_file="out.mp4")
"""
import jax
import jax.numpy as jnp

import ssar_tpu.generate.audioreactive as ar


def initialize(args):
    # K=4 section labels per frame (hard labels from the rosa-flavour
    # segmentation pipeline), one-hot + crossfaded for latent mixing
    labels = ar.laplacian_segmentation(args.audio, args.sr, args.n_frames, ks=(4,))[:, 0]
    onehot = jax.nn.one_hot(labels, 4)                      # (T, 4)
    args.scene_weights = ar.gaussian_filter(onehot, args.fps / 48)  # ~0.5 s fade
    args.scene_weights = args.scene_weights / (
        jnp.sum(args.scene_weights, axis=1, keepdims=True) + 1e-8)

    args.onsets = ar.onsets(args.audio, args.sr, args.n_frames, clip=95, smooth=2)
    args.onsets = ar.compress(args.onsets, 0.5, 0.5)
    return args


def get_latents(selection, args):
    # one slow loop per scene over a disjoint palette slice
    scenes = [ar.slerp_loops(selection[2 * k: 2 * k + 3], args.n_frames, 1, smoothing=12)
              for k in range(4)]
    latents = sum(args.scene_weights[:, k, None, None] * scenes[k] for k in range(4))

    # onsets punch an accent latent into the coarse-structure layers
    accent = ar.ModulatedLatents(0.6 * args.onsets, latents, selection[8])
    n_struct = min(6, latents.shape[1])
    latents = latents.at[:, :n_struct].set(accent[:, :n_struct])
    return ar.gaussian_filter(latents, 1.5)


def get_noise(height, width, scale, num_scales, args):
    # scene changes also swap the noise texture
    key = jax.random.PRNGKey(scale)
    banks = jax.random.normal(key, (4, height, width))
    base = jnp.einsum("Tk,khw->Thw", args.scene_weights, banks)
    flicker = jax.random.normal(jax.random.split(key)[1],
                                (args.n_frames, height, width))
    return ar.ModulatedNoise(0.5 * args.onsets, base, flicker)
