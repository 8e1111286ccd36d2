"""Music-structure segmentation switching the NOISE character per section.

Complementary to section_scene_switch (which switches latents): the
Laplacian segmentation (reference ssar/features/rosa/segment.py via
ar.laplacian_segmentation) selects, per section, one of several noise
velocity fields — quiet sections drift, loud sections boil — while the
latents ride a single continuous loop.  Uses percentile_clip to keep the
section energy envelope tame (4_contact idiom).
"""
import jax
import jax.numpy as jnp

import ssar_tpu.generate.audioreactive as ar


def initialize(args):
    args.sections = ar.laplacian_segmentation(args.audio, args.sr, args.n_frames, ks=(4,))[:, 0]
    energy = ar.rms(args.audio, args.sr, args.n_frames, smooth=10)
    args.energy = ar.percentile_clip(energy, 95)
    return args


def get_latents(selection, args):
    return ar.spline_loops(selection[:6], args.n_frames, 1, smoothing=10)


def get_noise(height, width, scale, num_scales, args):
    if height > 64:
        return None
    key = jax.random.PRNGKey(scale)
    ks = jax.random.split(key, 4)
    sigmas = [24.0, 12.0, 5.0, 1.5]  # per-section drift -> boil
    fields = jnp.stack([
        ar.gaussian_filter(jax.random.normal(k, (args.n_frames, height, width)), s)
        for k, s in zip(ks, sigmas)
    ])  # (4, T, H, W)
    onehot = jax.nn.one_hot(args.sections, 4).T[:, :, None, None]  # (4, T, 1, 1)
    out = jnp.sum(onehot * fields, axis=0)
    out = out * (0.5 + args.energy[:, None, None])
    return out / (jnp.std(out) + 1e-8)
