"""Example patch: "Shella" — chroma-weighted focus latents over a
hand-indexed spline-loop base, with a tiny additive-noise network bend on
the lowest synthesis block.

Ported idioms (reference ssar/patches/examples/shella.py):
- ``base = spline_loops(selection[[0,1,0,2,3,4,3,5,7,8,9,10]], ...)`` —
  hand-picked repeat indices make the loop revisit home frames (:53)
- ``latents = focus_onsets * chroma_weight_latents(...) + (1-...) * base``
  then ``gaussian_filter(3, causal=0.2)`` (:58-62)
- ``latents[:, 12:] = base[:, 12:]`` — the BASE keeps the color layers
  (inverse of the usual override) (:64-65)
- noise std normalized with a stochastic gain ``std * (1 + rand())`` (:84)
- ``a_lil_noise = randn(1, 1, 4, 8)`` added to the b4 conv output via a
  forward hook (:153-157) — here an AddNoise bend on layer 0
"""
import jax
import jax.numpy as jnp
import numpy as np

import ssar_tpu.generate.audioreactive as ar


def initialize(args):
    args.focus_onsets = ar.onsets(args.audio, args.sr, args.n_frames,
                                  fmin=500, clip=95, smooth=3)
    args.focus_chroma = ar.chroma(args.audio, args.sr, args.n_frames)
    return args


def get_latents(selection, args):
    focus_latents = ar.chroma_weight_latents(args.focus_chroma, selection[:12])

    idx = jnp.asarray(np.array([0, 1, 0, 2, 3, 4, 3, 5, 7, 8, 9, 10]) % selection.shape[0])
    base = ar.spline_loops(selection[idx], args.n_frames, 1)

    f = args.focus_onsets[:, None, None]
    latents = f * focus_latents + (1 - f) * base
    latents = ar.gaussian_filter(latents, 3, causal=0.2)

    cut = latents.shape[1] * 2 // 3  # the reference's layer 12
    return latents.at[:, cut:].set(base[:, cut:])


def get_noise(height, width, scale, num_scales, args):
    if height > 128:
        return None
    key = jax.random.PRNGKey(99 + scale)
    k1, k2 = jax.random.split(key)
    # the layer-0 pad bend (get_bends) makes levels after the const block
    # render 2:1 — noise fields follow (scale 0 is pre-bend, stays square)
    shape = (args.n_frames, height, width if scale == 0 else 2 * width)
    noise = ar.gaussian_filter(jax.random.normal(k1, shape), 64)
    noiser = ar.gaussian_filter(jax.random.normal(k2, shape), 2)
    d = args.focus_onsets[:, None, None]
    noise = d * noiser + (1 - d) * noise
    gain = 1.0 + np.random.RandomState(scale).rand()
    return noise / (noise.std() * gain)


def get_bends(args):
    # the reference registers a forward hook on G.synthesis.b4.conv1 adding
    # randn(1, 1, 4, 8); expressed here as an AddNoise bend on layer 0 (NHWC)
    a_lil_noise = 0.2 * jax.random.normal(jax.random.PRNGKey(4), (1, 4, 8, 1))
    return [{"layer": 0, "transform": ar.sequential(ar.replication_pad(2, 2),
                                                    ar.AddNoise(a_lil_noise))}]
