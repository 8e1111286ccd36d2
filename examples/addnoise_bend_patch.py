"""Feature-space bend: replication pad + additive noise at an early layer.

The kelp.py idiom (reference ssar/patches/examples/kelp.py:112-119): widen
the 4x4 trunk features 2:1 with replication padding and disguise the
repetition with a fixed additive noise texture, composed with
``ar.sequential``.
"""
import jax

import ssar_tpu.generate.audioreactive as ar


def initialize(args):
    args.groove = ar.compress(
        ar.onsets(args.audio, args.sr, args.n_frames, clip=95, smooth=3), 0.5, 0.5
    )
    return args


def get_latents(selection, args):
    base = ar.spline_loops(selection[:5], args.n_frames, 1, smoothing=12)
    return ar.ModulatedLatents(0.4 * args.groove, base, selection[5])


def get_bends(args):
    key = jax.random.PRNGKey(7)
    texture = 0.025 * jax.random.normal(key, (1, 4, 8, 1))  # NHWC
    transform = ar.sequential(
        ar.replication_pad(left=2, right=2),
        ar.AddNoise(texture),
    )
    return [{"layer": 0, "transform": transform}]
