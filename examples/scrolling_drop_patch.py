"""Animated-bend patch: endless scroll during the drop (tauceti idiom).

The reference's tauceti.py applies a *time-varying* network bend — a
horizontal translation of an inner feature level whose offset ramps 0 -> W
in bar-length loops during the drop, so the video appears to scroll
endlessly while the latents stay put (ssar/patches/examples/tauceti.py:
93-140).  Per-section color latents own the layers above ``color_layer``.

ssar_tpu expresses this with the bend "modulation" channel: the bend dict
carries a per-frame array, the render loop hands each batch its slice, and
the transform receives (x, mod) — all traced, so the animation costs no
recompiles.  The roll is a vmapped jnp.roll (dynamic-slice under jit).
"""
import jax
import jax.numpy as jnp

import ssar_tpu.generate.audioreactive as ar

COLOR_LAYER = 9
SCROLL_LEVEL = 2  # bend the 16x16 feature map: lower = more fluid


def initialize(args):
    args.kick = ar.compress(
        ar.onsets(args.audio, args.sr, args.n_frames, fmin=30, fmax=200,
                  clip=95, smooth=1.5), 0.5, 0.5)
    # drop = the louder half of the clip (stand-in for hand-timed bounds)
    vol = ar.volume(args.audio, args.sr, args.n_frames, smooth=40)
    args.drop_mask = (vol > jnp.median(vol)).astype(jnp.float32)

    # scroll fraction: repeating 0->1 ramps (6 s loops), frozen outside the drop
    loop = max(int(6 * args.fps), 2)
    ramp = (jnp.arange(args.n_frames) % loop) / loop
    args.scroll = ramp * args.drop_mask
    return args


def get_latents(selection, args):
    n = selection.shape[0]
    structure = ar.slerp_loops(selection[: max(n // 2, 2)], args.n_frames, 2, smoothing=8)
    structure = ar.ModulatedLatents(0.4 * args.kick, structure, selection[-1])
    colors = ar.slerp_loops(selection[n // 2:], args.n_frames, 1, smoothing=20)
    latents = structure.at[:, COLOR_LAYER:].set(colors[:, COLOR_LAYER:])
    return ar.gaussian_filter(latents, 1.5)


def get_bends(args):
    def scroll(x, frac):
        # x (B, H, W, C), frac (B,) in [0, 1]: per-frame horizontal roll
        shift = (frac * x.shape[2]).astype(jnp.int32)
        return jax.vmap(lambda xi, s: jnp.roll(xi, s, axis=1))(x, shift)

    return [{"layer": SCROLL_LEVEL, "transform": scroll, "modulation": args.scroll}]


def get_noise(height, width, scale, num_scales, args):
    if height > 64:
        return None
    key = jax.random.PRNGKey(7 + scale)
    base = ar.gaussian_filter(jax.random.normal(key, (args.n_frames, height, width)), 10)
    return base / (2.5 * base.std())
