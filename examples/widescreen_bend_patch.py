"""Example patch file: network bending — widescreen render + reactive bends.

The maua-era patches splice transforms into the generator's feature levels
("bends"): the canonical use is a replication-pad on the 4x4 constant block
that makes every downstream level render at 2:1, plus an AddNoise bend that
textures the early features (ssar/patches/examples/01_intro.py:101-107;
the same Sequential(ReplicationPad2d, AddNoise) idiom appears in 2_mirage,
kelp, and tauceti).

This example shows the TPU-native equivalent: ``get_bends(args)`` returns
the reference's list-of-dicts, each transform a traceable NHWC function
that `ssar_tpu.gan.stylegan2.synthesis` applies to that level's activations
(`set_bends` re-jits the synthesizer so the bend fuses into the compiled
graph — there is no per-frame Python hook overhead as in torch).

Render with::

    from ssar_tpu.generate import audioreactive as ar
    mod = ar.load_patch_module("examples/widescreen_bend_patch.py")
    latents, noises = ar.render_patch(mod, audio, sr, palette=palette,
                                      synthesizer=syn, out_file="out.mp4")

Note: with the level-0 pad bend the output is (H, 2H); pass
``output_size=None`` (native) to the synthesizer, and let `get_noise`
return None so the generator's zero-noise path is used (caller-supplied
square noise would no longer match the bent shapes).
"""
import jax
import jax.numpy as jnp

import ssar_tpu.generate.audioreactive as ar


def initialize(args):
    # one smooth + one percussive envelope from the mix
    args.kick = ar.compress(ar.onsets(args.audio, args.sr, args.n_frames,
                                      clip=95, smooth=2), 0.5, 0.5)
    args.swell = ar.gaussian_filter(
        ar.rms(args.audio, args.sr, args.n_frames, smooth=50), 10)
    return args


def get_latents(selection, args):
    # slow slerp loop through the palette, punched toward one anchor on kicks
    base = ar.slerp_loops(selection, args.n_frames, n_loops=2, smoothing=12)
    anchor = selection[:1]
    k = args.kick[:, None, None]
    return (1 - 0.6 * k) * base + 0.6 * k * anchor


def get_bends(args):
    # widescreen: pad the 4x4 const block to 4x8 (2:1 output), then texture
    # the padded region with a fixed noise field scaled by the track's swell
    # envelope's mean (a static scalar at trace time keeps the jit cache warm)
    noise = 0.025 * jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 1))
    widescreen = ar.sequential(ar.replication_pad(2, 2), ar.AddNoise(noise))
    return [{"layer": 0, "transform": widescreen}]
