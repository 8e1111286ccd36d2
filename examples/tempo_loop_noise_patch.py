"""Example patch file: bar-synced loops + lazy noise-module algebra.

The cbc_* reference patches (ssar/patches/examples/cbc_wavefunk.py et al.)
lock everything to the beat grid: latents slerp through the palette once
per N bars, and the noise for each generator layer is an expression tree
of looped banks blended/modulated by envelopes — evaluated lazily per
render chunk so a full-track 1024px noise video never exists in memory
(ssar/random/noise.py:4-140).

TPU-native notes:

- ``ar.tempo`` estimates BPM on device (lognorm-prior Fourier tempogram);
  ``TempoLoopLatents``/``TempoLoopNoise`` quantize the loop length to
  whole bars at the detected BPM.
- the ``Loop``/``Blend``/``Modulate``/``ScaleBias`` classes from
  ``ssar_tpu.generate.noise`` are key-threaded (jax.random) and window
  -lazy: ``noise(i, b)`` materialises only frames [i, i+b).
- returning a Noise *module* (not an array) from ``get_noise`` keeps the
  render loop streaming; `render_patch`/`sample` evaluate it per chunk.

Render with::

    from ssar_tpu.generate import audioreactive as ar
    mod = ar.load_patch_module("examples/tempo_loop_noise_patch.py")
    latents, noises = ar.render_patch(mod, audio, sr, palette=palette,
                                      synthesizer=syn, out_file="out.mp4")
"""
import jax
import jax.numpy as jnp

import ssar_tpu.generate.audioreactive as ar
from ssar_tpu.generate.noise import Blend, Loop, Modulate, ScaleBias


def initialize(args):
    args.bpm = ar.tempo(args.audio, args.sr)
    args.kick = ar.compress(
        ar.onsets(args.audio, args.sr, args.n_frames, fmin=30, fmax=200,
                  clip=95, smooth=1.5), 0.5, 0.5)
    args.air = ar.gaussian_filter(
        ar.rms(args.audio, args.sr, args.n_frames, smooth=20), 5)
    return args


def get_latents(selection, args):
    # one pass through the palette every 4 bars, kick-punched toward anchor
    base = ar.TempoLoopLatents(args.bpm, selection, args.n_frames,
                               n_bars=4, fps=args.fps)
    k = args.kick[:, None, None]
    return (1 - 0.5 * k) * base + 0.5 * k * selection[:1]


def get_noise(height, width, scale, num_scales, args):
    key = jax.random.PRNGKey(100 + scale)
    k1, k2 = jax.random.split(key)
    # a looping bank (one cycle per 2 bars) blended by the air envelope,
    # then kick-modulated between the two
    frames_per_bar = args.fps * 4 * 60.0 / float(args.bpm)
    n_loops = max(args.n_frames / max(2 * frames_per_bar, 1e-6), 1e-3)
    loop = Loop(k1, args.n_frames, (height, width), n_loops=n_loops)
    blend = Blend(k2, args.n_frames, (height, width),
                  modulator=args.air[:, None])
    mixed = Modulate(loop, blend, args.kick[:, None])
    # quiet the lowest scales so structure stays readable
    gain = 0.5 if scale < 2 else 1.0
    return ScaleBias(mixed, scale=gain, bias=0.0)
