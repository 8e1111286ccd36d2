"""Per-track palettes over a live-set tracklist (cbc_* idiom).

The cbc live-set patches assign every track in the set its own latent
palette and loop style, bar-quantized to the track's BPM
(ssar/patches/examples/cbc_wavefunk.py ``get_loops_per_track``): track k
slerps through palette slice k for ``n_bars`` bars per loop, and tracks
crossfade at their boundaries.  This example uses fractional boundaries so
it renders on any clip; for a real set use absolute seconds.
"""
import jax.numpy as jnp

import ssar_tpu.generate.audioreactive as ar

# (start fraction, bars per loop, smoothing) per track
TRACKS = [
    (0.00, 4, 12),
    (0.35, 2, 6),
    (0.70, 1, 3),
]
XFADE_S = 0.25  # crossfade length in seconds


def initialize(args):
    args.bpm = ar.tempo(args.audio, args.sr)
    args.kick = ar.compress(
        ar.onsets(args.audio, args.sr, args.n_frames, fmin=30, fmax=200,
                  clip=95, smooth=1.5), 0.5, 0.5)
    return args


def get_latents(selection, args):
    n = selection.shape[0]
    per = max(n // len(TRACKS), 2)
    dur = args.n_frames / args.fps
    beats_per_bar = 4.0
    f = jnp.arange(args.n_frames, dtype=jnp.float32)

    latents = jnp.zeros((args.n_frames, selection.shape[1], selection.shape[2]))
    weight_sum = jnp.zeros((args.n_frames, 1, 1))
    for k, (frac, bars, smooth) in enumerate(TRACKS):
        start = frac * dur
        end = TRACKS[k + 1][0] * dur if k + 1 < len(TRACKS) else dur
        # bar-quantized loop count for this track's section
        sec_beats = args.bpm / 60.0 * (end - start)
        n_loops = max(sec_beats / (beats_per_bar * bars), 1.0)
        pal = selection[k * per:(k + 1) * per + 1]
        track_lat = ar.slerp_loops(pal, args.n_frames, n_loops, smoothing=smooth)
        # smooth boundary window (crossfade at both edges)
        ramp = XFADE_S * args.fps
        w = jnp.clip((f - start * args.fps) / ramp, 0, 1) * jnp.clip((end * args.fps - f) / ramp, 0, 1)
        latents = latents + w[:, None, None] * track_lat
        weight_sum = weight_sum + w[:, None, None]
    latents = latents / jnp.maximum(weight_sum, 1e-4)
    latents = ar.ModulatedLatents(0.4 * args.kick, latents, selection[-1])
    return ar.gaussian_filter(latents, 1.5)
