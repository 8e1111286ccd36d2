"""Sequence-parallel audio feature extraction: time-axis sharding over the mesh.

The reference handles long tracks by slicing overlapping windows on one GPU
(SURVEY.md §5.7); the TPU-native scaling axis for minutes-long tracks is
SP — shard the track across chips (SURVEY.md §2.8):

- the waveform is split into per-device chunks with a halo (the receptive
  field of the framewise ops: HPSS median 31 frames + smoothing),
- a vmapped, jitted core computes *unclamped, unsmoothed* per-chunk
  features with the chunk axis sharded over the mesh's data axis,
- halos are trimmed, chunks concatenated, and the *global* percentile
  clamps + gaussian smoothing run once over the assembled (T, 59) matrix
  (tiny), preserving the reference's whole-track clamp semantics.

Interior frames of the *local* features (mfcc, chroma, tonnetz, contrast,
flatness, onsets, rms) match the unsharded pipeline to float precision
(tests/test_parallel.py).  Documented deviations: features with whole-track
normalisation context — PLP's tempogram peak masking and drop-strength's
global min/max emphasis — use chunk-local context in SP mode, and IIR band
splits carry chunk-local state; frames within `halo` of a boundary see
chunk-local STFT padding.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..audio import features as FT
from .mesh import get_mesh

HALO_FRAMES = 48  # > hpss median (31) + gaussian radius (~10)


@partial(jax.jit, static_argnames=("sr", "tuning"))
def _chunk_core(chunks: jax.Array, sr: int, tuning: float) -> jax.Array:
    """(N, Lc) waveform chunks -> (N, Tc, 59) raw features (no clamp/smooth)."""

    def core(audio):
        harm, perc = FT._stage_hp.__wrapped__(audio)
        mf, contrast, flat = FT._stage_spectral.__wrapped__(audio, sr)
        chroma, ton = FT._stage_chroma.__wrapped__(harm, sr, tuning)
        ons = FT._stage_onsets.__wrapped__(perc, sr)
        rms_envs = FT._stage_rms.__wrapped__(harm, audio, sr)
        single = [flat, ons[0][:, None], ons[1][:, None], ons[2][:, None], ons[3][:, None],
                  ons[4][:, None], *rms_envs]
        return jnp.concatenate([mf, chroma, ton, contrast]
                               + [s.reshape(-1, 1) for s in single], axis=1)

    return jax.vmap(core)(chunks)


def audio2features_sharded(audio, sr: int, fps: int, mesh=None, clamp: bool = True,
                           smooth: bool = True, tuning: float | None = None) -> jax.Array:
    """(L,) waveform -> (T, 59), with per-chunk compute sharded over the mesh."""
    from ..audio.pitch import estimate_tuning
    from ..ops.quantile import clamp_lower_percentile, clamp_peaks_percentile
    from ..ops.gaussian import gaussian_filter

    mesh = mesh or get_mesh()
    n_dev = mesh.devices.size
    audio = jnp.asarray(audio, jnp.float32)
    target_sr = fps * 1024
    if sr != target_sr:
        from ..ops.resample import resample

        audio = resample(audio, int(sr), target_sr, lowpass_filter_width=6)
        sr = target_sr

    T = audio.shape[0] // 1024
    frames_per_chunk = int(np.ceil(T / n_dev))
    halo = min(HALO_FRAMES, frames_per_chunk)
    Lc = (frames_per_chunk + 2 * halo) * 1024

    # build overlapping chunks (host-side gather, static shapes)
    pad = jnp.pad(audio[: T * 1024], (halo * 1024, halo * 1024 + frames_per_chunk * n_dev * 1024))
    starts = np.arange(n_dev) * frames_per_chunk * 1024
    chunks = jnp.stack([jax.lax.dynamic_slice(pad, (int(s),), (Lc,)) for s in starts])

    if tuning is None:
        tuning = estimate_tuning(FT.harmonic(chunks[0][: 4 * sr]), sr, bins_per_octave=36)

    chunks = jax.device_put(chunks, NamedSharding(mesh, P("data", None)))
    feats = _chunk_core(chunks, sr, float(tuning))  # (N, Tc, 59)

    # trim halos + reassemble on a single logical axis
    feats = feats[:, halo : halo + frames_per_chunk]
    feats = feats.reshape(-1, feats.shape[-1])[:T]

    if clamp:
        Pq = 2.5
        feats = clamp_peaks_percentile(feats, 100 - Pq)
        feats = clamp_lower_percentile(feats, 4 * Pq)
    if smooth:
        feats = gaussian_filter(feats, 0.1 * fps)
    return feats
