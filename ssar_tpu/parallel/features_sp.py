"""Sequence-parallel audio feature extraction: time-axis sharding over the mesh.

The reference handles long tracks by slicing overlapping windows on one GPU
(SURVEY.md §5.7); the TPU-native scaling axis for minutes-long tracks is
SP — shard the track across chips (SURVEY.md §2.8) with a TWO-PASS design
that preserves the reference's whole-track semantics:

Pass 1 (sharded, heavy): the waveform is split into per-device chunks with
a halo covering every local receptive field (HPSS median 31 frames, STFT
framing, IIR settle time ~ms), and a vmapped jitted core computes the
frame-local features — mfcc, chroma, tonnetz, contrast, flatness — plus
*raw per-track envelopes*: band mel POWER spectrograms (pre-dB) and band
RMS.  The chunk axis is sharded over the mesh's data axis.

Pass 2 (global, tiny): halos are trimmed and the envelopes are assembled
into whole-track arrays (a few hundred KB for minutes of audio), on which
every feature with whole-track context runs exactly as in the unsharded
pipeline: power_to_db's global max reference + flux for the four onset
bands, PLP's 1024-frame tempogram + global normalisation, drop-strength's
global min/max/quantile emphasis, and the final percentile clamps +
gaussian smoothing (ssar/supervised/data.py:92-103).

Interior frames therefore match the unsharded pipeline to float precision
for ALL 59 features (tests/test_parallel.py); the only residual deviation
is chunk-local STFT/CQT padding within `halo` of a chunk boundary, which
the halo absorbs before trimming.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..audio import features as FT
from ..audio.beat import mel_power_multi, onset_env_from_melpower, plp_from_onset_env
from ..audio.processing import emphasize, high_pass, low_pass
from .mesh import get_mesh

# Receptive half-width of the heaviest local op chain: bottom-octave CQT
# filters (~32 frames) + CENS temporal smoothing (21) + resampler kernels.
HALO_FRAMES = 64


def _core(audio: jax.Array, sr: int, tuning: float):
    """(Lc,) waveform chunk -> frame-local features + raw envelopes:
    (local (Tc, 46), mel_bands (4, n_mels, Tc), rms (8, Tc)) where
    local = [mfcc 20 | chroma 12 | tonnetz 6 | contrast 7 | flatness 1]."""
    harm, perc = FT._stage_hp.__wrapped__(audio)
    mf, contrast, flat = FT._stage_spectral.__wrapped__(audio, sr)
    chroma, ton = FT._stage_chroma.__wrapped__(harm, sr, tuning)
    local = jnp.concatenate([mf, chroma, ton, contrast, flat.reshape(-1, 1)], axis=1)

    # raw onset-band mel power (percussive + low/mid/high) — dB'd globally
    hp_band = high_pass(perc, sr)
    bands = jnp.stack([perc, low_pass(perc, sr), low_pass(hp_band, sr), hp_band])
    mel_bands = mel_power_multi(bands, sr)  # (4, n_mels, Tc)

    # raw band RMS (harmonic x4, full x4) — drop-strength emphasis is global
    hp_h = high_pass(harm, sr)
    hp_a = high_pass(audio, sr)
    rms_sigs = jnp.stack([
        harm, low_pass(harm, sr), low_pass(hp_h, sr), hp_h,
        audio, low_pass(audio, sr), low_pass(hp_a, sr), hp_a,
    ])
    rms = FT._rms_multi(rms_sigs)  # (8, Tc)
    return local, mel_bands, rms


@partial(jax.jit, static_argnames=("sr", "tuning"))
def _chunk_core(chunks: jax.Array, sr: int, tuning: float):
    """vmapped chunk core — the SHARDED pass 1 (chunk axis over the mesh)."""
    return jax.vmap(lambda a: _core(a, sr, tuning))(chunks)


@partial(jax.jit, static_argnames=("sr", "tuning"))
def _chunk_core_seq(chunks: jax.Array, sr: int, tuning: float):
    """Sequential-in-one-program chunk core — the SINGLE-CHIP long-form
    pass 1.  lax.map (not vmap): the Pallas sliding-median inside HPSS has
    no batching rule for its ANY-memory-space operand, and a serial map
    matches the fused whole-track program's own serial structure while
    still amortising the per-dispatch tunnel round-trip across all chunks."""
    return jax.lax.map(lambda a: _core(a, sr, tuning), chunks)


def _chunk_plan(T: int, n_chunks: int, halo_frames: int = HALO_FRAMES):
    """Clamped chunk windows + per-chunk keep offsets (see module doc)."""
    fpc = int(np.ceil(T / n_chunks))
    halo = min(halo_frames, fpc)
    chunk_frames = fpc + 2 * halo
    starts = [min(max(i * fpc - halo, 0), T - chunk_frames) for i in range(n_chunks)]
    keep = [i * fpc - st for i, st in zip(range(n_chunks), starts)]
    return fpc, halo, chunk_frames, starts, keep


@partial(jax.jit, static_argnames=("fpc", "T", "sr", "fps", "clamp", "smooth"))
def _assemble(local, mel_bands, rms, keep_off, fpc, T, sr, fps, clamp, smooth):
    """Pass 2: trim keep windows, assemble whole-track envelopes, compute all
    global-context features + postprocessing.  Inputs are (N, ...) stacks.

    Jitted as ONE program: run eagerly this pass is ~10^2 individually-
    dispatched tiny ops, which on the tunneled runtime costs minutes of
    round trips + sub-threshold compiles on EVERY run (measured: the eager
    pass dominated the longform pipeline)."""
    from ..ops.gaussian import gaussian_filter
    from ..ops.quantile import clamp_lower_percentile, clamp_peaks_percentile

    def trim_cat(x, time_axis):
        x = jnp.moveaxis(x, time_axis, 1)  # (N, Tc, ...)
        parts = [jax.lax.dynamic_slice_in_dim(x[i], keep_off[i], fpc, axis=0)
                 for i in range(x.shape[0])]
        return jnp.concatenate(parts, axis=0)[:T]  # (T, ...)

    local = trim_cat(local, 1)                       # (T, 46)
    M = jnp.moveaxis(trim_cat(mel_bands, 3), 0, -1)  # (4, n_mels, T)
    R = trim_cat(jnp.moveaxis(rms, 1, 2), 1).T       # (8, T)

    onsets = onset_env_from_melpower(M, aggregate="mean")            # (4, T)
    plp_env = onset_env_from_melpower(M[:1], aggregate="median")[0]  # (T,)
    pulse = plp_from_onset_env(plp_env, sr)

    rms_cols = [R[i][:, None] for i in range(4)]
    drops = [emphasize(gaussian_filter(R[i][:, None], 10), strength=10, percentile=50)[:, None]
             for i in range(4, 8)]

    single = [local[:, 45:46], onsets[0][:, None], onsets[1][:, None], onsets[2][:, None],
              onsets[3][:, None], pulse[:, None], *rms_cols, *drops]
    feats = jnp.concatenate([local[:, :45]] + [s.reshape(-1, 1) for s in single], axis=1)

    if clamp:
        Pq = 2.5
        feats = clamp_peaks_percentile(feats, 100 - Pq)
        feats = clamp_lower_percentile(feats, 4 * Pq)
    if smooth:
        feats = gaussian_filter(feats, 0.1 * fps)
    return feats


def audio2features_long(audio, sr: int, fps: int, chunk_frames: int = 1440,
                        clamp: bool = True, smooth: bool = True,
                        tuning: float | None = None) -> jax.Array:
    """Long-form single-chip variant of the two-pass pipeline: ALL chunks
    batched through ONE vmapped per-chunk dispatch + one assembly dispatch.

    The fused whole-track program re-specialises per track length and on
    very long tracks overwhelms the remote compiler (docs/sp_scaling_tpu
    r4 carried its 20-minute compile timeout as an error row); chunking
    bounds the compiled program size.  Round-5 change: the chunks go
    through `_chunk_core` as one (N, Lc) batch instead of N sequential
    batch-1 dispatches — on the tunneled runtime each dispatch costs a
    host round-trip, and the batch-1 programs underfill the chip (measured
    127x -> 217x realtime on a 3-minute track at chunk=1440,
    scripts/bench_sp.py / docs/sp_scaling_tpu.json).
    Compile cost is per (n_chunks, fpc, sr) — shared by all tracks of the
    same length bucket.  Semantics identical to audio2features_sharded
    (same pass-1 core and pass-2 assembly; chunk windows clamped to the
    track extent, so no padded samples ever enter the global statistics).
    """
    from ..audio.pitch import estimate_tuning

    audio = jnp.asarray(audio, jnp.float32)
    target_sr = fps * 1024
    if sr != target_sr:
        from ..ops.resample import resample

        audio = resample(audio, int(sr), target_sr, lowpass_filter_width=6)
        sr = target_sr

    T = audio.shape[0] // 1024
    n_chunks = max(int(np.ceil(T / chunk_frames)), 1)
    fpc, halo, cf, starts, keep = _chunk_plan(T, n_chunks)
    if T <= cf:
        kwargs = {} if tuning is None else {"tuning": float(tuning)}
        return FT.audio2features(audio, sr, fps, clamp=clamp, smooth=smooth, **kwargs)

    track = audio[: T * 1024]
    if tuning is None:
        tuning = estimate_tuning(FT.harmonic(track[: 4 * sr]), sr, bins_per_octave=36)

    Lc = cf * 1024
    chunks = jnp.stack([jax.lax.dynamic_slice(track, (s0 * 1024,), (Lc,)) for s0 in starts])
    local, mel_bands, rms = _chunk_core_seq(chunks, sr, float(tuning))
    return _assemble(local, mel_bands, rms, keep, fpc, T, sr, fps, clamp, smooth)


def audio2features_sharded(audio, sr: int, fps: int, mesh=None, clamp: bool = True,
                           smooth: bool = True, tuning: float | None = None) -> jax.Array:
    """(L,) waveform -> (T, 59), with per-chunk compute sharded over the mesh."""
    from ..audio.pitch import estimate_tuning

    mesh = mesh or get_mesh()
    n_dev = mesh.devices.size
    audio = jnp.asarray(audio, jnp.float32)
    target_sr = fps * 1024
    if sr != target_sr:
        from ..ops.resample import resample

        audio = resample(audio, int(sr), target_sr, lowpass_filter_width=6)
        sr = target_sr

    T = audio.shape[0] // 1024
    fpc, halo, chunk_frames, start_frames, keep_off = _chunk_plan(T, n_dev)
    Lc = chunk_frames * 1024

    if T <= chunk_frames:
        # track fits in one chunk: SP buys nothing and chunk windows would
        # overlap the track edges with halo context the unsharded pipeline
        # doesn't have — run the reference-exact unsharded stack instead
        kwargs = {} if tuning is None else {"tuning": float(tuning)}
        return FT.audio2features(audio, sr, fps, clamp=clamp, smooth=smooth, **kwargs)

    # Chunk windows are CLAMPED to the track extent: the first chunk starts
    # at sample 0 and the last ends at T, so track-edge frames see exactly
    # the unsharded pipeline's boundary semantics (biquad zero state, STFT/
    # CQT reflect at the true track edge); interior chunks carry halos on
    # both sides.  Per-chunk trim offsets recover frames [i*fpc, (i+1)*fpc).
    track = audio[: T * 1024]
    chunks = jnp.stack([jax.lax.dynamic_slice(track, (s * 1024,), (Lc,)) for s in start_frames])

    if tuning is None:
        tuning = estimate_tuning(FT.harmonic(chunks[0][: 4 * sr]), sr, bins_per_octave=36)

    chunks = jax.device_put(chunks, NamedSharding(mesh, P("data", None)))
    local, mel_bands, rms = _chunk_core(chunks, sr, float(tuning))
    return _assemble(local, mel_bands, rms, keep_off, fpc, T, sr, fps, clamp, smooth)
