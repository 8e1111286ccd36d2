"""Named audio features + the canonical 59-dim ``audio2features`` stack.

Equivalent of ssar/features/audio.py and the feature pipeline in
ssar/supervised/data.py:32-107.  All functions take a mono waveform already
at ``sr = 1024 * fps`` (static length) and return frame-rate features with
``T = len(audio) // 1024`` rows.

The whole stack is one jittable program (per static (length, sr) signature);
tuning estimation for chroma is host-resolved and quantised (see
ssar_tpu/audio/pitch.py), which keeps the CQT plan static.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dct import dct
from ..ops.quantile import clamp_lower_percentile, clamp_peaks_percentile
from .beat import onset_strength, plp
from .convert import power_to_db
from .processing import emphasize, gaussian_filter, high_pass, low_pass, mid_pass, normalize
from .spectral import chroma_cens, chroma_cqt, hpss, istft, melspectrogram, spectrogram, stft

_FN = [
    *[f"mfcc_{i}" for i in range(20)],
    *[f"chroma_{i}" for i in range(12)],
    *[f"tonnetz_{i}" for i in range(6)],
    *[f"contrast_{i}" for i in range(7)],
    "flatness",
    "onsets",
    "onsets_low",
    "onsets_mid",
    "onsets_high",
    "pulse",
    "harmonic_rms",
    "harmonic_rms_low",
    "harmonic_rms_mid",
    "harmonic_rms_high",
    "long_rms",
    "long_rms_low",
    "long_rms_mid",
    "long_rms_high",
]
FEATURE_NAMES = _FN
N_FEATURES = len(FEATURE_NAMES)  # 59


# ------------------------------------------------------------ components --
# Every public component is jitted: the axon TPU backend has no eager
# kernels for complex ops (angle/abs/div on complex64), so anything that
# touches an STFT must execute as a compiled XLA program.  Non-array
# arguments are static, giving one specialisation per (length, sr) pair.
@partial(jax.jit, static_argnames=("margin",))
def harmonic(audio: jax.Array, margin: float = 8.0) -> jax.Array:
    """HPSS harmonic component back in the time domain (audio.py:13-17)."""
    S = stft(audio)
    H, _ = hpss(S, margin=margin)
    return istft(H, length=audio.shape[0])


@partial(jax.jit, static_argnames=("margin",))
def percussive(audio: jax.Array, margin: float = 8.0) -> jax.Array:
    S = stft(audio)
    _, P = hpss(S, margin=margin)
    return istft(P, length=audio.shape[0])


@partial(jax.jit, static_argnames=("sr",))
def onsets(audio: jax.Array, sr: int) -> jax.Array:
    """Normalised onset envelope of the percussive component, (T, 1) (audio.py:27-28)."""
    return normalize(onset_strength(percussive(audio), sr))[:, None]


@partial(jax.jit, static_argnames=("sr", "frame_length", "hop_length", "center", "pad_mode"))
def rms(y: jax.Array, sr: int, frame_length: int = 2048, hop_length: int = 1024,
        center: bool = True, pad_mode: str = "reflect") -> jax.Array:
    """Framewise root-mean-square, (T, 1) (audio.py:31-37)."""
    from .spectral import frame_signal

    frames = frame_signal(y, frame_length, hop_length, center=center,
                          pad_mode=pad_mode)[:-1]
    power = jnp.mean(jnp.abs(frames) ** 2, axis=1)
    return jnp.sqrt(power)[:, None]


@partial(jax.jit, static_argnames=("sr",))
def drop_strength(audio: jax.Array, sr: int) -> jax.Array:
    """Long-term RMS with tanh emphasis, (T, 1) (audio.py:40-41)."""
    return emphasize(gaussian_filter(rms(audio, sr), 10), strength=10, percentile=50)[:, None]


def _chromagram_impl(audio: jax.Array, sr: int, tuning=None, method: str = "recursive") -> jax.Array:
    """Unjitted core: `tuning` may be None (device-estimated), a host float
    (static CQT plan), or a traced scalar (interpolated basis)."""
    h = harmonic(audio)
    if tuning is None:
        from .pitch import estimate_tuning_device

        tuning = estimate_tuning_device(h, sr)
    return chroma_cens(h, sr, tuning=tuning, method=method).T


@partial(jax.jit, static_argnames=("sr", "tuning", "method"))
def chromagram(audio: jax.Array, sr: int, tuning: float | None = None,
               method: str = "recursive") -> jax.Array:
    """CENS chroma of the (re-)harmonic-separated audio, (T, 12) (audio.py:44-45).

    With ``tuning=None`` the deviation is estimated on-device (traced scalar
    -> interpolated CQT basis), avoiding any host sync inside the program.
    """
    return _chromagram_impl(audio, sr, tuning, method=method)


@partial(jax.jit, static_argnames=("sr", "tuning", "method"))
def tonnetz(y: jax.Array, sr: int, chroma: jax.Array | None = None, tuning: float | None = None,
            method: str = "recursive") -> jax.Array:
    """Tonal centroid features, (T, 6) (audio.py:48-57)."""
    if chroma is None:
        chroma = chromagram(y, sr, tuning=tuning, method=method).T  # (12, T)
    else:
        chroma = chroma.T
    n = chroma.shape[0]
    dim_map = jnp.linspace(0, 12, n)
    scale = jnp.asarray([7.0 / 6, 7.0 / 6, 3.0 / 2, 3.0 / 2, 2.0 / 3, 2.0 / 3])
    V = scale[:, None] * dim_map[None, :]
    V = V.at[::2].add(-0.5)
    R = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.5, 0.5])
    phi = R[:, None] * jnp.cos(jnp.pi * V)
    ton = jnp.matmul(phi, chroma / jnp.linalg.norm(chroma, ord=1, axis=0),
                     precision=jax.lax.Precision.HIGHEST)
    return ton.T


@partial(jax.jit, static_argnames=("sr", "n_mfcc"))
def mfcc(y: jax.Array, sr: int, n_mfcc: int = 20) -> jax.Array:
    """(T, 20) (audio.py:60-65)."""
    S = power_to_db(melspectrogram(y, sr))
    M = dct(S.T, norm="ortho").T[:n_mfcc]
    return M.T


@partial(jax.jit, static_argnames=("sr",))
def pulse(audio: jax.Array, sr: int) -> jax.Array:
    """(T, 1) predominant local pulse of the percussive component (audio.py:68-69)."""
    return plp(percussive(audio), sr)[:, None]


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length", "fmin", "n_bands", "quantile", "linear"))
def spectral_contrast(y: jax.Array, sr: int, n_fft: int = 2048, hop_length: int = 1024,
                      fmin: float = 200.0, n_bands: int = 6, quantile: float = 0.02,
                      linear: bool = False) -> jax.Array:
    """Octave-band spectral valley/peak contrast, (T, 7) (audio.py:72-123).

    Band memberships depend only on (sr, n_fft) — resolved host-side in
    numpy so each band is a static slice of the sorted spectrogram.
    """
    S = spectrogram(y, n_fft=n_fft, hop_length=hop_length)

    freq = np.linspace(0, float(sr) / 2, int(1 + n_fft // 2))
    octa = np.zeros(n_bands + 2)
    octa[1:] = fmin * (2.0 ** np.arange(0, n_bands + 1))

    valleys, peaks = [], []
    for k in range(n_bands + 1):
        f_low, f_high = octa[k], octa[k + 1]
        current_band = (freq >= f_low) & (freq <= f_high)
        if not current_band.any():  # band above nyquist (low fps/sr): use top bin
            current_band[-1] = True
        idx = np.flatnonzero(current_band)
        if k > 0:
            current_band[idx[0] - 1] = True
        if k == n_bands:
            current_band[idx[-1] + 1 :] = True
        band_rows = np.flatnonzero(current_band)
        sub = S[band_rows[0] : band_rows[-1] + 1]
        if k < n_bands:
            sub = sub[:-1]
        n_take = int(max(round(quantile * current_band.sum()), 1))
        srt = jnp.sort(sub, axis=0)
        valleys.append(jnp.mean(srt[:n_take], axis=0))
        peaks.append(jnp.mean(srt[-n_take:], axis=0))

    valley = jnp.stack(valleys)
    peak = jnp.stack(peaks)
    if linear:
        return (peak - valley).T
    return (power_to_db(peak) - power_to_db(valley)).T


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length", "amin", "power"))
def spectral_flatness(y: jax.Array, sr: int, n_fft: int = 2048, hop_length: int = 1024,
                      amin: float = 1e-10, power: float = 2.0) -> jax.Array:
    """(T, 1) (audio.py:126-133)."""
    S = spectrogram(y, n_fft=n_fft, hop_length=hop_length, power=1.0)
    S_thresh = jnp.maximum(amin, S**power)
    gmean = jnp.exp(jnp.mean(jnp.log(S_thresh), axis=0))
    amean = jnp.mean(S_thresh, axis=0)
    return (gmean / amean)[:, None]


# ------------------------------------------------------ the 59-dim stack --
# The stack runs as a small pipeline of medium-sized jitted stages rather
# than one fused program: the axon remote compiler rejects the fully-fused
# 59-dim graph, and staging also keeps per-signature compile times sane.
# Within each stage XLA still CSEs the shared STFTs and fuses everything.

@partial(jax.jit, static_argnames=())
def _stage_hp(audio: jax.Array):
    """Harmonic + percussive from one shared STFT."""
    S = stft(audio)
    H, P = hpss(S, margin=8.0)
    return istft(H, length=audio.shape[0]), istft(P, length=audio.shape[0])


@partial(jax.jit, static_argnames=("sr",))
def _stage_spectral(audio: jax.Array, sr: int):
    """mfcc (T,20) + contrast (T,7) + flatness (T,1) — one shared stft."""
    return mfcc(audio, sr), spectral_contrast(audio, sr), spectral_flatness(audio, sr)


@partial(jax.jit, static_argnames=("sr", "tuning", "method"))
def _stage_chroma(audio_harm: jax.Array, sr: int, tuning: float, method: str = "recursive"):
    chroma = chromagram(audio_harm, sr, tuning=tuning, method=method)
    return chroma, tonnetz(audio_harm, sr, chroma=chroma)


@partial(jax.jit, static_argnames=("sr", "method"))
def _stage_chroma_dev(audio_harm: jax.Array, sr: int, tuning: jax.Array, method: str = "recursive"):
    """Device-tuned variant: `tuning` is a traced scalar, no host sync."""
    chroma = _chromagram_impl(audio_harm, sr, tuning=tuning, method=method)
    return chroma, tonnetz(audio_harm, sr, chroma=chroma)


@partial(jax.jit, static_argnames=("sr",))
def _stage_onsets(audio_perc: jax.Array, sr: int):
    """Four band onsets via one batched mel pipeline + PLP."""
    from .beat import onset_strength_multi

    hp = high_pass(audio_perc, sr)
    # mid_pass == low_pass(high_pass(x)) (processing.py:145-146) — reuse hp
    bands = jnp.stack([audio_perc, low_pass(audio_perc, sr), low_pass(hp, sr), hp])
    envs = onset_strength_multi(bands, sr)
    return envs[0], envs[1], envs[2], envs[3], plp(audio_perc, sr)


def _rms_multi(signals: jax.Array, frame_length: int = 2048, hop_length: int = 1024) -> jax.Array:
    """Batched framewise RMS: (N, L) -> (N, T)."""
    from .spectral import frame_signal_batched

    p = frame_length // 2
    x = jnp.pad(signals, ((0, 0), (p, p)), mode="reflect")
    frames = frame_signal_batched(x, frame_length, hop_length)[:, :-1]
    return jnp.sqrt(jnp.mean(frames**2, axis=2))


@partial(jax.jit, static_argnames=("sr",))
def _stage_rms(audio_harm: jax.Array, audio: jax.Array, sr: int):
    """Eight band-RMS/drop-strength envelopes via one batched framing."""
    bands = jnp.stack([
        audio_harm, low_pass(audio_harm, sr), mid_pass(audio_harm, sr), high_pass(audio_harm, sr),
        audio, low_pass(audio, sr), mid_pass(audio, sr), high_pass(audio, sr),
    ])
    envs = _rms_multi(bands)  # (8, T)
    rms_envs = [envs[i][:, None] for i in range(4)]
    drops = []
    for i in range(4, 8):
        e = emphasize(gaussian_filter(envs[i][:, None], 10), strength=10, percentile=50)
        drops.append(e[:, None])
    return (*rms_envs, *drops)


@partial(jax.jit, static_argnames=("fps", "clamp", "smooth", "emphasis"))
def _stage_post(features: jax.Array, fps: int, clamp: bool, smooth: bool, emphasis: bool):
    if clamp:
        P = 2.5
        features = clamp_peaks_percentile(features, 100 - P)
        features = clamp_lower_percentile(features, 4 * P)
    if smooth:
        features = gaussian_filter(features, 0.1 * fps)
    if emphasis:
        features = emphasize(features, strength=2, percentile=75)
    return features


@partial(jax.jit, static_argnames=("sr", "fps", "clamp", "smooth", "emphasis", "tuning", "velocity",
                                   "cqt_method"))
def audio2features(audio: jax.Array, sr: int, fps: int, clamp: bool = True, smooth: bool = True,
                   emphasis: bool = False, tuning: float | None = None,
                   velocity: bool = False, cqt_method: str = "recursive") -> jax.Array:
    """(T, 59) canonical feature stack (ssar/supervised/data.py:59-107).

    `audio` may be (L,) mono or (C, L); resampled to 1024 * fps internally.

    Jitted end-to-end: one XLA program per (length, sr, fps) signature.
    The inner stages remain separately jitted for callers that want
    individual features, but under this outer jit they inline, which
    removes the per-stage dispatch round trips over the tunneled runtime
    (staged: ~90x realtime; fused: >100,000x on v5e for an 8 s clip).
    """
    from ..ops.resample import resample

    audio = jnp.asarray(audio)
    if audio.ndim == 2:
        audio = jnp.mean(audio, axis=0)
    target_sr = fps * 1024
    if sr != target_sr:
        audio = resample(audio, sr, target_sr, lowpass_filter_width=6)
        sr = target_sr

    audio_harm, audio_perc = _stage_hp(audio)

    mf, contrast, flat = _stage_spectral(audio, sr)
    if tuning is None:
        from .pitch import estimate_tuning_device

        # tuning stays a DEVICE scalar (histogram-quantised to 0.01 bins):
        # a host round trip costs ~30 ms on the tunneled runtime.  The
        # estimation window is padded/cropped to exactly 4 s so there is one
        # compile signature per (sr) regardless of track length.
        cap = 4 * sr
        seg = audio_harm[:cap]
        if seg.shape[0] < cap:
            seg = jnp.pad(seg, (0, cap - seg.shape[0]))
        tuning_arr = estimate_tuning_device(seg, sr, bins_per_octave=36)
        chroma, ton = _stage_chroma_dev(audio_harm, sr, tuning_arr, method=cqt_method)
    else:
        chroma, ton = _stage_chroma(audio_harm, sr, float(tuning), method=cqt_method)
    ons, ons_l, ons_m, ons_h, pls = _stage_onsets(audio_perc, sr)
    rms_envs = _stage_rms(audio_harm, audio, sr)

    single = [flat, ons, ons_l, ons_m, ons_h, pls, *rms_envs]
    features = jnp.concatenate(
        [mf, chroma, ton, contrast] + [s.reshape(-1, 1) for s in single], axis=1
    )
    if velocity:  # optional velocity channels (data.py:91-94): 59 -> 118 dims
        V = jnp.diff(gaussian_filter(features, fps), axis=0)
        V = jnp.concatenate([V[:1], V], axis=0)
        features = jnp.concatenate([features, V], axis=1)
    return _stage_post(features, fps, clamp, smooth, emphasis)
