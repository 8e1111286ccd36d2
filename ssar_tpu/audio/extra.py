"""Additional MIR features: HPCP, spectral peaks, tempogram ratio.

Equivalent of ssar/analysis/audio_features.py (madmom/essentia-style
features used in the preliminary analysis study): a harmonic pitch-class
profile built from weighted spectral peaks, and a tempogram-ratio feature
summarising rhythmic structure relative to the global tempo.  Pure jnp,
static shapes (peak picking is dense masked math, not dynamic gathers).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .beat import onset_strength
from .spectral import spectrogram


def spectral_peaks(S: jax.Array, sr: int, n_fft: int = 2048, threshold_db: float = -60.0):
    """Dense local-max peak mask + interpolated frequencies/magnitudes.

    S (F, T) magnitude; returns (freqs (F, T), mags (F, T), mask (F, T)).
    """
    mag_db = 20.0 * jnp.log10(jnp.maximum(S, 1e-10))
    ref = jnp.max(mag_db)
    above = mag_db > (ref + threshold_db)

    Sp = jnp.pad(S, ((1, 1), (0, 0)))
    localmax = (S > Sp[:-2]) & (S >= Sp[2:])

    # parabolic interpolation of the peak position
    num = 0.5 * (Sp[:-2] - Sp[2:])
    den = Sp[:-2] - 2 * S + Sp[2:]
    shift = jnp.where(jnp.abs(den) > 1e-12, num / jnp.where(jnp.abs(den) > 1e-12, den, 1.0), 0.0)

    bins = jnp.arange(S.shape[0], dtype=S.dtype)[:, None]
    freqs = (bins + shift) * sr / n_fft
    mask = localmax & above
    return freqs, S, mask


@partial(jax.jit, static_argnames=("sr", "n_bins", "f_ref", "n_harmonics"))
def hpcp(y: jax.Array, sr: int, n_bins: int = 12, f_ref: float = 440.0,
         n_harmonics: int = 4, fmin: float = 100.0, fmax: float = 5000.0) -> jax.Array:
    """Harmonic pitch-class profile, (T, n_bins), max-normalised per frame.

    Each spectral peak contributes cos^2-weighted energy to the pitch
    classes of its first `n_harmonics` subharmonics (essentia's HPCP
    algorithm family).
    """
    S = spectrogram(y, power=1.0)
    freqs, mags, mask = spectral_peaks(S, sr)

    valid = mask & (freqs > fmin) & (freqs < fmax)
    w = jnp.where(valid, mags**2, 0.0)

    out = jnp.zeros((n_bins, S.shape[1]))
    window_size = 4.0 / 3.0  # semitones
    for h in range(1, n_harmonics + 1):
        f_h = freqs / h
        pc = (n_bins * jnp.log2(jnp.maximum(f_h, 1e-6) / f_ref)) % n_bins
        contrib = w * (0.8 ** (h - 1))
        for b in range(n_bins):
            d = jnp.abs(((pc - b + n_bins / 2) % n_bins) - n_bins / 2)
            weight = jnp.where(d <= window_size / 2 * (n_bins / 12),
                               jnp.cos(np.pi / 2 * d / (window_size * (n_bins / 12))) ** 2, 0.0)
            out = out.at[b].add(jnp.sum(contrib * weight, axis=0))

    return (out / (jnp.max(out, axis=0, keepdims=True) + 1e-12)).T


@partial(jax.jit, static_argnames=("sr", "win_size", "hop_size", "f_min", "f_max",
                                   "global_thr", "local_thr", "bins_per_octave",
                                   "whitening", "filter_width", "harmonic_decay",
                                   "harmonic_tolerance", "norm_frames", "final_thr"))
def raw_hpcp(y: jax.Array, sr: int, win_size: int = 4096, hop_size: int = 512,
             f_min: float = 100.0, f_max: float = 5000.0, global_thr: float = 80.0,
             local_thr: float = 30.0, bins_per_octave: int = 12,
             whitening: bool = True, filter_width: float = 1 / 3.0,
             harmonic_decay: float = 0.6, harmonic_tolerance: float = 2 / 3.0,
             norm_frames: bool = False, final_thr: float = 0.0) -> jax.Array:
    """Full HPCP pipeline (ssar/analysis/audio_features.py:139-345
    ``raw_hpcp``): dB thresholding (global + per-frame local), parabolic
    peak interpolation, a multi-octave pitch profile, spectral whitening,
    harmonic summation, and octave folding.  (T, bins_per_octave).

    TPU redesign of the numpy/scipy original: the sparse COO pitch profile
    becomes a dense one-hot scatter-add; whitening's moving average and the
    decay-weighted cosine harmonic-summation kernel both run as 1-D convs
    along the log-frequency axis — the whole pipeline is static-shape
    elementwise + conv work under one jit.
    """
    S = spectrogram(y, n_fft=win_size, hop_length=hop_size, power=1.0)  # (F, T)
    freqs_bin = jnp.arange(S.shape[0], dtype=jnp.float32) * sr / win_size
    band = (freqs_bin > f_min) & (freqs_bin < f_max)

    # dB magnitudes, thresholded relative to the global max then per frame
    Y_dB = 20.0 * jnp.log10(jnp.maximum(S, 1e-10))
    Y_dB = jnp.where(band[:, None], Y_dB, -jnp.inf)
    X = jnp.maximum(Y_dB - jnp.max(Y_dB) + global_thr, 0.0)
    if local_thr < global_thr:
        X = jnp.where(X < jnp.max(X, axis=0, keepdims=True) - local_thr, 0.0, X)

    # parabolic peak interpolation on the dB spectrum (reference :229-250)
    Xp = jnp.pad(X, ((1, 1), (0, 0)))
    a1, a2, a3 = Xp[:-2], X, Xp[2:]
    peaks = (a2 > a1) & (a2 > a3) & band[:, None]
    den = a1 - 2 * a2 + a3
    d = jnp.where(peaks & (jnp.abs(den) > 1e-12),
                  0.5 * (a1 - a3) / jnp.where(jnp.abs(den) > 1e-12, den, 1.0), 0.0)
    F = (jnp.arange(S.shape[0], dtype=jnp.float32)[:, None] + d) * sr / win_size
    A_dB = jnp.where(peaks, a2 - d / 4 * (a1 - a3), 0.0)
    A_lin = jnp.where(peaks, 10.0 ** ((A_dB - global_thr) / 20.0), 0.0)

    # multi-octave pitch profile: dense scatter of peak magnitudes into
    # constant-Q bins (replaces the reference's scipy coo_matrix)
    midi = jnp.where(F > 0, 69.0 + 12.0 * jnp.log2(jnp.maximum(F, 1e-6) / 440.0), 0.0)
    # round-to-NEAREST bin: the reference truncates (coo indices .astype(int),
    # :274), which systematically drops interpolated peaks a hair flat of a
    # note into the semitone below — rounding is the intended binning
    pp_bin = jnp.clip(jnp.round(bins_per_octave * midi / 12.0).astype(jnp.int32), 0,
                      bins_per_octave * 11 - 1)
    n_pp = bins_per_octave * 11  # MIDI range 0..131 ~ 11 octaves
    onehot = jax.nn.one_hot(pp_bin, n_pp, dtype=X.dtype)  # (F, T, n_pp)
    pp = jnp.einsum("ft,ftp->tp", A_lin, onehot)  # (T, n_pp)

    if whitening:
        # subtract a moving average over filter_width octaves (:283-293)
        k = max(int(bins_per_octave * filter_width), 1)
        kern = jnp.full((1, 1, k), 1.0 / k, pp.dtype)
        ma = jax.lax.conv_general_dilated(pp[:, None, :], kern, (1,),
                                          [((k - 1) // 2, k // 2)],
                                          dimension_numbers=("NCH", "OIH", "NCH"))[:, 0]
        pp = jnp.maximum(pp - ma, 0.0)

    # harmonic summation as one conv with the precomputed decay*cos^2
    # kernel over log-frequency (:297-331)
    n_oct = 4
    r = np.arange(-n_oct * bins_per_octave, n_oct * bins_per_octave + 1) / bins_per_octave
    f_ratio = 2.0 ** r
    n_harm = np.round(f_ratio)
    d_harm = np.abs(f_ratio - n_harm)
    width = np.log(2.0 ** (harmonic_tolerance / 12.0))
    w = np.where(d_harm < width, np.cos(d_harm * (np.pi / 2) / width) ** 2, 0.0)
    w = w * np.where(n_harm > 0, harmonic_decay ** np.maximum(n_harm - 1, 0), 0.0)
    w = (w / w.sum()).astype(np.float32)
    kw = jnp.asarray(w)[None, None, :]
    L = w.shape[0]
    hpp = jax.lax.conv_general_dilated(pp[:, None, :], kw, (1,),
                                       [((L - 1) // 2, L // 2)],
                                       dimension_numbers=("NCH", "OIH", "NCH"))[:, 0]

    # fold octaves at every C (:334-340) — reshape-sum, 11 octaves
    pcp = hpp.reshape(-1, 11, bins_per_octave).sum(axis=1)

    if norm_frames:  # (:343-349; density normalisation kept dense)
        pcp = pcp - jnp.min(pcp, axis=1, keepdims=True)
        mx = jnp.max(pcp, axis=1, keepdims=True)
        pcp = jnp.where(mx > 0, pcp / jnp.maximum(mx, 1e-12), pcp)
        if final_thr > 0:
            pcp = (1 - final_thr) * (pcp - final_thr) * (pcp > final_thr)
    return pcp


def tempogram_ratio(y: jax.Array, sr: int, bpm: float, n_ratios: int = 8) -> jax.Array:
    """Energy of the autocorrelation tempogram at rational multiples of the
    global tempo — a compact rhythmic-structure descriptor. (n_ratios,)."""
    env = onset_strength(y, sr)
    env = env - jnp.mean(env)
    n = env.shape[0]
    f = jnp.fft.rfft(env, n=2 * n)
    ac = jnp.fft.irfft(f * jnp.conj(f))[:n]
    ac = jnp.maximum(ac, 0.0) / (ac[0] + 1e-12)

    period = 60.0 * sr / (1024.0 * bpm)
    ratios = jnp.asarray([0.25, 1 / 3, 0.5, 2 / 3, 1.0, 1.5, 2.0, 3.0])[:n_ratios]
    lags = jnp.clip(jnp.round(period * ratios).astype(jnp.int32), 0, n - 1)
    return ac[lags]
