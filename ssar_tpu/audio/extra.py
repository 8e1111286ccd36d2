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
