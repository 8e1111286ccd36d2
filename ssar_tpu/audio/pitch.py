"""Pitch tracking and tuning estimation (masked, scatter-free).

Equivalent of ssar/features/rosa/pitch.py.  The reference gathers dynamic
index sets (torch.argwhere) — impossible under XLA static shapes — so the
TPU version keeps everything as dense masked arrays: parabolic-interpolated
pitch candidates are computed for *every* bin and invalid entries carry a
zero mask; the tuning histogram is a masked weighted histogram.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import spectrogram


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length", "fmin", "fmax", "threshold"))
def piptrack(y: jax.Array, sr: int, n_fft: int = 2048, hop_length: int | None = None,
             fmin: float = 150.0, fmax: float = 4000.0, threshold: float = 0.1):
    """Parabolic-interpolation pitch tracking.

    Returns (pitches, mags, mask): dense (1 + n_fft//2, T) arrays; `mask`
    marks bins that the reference would have scattered into its sparse
    output (pitch.py:27-83).
    """
    if hop_length is None:
        hop_length = n_fft // 4  # torch.stft default used by the reference's call chain
    S = spectrogram(y, n_fft=n_fft, hop_length=hop_length)

    fmin = max(fmin, 0.0)
    fmax = min(fmax, float(sr) / 2)
    fft_freqs = jnp.linspace(0, float(sr) / 2, int(1 + n_fft // 2))

    avg = 0.5 * (S[2:] - S[:-2])
    shift_den = 2 * S[1:-1] - S[2:] - S[:-2]
    shift = avg / (shift_den + (jnp.abs(shift_den) < np.finfo(np.float32).tiny))
    avg = jnp.pad(avg, ((1, 1), (0, 0)))
    shift = jnp.pad(shift, ((1, 1), (0, 0)))
    dskew = 0.5 * avg * shift

    freq_mask = ((fmin <= fft_freqs) & (fft_freqs < fmax))[:, None]
    ref_value = threshold * jnp.max(S, axis=0)

    Sm = S * (S > ref_value)
    Sm_pad = jnp.pad(Sm, ((1, 1), (0, 0)))
    localmax = (Sm > Sm_pad[:-2]) & (Sm >= Sm_pad[2:])

    mask = freq_mask & localmax
    bin_idx = jnp.arange(S.shape[0], dtype=S.dtype)[:, None]
    pitches = jnp.where(mask, (bin_idx + shift) * float(sr) / n_fft, 0.0)
    mags = jnp.where(mask, S + dskew, 0.0)
    return pitches, mags, mask


def _masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    from ..ops.quantile import masked_quantile

    return masked_quantile(x, mask, 0.5)


@partial(jax.jit, static_argnames=("resolution", "bins_per_octave"))
def _tuning_from_piptrack(pitches: jax.Array, mags: jax.Array, pmask: jax.Array,
                          resolution: float = 0.01, bins_per_octave: int = 12) -> jax.Array:
    pitch_mask = (pitches > 0) & pmask
    threshold = jnp.where(jnp.any(pitch_mask), _masked_median(mags, pitch_mask), 0.0)
    sel = (mags >= threshold) & pitch_mask

    # residual of each candidate relative to the nearest bin (pitch.py:98-120)
    A440 = 440.0
    octs = jnp.log2(jnp.where(sel, pitches, 1.0) / (A440 / 16))
    residual = (bins_per_octave * octs) % 1.0
    residual = jnp.where(residual >= 0.5, residual - 1.0, residual)

    bins = int(np.ceil(1.0 / resolution))
    counts, _ = jnp.histogram(residual.reshape(-1), bins=bins, range=(-0.5, 0.5),
                              weights=sel.reshape(-1).astype(jnp.float32))
    tuning_grid = jnp.linspace(-0.5, 0.5, bins + 1)
    return tuning_grid[jnp.argmax(counts)]


def estimate_tuning_device(y: jax.Array, sr: int, n_fft: int = 2048, resolution: float = 0.01,
                           bins_per_octave: int = 12) -> jax.Array:
    """Tuning deviation as a DEVICE scalar (already grid-quantised by the
    histogram argmax) — no host sync; pair with the device-interpolated
    chroma path (spectral.chroma_cqt_device_tuned)."""
    pitches, mags, pmask = piptrack(y, sr, n_fft=n_fft)
    return _tuning_from_piptrack(pitches, mags, pmask, resolution=resolution,
                                 bins_per_octave=bins_per_octave)


def estimate_tuning(y: jax.Array, sr: int, n_fft: int = 2048, resolution: float = 0.01,
                    bins_per_octave: int = 12) -> float:
    """Tuning deviation in fractional bins; returned as a *host float* already
    quantised to the estimator's own `resolution` grid, so downstream static
    CQT plans get a finite number of jit specialisations.

    Runs as two jitted stages (piptrack, then histogram) — the axon remote
    compiler intermittently rejects the fully-fused program.
    """
    pitches, mags, pmask = piptrack(y, sr, n_fft=n_fft)
    t = float(_tuning_from_piptrack(pitches, mags, pmask, resolution=resolution,
                                    bins_per_octave=bins_per_octave))
    return round(t / resolution) * resolution
