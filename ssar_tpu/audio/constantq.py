"""Constant-Q / Variable-Q transform with a static multirate plan.

Equivalent of the recursive librosa-style CQT in
ssar/features/rosa/constantq.py, redesigned for XLA:

- The reference resamples octave-by-octave at runtime and builds torch
  filterbanks on the fly.  XLA wants static shapes, so the whole plan —
  per-octave signal lengths, FFT sizes, hops, and the complex FFT filter
  bases — is computed *once per (sr, hop, length, tuning, ...) signature*
  on the host in numpy and baked into the jitted program as constants.
- The per-octave responses are dense complex matmuls `basis @ STFT`
  (sparsification dropped: dense matmul is the MXU-friendly form;
  SURVEY.md §7 "hard parts").
- Octave halving uses the kaiser-sinc polyphase resampler
  (ssar_tpu/ops/resample.py) with torchaudio's default lowpass width 6,
  matching the reference's `resampling_method="kaiser_window"` call
  (constantq.py:86).

Tuning estimation (a data-dependent scalar) is resolved on the host and
quantised to the estimator's own 0.01-bin grid, so jit caching stays finite;
see ssar_tpu/audio/pitch.py.
"""
from __future__ import annotations

from functools import lru_cache
from math import ceil

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resample import resample
from ..utils.platform import complex_const
from .convert import C1_HZ
from .spectral import frame_signal, stft

HIGHEST = jax.lax.Precision.HIGHEST


def _hann_periodic(n: int) -> np.ndarray:
    return 0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / n))


def constant_q_lengths(sr: float, fmin: float, n_bins: int, bins_per_octave: int,
                       filter_scale: float = 1.0, gamma: float = 0.0) -> np.ndarray:
    alpha = 2.0 ** (1.0 / bins_per_octave) - 1.0
    Q = float(filter_scale) / alpha
    freq = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    return Q * sr / (freq + gamma / alpha)


def _constant_q_basis(sr: float, fmin: float, n_bins: int, bins_per_octave: int,
                      filter_scale: float = 1.0, gamma: float = 0.0):
    """Time-domain CQ filters, hann-windowed complex exponentials, L1-normed,
    centre-padded to the next power of two (constantq.py:223-263)."""
    lengths = constant_q_lengths(sr, fmin, n_bins, bins_per_octave, filter_scale, gamma)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)

    max_len = int(2.0 ** np.ceil(np.log2(np.max(lengths))))
    filters = np.zeros((n_bins, max_len), dtype=np.complex128)
    for k, (ilen, freq) in enumerate(zip(lengths, freqs)):
        ilen2 = int(ilen // 2)
        n = np.arange(-ilen2, ilen2)
        sig = np.exp(1j * 2 * np.pi * freq / sr * n) * _hann_periodic(len(n))
        sig = sig / np.sum(np.abs(sig))
        lpad = (max_len - len(sig)) // 2
        filters[k, lpad : lpad + len(sig)] = sig
    return filters, lengths


def _sparsify_rows(x: np.ndarray, quantile: float) -> np.ndarray:
    """Zero basis entries below the per-row cumulative-magnitude threshold
    (constantq.py:147-164).  The reference builds a sparse COO tensor; on TPU
    the basis stays a dense matmul constant, but the *zeroing* is reproduced
    exactly so the numerics match the torch reference bit-for-bit."""
    if quantile <= 0:
        return x
    mags = np.abs(x)
    norms = np.sum(mags, axis=1, keepdims=True)
    mag_sort = np.sort(mags, axis=1)
    cumulative = np.cumsum(mag_sort / norms, axis=1)
    out = np.zeros_like(x)
    for i in range(x.shape[0]):
        j = int(np.argmin(cumulative[i] < quantile))  # first idx at/above quantile
        keep = mags[i] >= mag_sort[i, j]
        out[i, keep] = x[i, keep]
    return out


@lru_cache(maxsize=32)
def _cqt_filter_fft(sr: float, fmin: float, n_bins: int, bins_per_octave: int,
                    filter_scale: float = 1.0, gamma: float = 0.0,
                    sparsity: float = 0.01):
    """FFT-domain basis (n_bins, n_fft//2 + 1) complex64 + n_fft."""
    basis, lengths = _constant_q_basis(sr, fmin, n_bins, bins_per_octave, filter_scale, gamma)
    n_fft = basis.shape[1]
    basis = basis * (lengths[:, None] / float(n_fft))
    fft_basis = np.fft.fft(basis, n=n_fft, axis=1)[:, : n_fft // 2 + 1]
    fft_basis = _sparsify_rows(fft_basis, sparsity)
    return fft_basis.astype(np.complex64), n_fft


@lru_cache(maxsize=32)
def _td_filter_bank(sr: float, fmin: float, n_bins: int, bins_per_octave: int,
                    filter_scale: float = 1.0, gamma: float = 0.0,
                    sparsity: float = 0.01):
    """Time-domain image of the (sparsified) one-sided FFT basis, stacked as
    one REAL matrix ``[Re(w); Im(w)]`` of shape (2*n_bins, n_fft).

    ``w[k, n] = sum_{f=0}^{N/2} fft_basis[k, f] * exp(-2pi i f n / N)`` so
    that ``frames @ w.T == fft_basis @ rfft(frames).T`` EXACTLY (same sum,
    reassociated): the group response becomes a single framed real matmul
    on the MXU instead of per-frame rFFTs, which are vector-unit-bound on
    TPU (measured: the n_fft=8192 STFT alone cost 71 ms of the 106 ms 40 s
    CQT; the matmul form removes it).  Derived from the sparsified basis so
    the numbers match the FFT path bit-for-bit in exact arithmetic.
    """
    fft_basis, n_fft = _cqt_filter_fft(sr, fmin, n_bins, bins_per_octave,
                                       filter_scale, gamma, sparsity)
    full = np.zeros((fft_basis.shape[0], n_fft), np.complex128)
    full[:, : fft_basis.shape[1]] = fft_basis
    w = np.fft.fft(full, axis=1)  # e^{-2pi i f n / N} kernel, all n
    return np.concatenate([w.real, w.imag], axis=0).astype(np.float32), n_fft


def _num_two_factors(x: int) -> int:
    if x <= 0:
        return 0
    n = 0
    while x % 2 == 0:
        n += 1
        x //= 2
    return n


def cqt(y: jax.Array, sr: int, hop_length: int = 1024, fmin: float | None = None,
        n_bins: int = 84, bins_per_octave: int = 12, tuning: float | None = 0.0,
        filter_scale: float = 1.0, method: str = "direct") -> jax.Array:
    return vqt(y, sr, hop_length=hop_length, fmin=fmin, n_bins=n_bins, gamma=0.0,
               bins_per_octave=bins_per_octave, tuning=tuning, filter_scale=filter_scale,
               method=method)


def _vqt_direct(y: jax.Array, sr: int, hop_length: int, fmin: float, n_bins: int,
                bins_per_octave: int, filter_scale: float, gamma: float,
                max_fft: int = 8192) -> jax.Array:
    """TPU-preferred CQT formulation: instead of the reference's
    octave-by-octave chain (constantq.py:76-99 — 7 sequential resamples +
    7 STFTs), octaves are processed in *groups* whose shared FFT basis fits
    `max_fft`; between groups the signal is decimated by 2^g with ONE
    polyphase conv.  For a 7-octave bpo-36 CQT this is 2 STFTs + 2 matmuls
    + 1 resample instead of 7+7+6, every op MXU/FFT-shaped, and no
    accumulated multi-stage resampling error within a group."""
    n_octaves = int(np.ceil(float(n_bins) / bins_per_octave))
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    top_base = float(np.min(freqs[-bins_per_octave:]))  # lowest freq of top octave

    # how many octaves fit per group: longest filter of a g-octave group at
    # the (local) rate is ~ Q * sr / (top_base / 2^(g-1))
    alpha = 2.0 ** (1.0 / bins_per_octave) - 1.0
    Q = float(filter_scale) / alpha
    g = 1
    while g < n_octaves:
        longest = Q * sr / ((top_base * 2.0 ** -(g)) + gamma / alpha) if gamma else \
            Q * sr / (top_base * 2.0 ** -(g))
        if 2 ** int(np.ceil(np.log2(longest))) > max_fft:
            break
        g += 1

    responses = []
    my_y, my_sr, my_hop = y, float(sr), hop_length
    bins_done = 0
    shift = 0
    while bins_done < n_bins:
        n_grp = min(g, n_octaves - shift)
        grp_bins = min(n_grp * bins_per_octave, n_bins - bins_done)
        grp_fmin = top_base * 2.0 ** -(shift + n_grp - 1)
        # group response as ONE real framed matmul (see _td_filter_bank):
        # frames @ w.T == fft_basis @ rfft(frames).T, MXU-shaped
        wri, n_fft = _td_filter_bank(my_sr, grp_fmin, grp_bins, bins_per_octave,
                                     filter_scale, gamma)
        frames = frame_signal(my_y, n_fft, my_hop, center=True, pad_mode="reflect")[:-1]
        resp = jnp.matmul(jnp.asarray(wri * np.sqrt(2**shift)), frames.T,
                          precision=HIGHEST)
        # lax.complex, not `re + 1j*im`: the latter promotes through an
        # eager complex ufunc the axon runtime lacks (utils/platform.py:26)
        responses.append(jax.lax.complex(resp[:grp_bins], resp[grp_bins:]))

        bins_done += grp_bins
        shift += n_grp
        if bins_done < n_bins:
            factor = 2**n_grp
            my_y = resample(my_y, factor, 1, lowpass_filter_width=6) * np.sqrt(factor)
            my_sr /= factor
            my_hop //= factor

    max_col = min(r.shape[-1] for r in responses)
    rows = []
    end = n_bins
    for r in responses:  # top group first
        n_r = r.shape[0]
        rows.append(r[-min(end, n_r):, :max_col])
        end -= n_r
    V = jnp.concatenate(rows[::-1], axis=0)
    lengths = constant_q_lengths(sr, fmin, n_bins, bins_per_octave, filter_scale, gamma)
    return V / jnp.sqrt(jnp.asarray(lengths[:, None], dtype=V.real.dtype))


def vqt(y: jax.Array, sr: int, hop_length: int = 1024, fmin: float | None = None,
        n_bins: int = 84, gamma: float | None = None, bins_per_octave: int = 12,
        tuning: float | None = 0.0, filter_scale: float = 1.0,
        method: str = "direct") -> jax.Array:
    """Complex VQT, shape (n_bins, T) with T = len(y) // hop_length.

    `tuning=None` estimates tuning from the signal (host round-trip through
    a 0.01-quantised grid; one extra jit specialisation per distinct value).
    `method`: "direct" (one rFFT + one matmul, TPU-preferred) or
    "recursive" (the reference's octave-halving chain; kept for parity
    studies — the two agree to resampling error, see tests).
    """
    n_octaves = int(np.ceil(float(n_bins) / bins_per_octave))
    n_filters = min(bins_per_octave, n_bins)
    alpha = 2.0 ** (1.0 / bins_per_octave) - 1.0

    if fmin is None:
        fmin = C1_HZ
    if tuning is None:
        from .pitch import estimate_tuning

        tuning = float(estimate_tuning(y, sr, bins_per_octave=bins_per_octave))
    if gamma is None:
        gamma = 24.7 * alpha / 0.108

    fmin = fmin * 2.0 ** (tuning / bins_per_octave)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    fmin_t = float(np.min(freqs[-bins_per_octave:]))

    if method == "direct":
        return _vqt_direct(y, sr, hop_length, float(fmin), n_bins, bins_per_octave,
                           filter_scale, float(gamma))

    if _num_two_factors(hop_length) < n_octaves - 1:
        raise ValueError(f"hop_length must be a multiple of 2^{n_octaves - 1} for a {n_octaves}-octave CQT/VQT")

    responses = []
    my_y, my_sr, my_hop = y, float(sr), hop_length
    my_len = y.shape[0]
    for i in range(n_octaves):
        if i > 0:
            my_y = resample(my_y, 2, 1, lowpass_filter_width=6) * np.sqrt(2)
            my_sr /= 2.0
            my_hop //= 2
            my_len = ceil(my_len / 2)
        fft_basis, n_fft = _cqt_filter_fft(my_sr, fmin_t * 2.0**-i, n_filters, bins_per_octave,
                                           filter_scale, gamma)
        fft_basis = fft_basis * np.sqrt(2**i)
        D = stft(my_y, n_fft=n_fft, hop_length=my_hop, window=None, pad_mode="reflect")[:, :-1]
        # complex_const: the axon runtime can't upload complex constants eagerly
        responses.append(jnp.matmul(complex_const(fft_basis), D, precision=HIGHEST))

    max_col = min(r.shape[-1] for r in responses)
    rows = []
    end = n_bins
    for r in responses:  # top octave first (constantq.py:167-186)
        n_oct = r.shape[0]
        rows.append(r[-min(end, n_oct):, :max_col])
        end -= n_oct
    V = jnp.concatenate(rows[::-1], axis=0)

    lengths = constant_q_lengths(sr, fmin, n_bins, bins_per_octave, filter_scale, gamma)
    return V / jnp.sqrt(jnp.asarray(lengths[:, None], dtype=V.real.dtype))
