"""STFT / mel / HPSS / chroma — the spectral core (pure jnp, static shapes).

Equivalent of ssar/features/rosa/spectral.py (a differentiable librosa port).
TPU-first choices:
- STFT is framing-by-gather + one batched rFFT (XLA TPU FFT); the hann
  window and mel/chroma filterbanks are host-built numpy constants.
- All filterbank applications are dense f32 matmuls with HIGHEST precision
  (MXU), replacing the reference's sparse COO mm.
- HPSS median filters ride ssar_tpu.ops.median_filter (static window sort).
- The CENS spline quantizer's natural-cubic-spline coefficients are
  precomputed with scipy at import time (same knots as the reference's
  torchcubicspline constants, spectral.py:164-189).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.interpolate import CubicSpline

from ..ops.median import median_filter
from .convert import cq_to_chroma_matrix, hz_to_mel_np, mel_to_hz_np

HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------- windows --
@lru_cache(maxsize=None)
def hann_window(n: int) -> np.ndarray:
    """Periodic hann (torch.hann_window default)."""
    return (0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / n))).astype(np.float32)


# ------------------------------------------------------------------- stft --
def frame_signal(y: jax.Array, n_fft: int, hop_length: int, center: bool = True,
                 pad_mode: str = "reflect") -> jax.Array:
    """(L,) -> (n_frames, n_fft) frames; torch.stft center semantics.

    Framing is strided slices, not an element gather: on TPU the
    (n_frames, n_fft) index gather costs ~60 ms for a 40 s track at
    n_fft=8192 while the equivalent reshape+slice form costs ~1 ms (the
    gather was the dominant cost of the whole CQT, not the FFT).  Frame t,
    block k of width g = gcd(n_fft, hop) is rows ``k + t*(hop//g)`` of the
    signal viewed as (L//g, g) rows — one strided slice per block.  Falls
    back to the gather when the block count explodes (hop=1 tempogram).
    """
    from math import gcd

    if center:
        y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode=pad_mode)
    n_frames = (y.shape[0] - n_fft) // hop_length + 1
    g = gcd(n_fft, hop_length)
    n_blocks = n_fft // g
    if n_blocks <= 64 and n_frames > 0:
        step = hop_length // g
        R = y[: (y.shape[0] // g) * g].reshape(-1, g)
        cols = [jax.lax.slice(R, (k, 0), (k + (n_frames - 1) * step + 1, g), (step, 1))
                for k in range(n_blocks)]
        return jnp.concatenate(cols, axis=1)
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    return y[idx]


def frame_signal_batched(x: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """(N, L) -> (N, n_frames, n_fft); no padding (pad before calling).
    Same strided-slice framing as frame_signal (the TPU gather is the
    expensive op, not the FFT)."""
    from math import gcd

    N, L = x.shape
    n_frames = (L - n_fft) // hop_length + 1
    g = gcd(n_fft, hop_length)
    n_blocks = n_fft // g
    if n_blocks <= 64 and n_frames > 0:
        step = hop_length // g
        R = x[:, : (L // g) * g].reshape(N, -1, g)
        cols = [jax.lax.slice(R, (0, k, 0), (N, k + (n_frames - 1) * step + 1, g),
                              (1, step, 1))
                for k in range(n_blocks)]
        return jnp.concatenate(cols, axis=2)
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    return x[:, idx]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "window", "pad_mode"))
def stft(y: jax.Array, n_fft: int = 2048, hop_length: int = 1024, center: bool = True,
         window: str | None = "hann", pad_mode: str = "reflect") -> jax.Array:
    """Complex STFT, shape (n_fft//2 + 1, n_frames) — torch.stft layout."""
    frames = frame_signal(y, n_fft, hop_length, center, pad_mode)
    if window is not None:
        frames = frames * jnp.asarray(hann_window(n_fft))
    return jnp.fft.rfft(frames, axis=1).T


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "window", "length"))
def istft(spec: jax.Array, n_fft: int = 2048, hop_length: int = 1024, center: bool = True,
          window: str | None = "hann", length: int | None = None) -> jax.Array:
    """Inverse STFT via windowed overlap-add with window-square normalisation."""
    frames = jnp.fft.irfft(spec.T, n=n_fft, axis=1)  # (T, n_fft)
    win = jnp.asarray(hann_window(n_fft)) if window is not None else jnp.ones(n_fft, jnp.float32)
    frames = frames * win

    n_frames = frames.shape[0]
    out_len = (n_frames - 1) * hop_length + n_fft
    if hop_length == 1:
        # hop-1 overlap-add (the PLP inverse-tempogram path): the scatter is
        # y[m] = sum_k frames[m - k, k] — an anti-diagonal sum of the frame
        # matrix, expressed as one gather over a zero-padded copy plus a
        # K-axis reduction.  (The delta-kernel dense-conv formulation kept
        # it on the MXU but XLA's convolution passes compile it
        # pathologically above T ~ 1000 frames: >10 min at T=4320 on both
        # CPU and the remote TPU compiler; the gather compiles in seconds
        # and is bandwidth-bound at runtime.)
        T = n_frames
        L = out_len  # T + n_fft - 1
        fp = jnp.pad(frames, ((0, L - T), (0, 0)))
        m = jnp.arange(L)[:, None]
        k = jnp.arange(n_fft)[None, :]
        # (m - k) mod L: negative shifts wrap into the zero-padded tail, so
        # no mask is needed (m - k >= T also lands in padding by range).
        y = jnp.sum(jnp.take_along_axis(fp, (m - k) % L, axis=0), axis=1)
        w2 = win.astype(frames.dtype) ** 2
        env = jnp.convolve(jnp.ones(T, frames.dtype), w2, mode="full")
    elif 2 * hop_length == n_fft:
        # 50% overlap: overlap-add is two interleaved half-frames — pure
        # reshape+add instead of a scatter (slow path on TPU)
        first, second = frames[:, :hop_length], frames[:, hop_length:]
        blocks = first.at[1:].add(second[:-1])
        y = jnp.concatenate([blocks.reshape(-1), second[-1]])
        w2 = win.astype(frames.dtype) ** 2
        env_mid = w2[:hop_length] + w2[hop_length:]
        env = jnp.concatenate([w2[:hop_length][None],
                               jnp.broadcast_to(env_mid, (n_frames - 1, hop_length))]).reshape(-1)
        env = jnp.concatenate([env, w2[hop_length:]])
    else:
        idx = (jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]).reshape(-1)
        y = jnp.zeros(out_len, frames.dtype).at[idx].add(frames.reshape(-1))
        env = jnp.zeros(out_len, frames.dtype).at[idx].add(
            jnp.broadcast_to(win**2, (n_frames, n_fft)).reshape(-1))
    y = y / jnp.where(env > 1e-11, env, 1.0)

    if center:
        y = y[n_fft // 2:]
        if length is not None:
            y = y[:length] if y.shape[0] >= length else jnp.pad(y, (0, length - y.shape[0]))
        else:
            y = y[: out_len - n_fft]
    return y


def spectrogram(y: jax.Array, n_fft: int = 2048, hop_length: int = 1024, power: float = 1,
                window: str | None = "hann", center: bool = True, pad_mode: str = "reflect") -> jax.Array:
    """|STFT|^power with the reference's trailing-frame drop (spectral.py:59-62),
    giving exactly L // hop frames so one hop == one video frame."""
    S = stft(y, n_fft=n_fft, hop_length=hop_length, center=center, window=window, pad_mode=pad_mode)[:, :-1]
    return jnp.abs(S) ** power


# -------------------------------------------------------------------- mel --
@lru_cache(maxsize=None)
def mel_basis(sr: int, n_fft: int, n_mels: int = 128, fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Slaney mel filterbank (n_mels, 1 + n_fft//2), host-built."""
    if fmax is None:
        fmax = float(sr) / 2
    fftfreqs = np.linspace(0, float(sr) / 2, int(1 + n_fft // 2))
    min_mel, max_mel = hz_to_mel_np(fmin), hz_to_mel_np(fmax)
    mels = np.linspace(min_mel, max_mel, n_mels + 2)
    mel_f = mel_to_hz_np(mels)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def melspectrogram(y: jax.Array, sr: int, n_fft: int = 2048, hop_length: int = 1024,
                   window: str | None = "hann", center: bool = True, pad_mode: str = "reflect",
                   power: float = 2.0, fmax: float | None = None) -> jax.Array:
    S = spectrogram(y, n_fft=n_fft, hop_length=hop_length, power=power, window=window,
                    center=center, pad_mode=pad_mode)
    basis = jnp.asarray(mel_basis(sr, n_fft, fmax=fmax))
    return jnp.matmul(basis, S, precision=HIGHEST)


# ------------------------------------------------------------------- hpss --
def magphase(D: jax.Array, power: float = 1.0):
    mag = jnp.abs(D) ** power
    phase = jnp.exp(1.0j * jnp.angle(D))
    return mag, phase


def softmask(X: jax.Array, X_ref: jax.Array, power: float = 2.0, split_zeros: bool = False) -> jax.Array:
    """Soft mask X vs X_ref (ssar/features/rosa/spectral.py:120-142)."""
    Z = jnp.maximum(X, X_ref)
    bad = Z < np.finfo(np.float32).tiny
    Zs = jnp.where(bad, 1.0, Z)
    mask = (X / Zs) ** power
    ref_mask = (X_ref / Zs) ** power
    mask = mask / jnp.where(bad, 1.0, mask + ref_mask)
    fill = 0.5 if split_zeros else 0.0
    return jnp.where(bad, fill, mask)


def hpss(S: jax.Array, ks: int = 31, power: float = 2.0, margin: float = 1.0):
    """Median-filtering harmonic/percussive separation on a complex STFT
    (ssar/features/rosa/spectral.py:145-161): harmonic = median over time,
    percussive = median over frequency."""
    if jnp.iscomplexobj(S):
        S, phase = magphase(S)
    else:
        phase = 1.0
    harm = median_filter(S, ks, axis=1, mode="reflect")
    perc = median_filter(S, ks, axis=0, mode="reflect")
    split_zeros = margin == 1
    mask_harm = softmask(harm, perc * margin, power=power, split_zeros=split_zeros)
    mask_perc = softmask(perc, harm * margin, power=power, split_zeros=split_zeros)
    return (S * mask_harm) * phase, (S * mask_perc) * phase


# -------------------------------------------------- CENS spline quantizer --
Q_STEP = 0.25
_QUANT_ALPHA = 20.0


@lru_cache(maxsize=None)
def _quant_spline():
    """Natural-cubic-spline approximation of librosa's CENS step quantizer.

    Same knots as the reference's precomputed constants
    (ssar/features/rosa/spectral.py:164-189): quantization steps
    [0.4, 0.2, 0.1, 0.05] mapped onto a smooth ramp 0.5 -> 4.5.
    """
    p1, p2, p3, p4 = np.diff(list(reversed([0.4, 0.2, 0.1, 0.05] + [0])))
    xs = [
        np.linspace(-0.1, 0.025, 101)[:-1],
        np.linspace(0.025, p1, 11)[:-1],
        np.linspace(p1, p1 + p2, 11)[:-1],
        np.linspace(p1 + p2, p1 + p2 + p3, 11)[:-1],
        np.linspace(p1 + p2 + p3, 0.5, 11)[:-1],
        np.linspace(0.5, 1.1, 100),
    ]
    ys = np.concatenate([
        0.5 * np.ones(len(xs[0])),
        xs[1] / p1,
        (xs[2] - p1) / p2 + 1,
        (xs[3] - p1 - p2) / p3 + 2,
        (xs[4] - p1 - p2 - p3) / p4 + 3,
        4.5 * np.ones(len(xs[5])),
    ])
    xs = np.concatenate(xs)
    cs = CubicSpline(xs, ys, bc_type="natural")
    # cs.c is (4, n-1): value = c0*f^3 + c1*f^2 + c2*f + c3 on [x[i], x[i+1])
    return xs.astype(np.float32), cs.c.astype(np.float32)


def spline_eval(t: jax.Array) -> jax.Array:
    xs, c = _quant_spline()
    xs_j = jnp.asarray(xs)
    idx = jnp.clip(jnp.searchsorted(xs_j, t, side="right") - 1, 0, len(xs) - 2)
    f = t - xs_j[idx]
    c = jnp.asarray(c)
    return ((c[0, idx] * f + c[1, idx]) * f + c[2, idx]) * f + c[3, idx]


def step_function(w: jax.Array, h: float = Q_STEP, alpha: float = _QUANT_ALPHA) -> jax.Array:
    """Smooth staircase (ssar/features/rosa/spectral.py:205-214)."""
    r = (w - 0.5) - jnp.floor(w - 0.5) - 0.5
    m = 1.0 / (1.0 + np.exp(-alpha)) - 0.5
    return h * (jnp.floor(w - 0.5) + 1.0 / (2 * m) * 1.0 / (1.0 + jnp.exp(-2 * alpha * r)))


def spline_quantize(chroma: jax.Array) -> jax.Array:
    return step_function(spline_eval(chroma))


# ----------------------------------------------------------------- chroma --
def chroma_cqt(y: jax.Array, sr: int, hop_length: int = 1024, fmin: float | None = None,
               threshold: float | None = 0.0, tuning: float | None = None, n_chroma: int = 12,
               n_octaves: int = 7, bins_per_octave: int = 36, norm: bool = True,
               method: str = "recursive") -> jax.Array:
    """CQT -> chroma fold (ssar/features/rosa/spectral.py:286-325). (12, T).

    `method="recursive"` reproduces the reference's octave-halving CQT
    bit-for-bit (parity-verified vs the numpy oracle, tests/test_parity_oracle.py);
    "direct" is the grouped-octave formulation (fewer sequential stages,
    ~0.3% mean deviation from the reference in raw CQT bins).
    """
    from .constantq import cqt  # local import to avoid a cycle

    C = jnp.abs(cqt(y, sr=sr, hop_length=hop_length, fmin=fmin, n_bins=n_octaves * bins_per_octave,
                    bins_per_octave=bins_per_octave, tuning=tuning, method=method))
    fold = jnp.asarray(cq_to_chroma_matrix(C.shape[0], bins_per_octave=bins_per_octave,
                                           n_chroma=n_chroma, fmin=fmin))
    chroma = jnp.matmul(fold, C, precision=HIGHEST)
    if threshold is not None:
        chroma = jnp.where(chroma < threshold, 0.0, chroma)
    if norm:
        chroma = chroma / (jnp.max(chroma) + 1e-20)
    return chroma


def chroma_cqt_device_tuned(y: jax.Array, sr: int, tuning: jax.Array, hop_length: int = 1024,
                            fmin: float | None = None, n_chroma: int = 12, n_octaves: int = 7,
                            bins_per_octave: int = 36, threshold: float | None = 0.0,
                            norm: bool = True, method: str = "recursive") -> jax.Array:
    """chroma_cqt with the tuning correction applied ON DEVICE.

    The reference bakes tuning into the CQT filter frequencies
    (constantq.py:57, a host-side static choice, which would cost a ~30 ms
    device->host round trip per track on this runtime).  Instead the CQT is
    evaluated once on a half-bin-resolution grid (2x bins_per_octave) and
    the tuned bin magnitudes are linearly interpolated on device from the
    two neighbouring fine bins — `tuning` stays a traced scalar and the
    whole feature stack runs without a host sync.
    """
    from .constantq import cqt  # local import to avoid a cycle

    if fmin is None:
        from .convert import C1_HZ

        fmin = C1_HZ
    n_bins = n_octaves * bins_per_octave
    fine_bpo = 2 * bins_per_octave
    n_fine = 2 * n_bins + 2  # one fine-bin guard on each side
    fmin_fine = fmin * 2.0 ** (-1.0 / fine_bpo)

    C_fine = jnp.abs(cqt(y, sr=sr, hop_length=hop_length, fmin=fmin_fine, n_bins=n_fine,
                         bins_per_octave=fine_bpo, tuning=0.0, method=method))

    # coarse bin k at tuning tau sits at fine index 2k + 1 + 2*tau
    idx = 2.0 * jnp.arange(n_bins) + 1.0 + 2.0 * tuning
    lo = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, n_fine - 2)
    frac = (idx - lo)[:, None]
    C = C_fine[lo] * (1 - frac) + C_fine[lo + 1] * frac

    fold = jnp.asarray(cq_to_chroma_matrix(n_bins, bins_per_octave=bins_per_octave,
                                           n_chroma=n_chroma, fmin=fmin))
    chroma = jnp.matmul(fold, C, precision=HIGHEST)
    if threshold is not None:
        chroma = jnp.where(chroma < threshold, 0.0, chroma)
    if norm:
        chroma = chroma / (jnp.max(chroma) + 1e-20)
    return chroma


def chroma_cens(y: jax.Array, sr: int, hop_length: int = 1024, fmin: float | None = None,
                tuning=None, n_chroma: int = 12, n_octaves: int = 7,
                bins_per_octave: int = 36, win_len_smooth: int = 41,
                method: str = "recursive") -> jax.Array:
    """Chroma energy-normalised statistics (ssar/features/rosa/spectral.py:239-280). (12, T).

    `tuning` may be a host float (static basis, reference-exact) or a traced
    jax scalar (device-interpolated fine-grid path, no host sync).
    """
    if isinstance(tuning, jax.Array) and getattr(tuning, "ndim", None) == 0:
        chroma = chroma_cqt_device_tuned(y, sr, tuning, hop_length=hop_length, fmin=fmin,
                                         n_chroma=n_chroma, n_octaves=n_octaves,
                                         bins_per_octave=bins_per_octave, norm=False,
                                         method=method)
    else:
        chroma = chroma_cqt(y, sr, hop_length=hop_length, fmin=fmin, bins_per_octave=bins_per_octave,
                            tuning=tuning, n_chroma=n_chroma, n_octaves=n_octaves, norm=False,
                            method=method)
    # eps guard: silent frames (e.g. zero-padded chunk halos in SP mode)
    # must stay finite rather than 0/0
    chroma = chroma / (jnp.linalg.norm(chroma, ord=1, axis=0) + 1e-20)
    chroma_quant = spline_quantize(chroma)

    if win_len_smooth:
        win = hann_window(win_len_smooth + 2).astype(np.float32)
        win = win / win.sum()
        pad = (win_len_smooth + 2) // 2
        cq = jnp.pad(chroma_quant, ((0, 0), (pad, pad - 1 + (win_len_smooth + 2) % 2)))
        cens = jax.lax.conv_general_dilated(
            cq[:, None, :], jnp.asarray(win)[None, None, :], (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"), precision=HIGHEST,
        )[:, 0, :]
    else:
        cens = chroma_quant
    return cens / (jnp.linalg.norm(cens, ord=2, axis=0) + 1e-20)
