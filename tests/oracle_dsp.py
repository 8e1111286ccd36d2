"""Independent numpy oracle of the reference PyTorch/librosa DSP stack.

This module is a host-side, pure numpy/scipy transcription of the *behavior*
of the reference implementation (ssar/features/{audio,processing}.py and
ssar/features/rosa/{spectral,constantq,beat,pitch,convert,helpers}.py).
It intentionally imports NOTHING from ssar_tpu: it is the independent
numeric oracle that golden-vector parity tests compare the JAX
implementations against, standing in for librosa/torch which are not
available in this image (VERDICT round 1, "Next round" item 1).

Semantics notes (torch -> numpy):
- torch.stft(center=True, pad_mode="reflect") == np.pad(mode="reflect")
  framing with a periodic hann window (ssar/features/rosa/spectral.py:10-21).
- torch F.pad(mode="circular") == np.pad(mode="wrap");
  "replicate" == "edge".
- torch.quantile / np.quantile both use linear interpolation.
- torchaudio's kaiser-window sinc resampler is re-derived from its public
  algorithm (polyphase sinc * kaiser window, lowpass_filter_width=6,
  rolloff=0.99, beta=14.769656459379492) — used by the recursive CQT
  (ssar/features/rosa/constantq.py:86).
- torchcubicspline's natural cubic spline == scipy CubicSpline
  (bc_type="natural") by uniqueness of the interpolant.
"""
from __future__ import annotations

from functools import lru_cache
from math import ceil, gcd

import numpy as np
import scipy.fft
import scipy.signal
from scipy.interpolate import CubicSpline
from scipy.special import i0 as _bessel_i0

C1_HZ = 440.0 * 2.0 ** ((24 - 69) / 12.0)  # note_to_hz("C1")


# ------------------------------------------------------------------ stft --
def hann_np(n: int) -> np.ndarray:
    """Periodic hann (torch.hann_window default)."""
    return 0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / n))


def stft_np(y, n_fft=2048, hop_length=1024, center=True, window="hann", pad_mode="reflect"):
    """Complex STFT, (1 + n_fft//2, n_frames) — torch.stft layout."""
    y = np.asarray(y, dtype=np.float64)
    if center:
        y = np.pad(y, (n_fft // 2, n_fft // 2), mode=pad_mode)
    n_frames = (len(y) - n_fft) // hop_length + 1
    frames = np.lib.stride_tricks.sliding_window_view(y, n_fft)[:: hop_length][:n_frames]
    if window is not None:
        frames = frames * hann_np(n_fft)
    return np.fft.rfft(frames, axis=1).T


def istft_np(spec, n_fft=2048, hop_length=1024, center=True, window="hann", length=None):
    """Inverse STFT: windowed overlap-add with window-square normalisation
    (torch.istft semantics)."""
    frames = np.fft.irfft(spec.T, n=n_fft, axis=1)
    win = hann_np(n_fft) if window is not None else np.ones(n_fft)
    frames = frames * win
    n_frames = frames.shape[0]
    out_len = (n_frames - 1) * hop_length + n_fft
    y = np.zeros(out_len)
    env = np.zeros(out_len)
    for i in range(n_frames):
        y[i * hop_length : i * hop_length + n_fft] += frames[i]
        env[i * hop_length : i * hop_length + n_fft] += win**2
    y = y / np.where(env > 1e-11, env, 1.0)
    if center:
        y = y[n_fft // 2 :]
        if length is not None:
            y = y[:length] if len(y) >= length else np.pad(y, (0, length - len(y)))
        else:
            y = y[: out_len - n_fft]
    return y


def dct_np(x, norm=None):
    """DCT-II over the last axis (ssar/features/rosa/spectral.py:35-56)."""
    return scipy.fft.dct(np.asarray(x, dtype=np.float64), type=2, norm="ortho" if norm == "ortho" else None, axis=-1)


def spectrogram_np(y, n_fft=2048, hop_length=1024, power=1, window="hann", center=True, pad_mode="reflect"):
    """|STFT|^power with the reference's trailing-frame drop (spectral.py:59-62)."""
    S = stft_np(y, n_fft, hop_length, center, window, pad_mode)[:, :-1]
    return np.abs(S) ** power


# ------------------------------------------------------------------- mel --
def hz_to_mel_np(freq):
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(freq >= min_log_hz, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)


def mel_to_hz_np(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


def mel_np(sr, n_fft, n_mels=128, fmin=0.0, fmax=None):
    """Slaney mel filterbank (spectral.py:81-110)."""
    if fmax is None:
        fmax = float(sr) / 2
    fftfreqs = np.linspace(0, float(sr) / 2, int(1 + n_fft // 2))
    mel_f = mel_to_hz_np(np.linspace(hz_to_mel_np(fmin), hz_to_mel_np(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    return weights * enorm[:, None]


def melspectrogram_np(y, sr, n_fft=2048, hop_length=1024, power=2.0, fmax=None):
    S = spectrogram_np(y, n_fft=n_fft, hop_length=hop_length, power=power)
    return mel_np(sr, n_fft, fmax=fmax) @ S


def power_to_db_np(S, amin=1e-10, top_db=80.0):
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


# ------------------------------------------------------------------ hpss --
def median_filter_time_np(S, ks, axis):
    """Median filter along `axis` with reflect padding (processing.py:74-84
    as called by hpss, spectral.py:152-157)."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (ks // 2, ks // 2)
    Sp = np.pad(S, pad, mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(Sp, ks, axis=axis)
    return np.median(windows, axis=-1)


def softmask_np(X, X_ref, power=2.0, split_zeros=False):
    """spectral.py:120-142."""
    Z = np.maximum(X, X_ref)
    bad = Z < np.finfo(np.float32).tiny
    Zs = np.where(bad, 1.0, Z)
    mask = (X / Zs) ** power
    ref_mask = (X_ref / Zs) ** power
    mask = np.where(bad, 0.5 if split_zeros else 0.0, mask / np.where(bad, 1.0, mask + ref_mask))
    return mask


def hpss_np(S, ks=31, power=2.0, margin=1.0):
    """spectral.py:145-161: harmonic = median over time, percussive = median
    over frequency, soft masks applied to the complex STFT."""
    if np.iscomplexobj(S):
        mag, phase = np.abs(S), np.exp(1.0j * np.angle(S))
    else:
        mag, phase = S, 1.0
    harm = median_filter_time_np(mag, ks, axis=1)
    perc = median_filter_time_np(mag, ks, axis=0)
    split_zeros = margin == 1
    mask_harm = softmask_np(harm, perc * margin, power=power, split_zeros=split_zeros)
    mask_perc = softmask_np(perc, harm * margin, power=power, split_zeros=split_zeros)
    return (mag * mask_harm) * phase, (mag * mask_perc) * phase


def harmonic_np(audio, margin=8.0):
    """ssar/features/audio.py:13-17."""
    S = stft_np(audio)
    return istft_np(hpss_np(S, margin=margin)[0], length=len(audio))


def percussive_np(audio, margin=8.0):
    S = stft_np(audio)
    return istft_np(hpss_np(S, margin=margin)[1], length=len(audio))


# -------------------------------------------------------------- resample --
_KAISER_BETA = 14.769656459379492


def resample_kaiser_np(x, orig_freq, new_freq, lowpass_filter_width=6, rolloff=0.99, beta=_KAISER_BETA):
    """torchaudio resample(resampling_method="kaiser_window") re-derived in
    numpy: polyphase kaiser-windowed sinc interpolation."""
    orig_freq, new_freq = int(orig_freq), int(new_freq)
    if orig_freq == new_freq:
        return np.asarray(x, dtype=np.float64)
    g = gcd(orig_freq, new_freq)
    o, n = orig_freq // g, new_freq // g
    base_freq = min(o, n) * rolloff
    width = ceil(lowpass_filter_width * o / base_freq)

    idx = np.arange(-width, width + o, dtype=np.float64)[None, :] / o
    t = np.arange(0, -n, -1, dtype=np.float64)[:, None] / n + idx
    t = np.clip(t * base_freq, -lowpass_filter_width, lowpass_filter_width)
    window = _bessel_i0(beta * np.sqrt(np.clip(1 - (t / lowpass_filter_width) ** 2, 0, None))) / _bessel_i0(beta)
    tpi = t * np.pi
    kernel = np.where(tpi == 0, 1.0, np.sin(tpi) / np.where(tpi == 0, 1.0, tpi)) * window * (base_freq / o)

    x = np.asarray(x, dtype=np.float64)
    L = len(x)
    xp = np.pad(x, (width, width + o))
    K = kernel.shape[1]
    frames = np.lib.stride_tricks.sliding_window_view(xp, K)[::o]
    out = frames @ kernel.T  # (n_frames, n) phases
    out = out.reshape(-1)
    return out[: ceil(n * L / o)]


# ------------------------------------------------------------------- cqt --
def constant_q_lengths_np(sr, fmin, n_bins, bins_per_octave, filter_scale=1.0, gamma=0.0):
    alpha = 2.0 ** (1.0 / bins_per_octave) - 1.0
    Q = float(filter_scale) / alpha
    freq = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    return Q * sr / (freq + gamma / alpha)


def constant_q_np(sr, fmin, n_bins, bins_per_octave, filter_scale=1.0, gamma=0.0):
    """Time-domain CQ filter bank (constantq.py:223-263)."""
    lengths = constant_q_lengths_np(sr, fmin, n_bins, bins_per_octave, filter_scale, gamma)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    max_len = int(2.0 ** np.ceil(np.log2(np.max(lengths))))
    filters = np.zeros((n_bins, max_len), dtype=np.complex128)
    for k, (ilen, freq) in enumerate(zip(lengths, freqs)):
        ilen2 = int(ilen // 2)
        nrange = np.arange(-ilen2, ilen2)
        sig = np.exp(1j * 2 * np.pi * freq / sr * nrange) * hann_np(len(nrange))
        sig = sig / np.sum(np.abs(sig))
        lpad = (max_len - len(sig)) // 2
        filters[k, lpad : lpad + len(sig)] = sig
    return filters, lengths


def sparsify_rows_np(x, quantile=0.01):
    """Dense equivalent of constantq.py:147-164 (entries below the per-row
    cumulative-magnitude threshold are zeroed)."""
    mags = np.abs(x)
    norms = np.sum(mags, axis=1, keepdims=True)
    mag_sort = np.sort(mags, axis=1)
    cumulative = np.cumsum(mag_sort / norms, axis=1)
    out = np.zeros_like(x)
    for i in range(x.shape[0]):
        below = cumulative[i] < quantile
        j = int(np.argmin(below))  # first index where cumulative >= quantile
        keep = mags[i] >= mag_sort[i, j]
        out[i, keep] = x[i, keep]
    return out


def cqt_filter_fft_np(sr, fmin, n_bins, bins_per_octave, filter_scale=1.0, sparsity=0.01, gamma=0.0):
    """constantq.py:118-144."""
    basis, lengths = constant_q_np(sr, fmin, n_bins, bins_per_octave, filter_scale, gamma)
    n_fft = basis.shape[1]
    basis = basis * (lengths[:, None] / float(n_fft))
    fft_basis = np.fft.fft(basis, n=n_fft, axis=1)[:, : n_fft // 2 + 1]
    return sparsify_rows_np(fft_basis, quantile=sparsity), n_fft, lengths


def vqt_np(y, sr, hop_length=1024, fmin=None, n_bins=84, gamma=None, bins_per_octave=12,
           tuning=0.0, filter_scale=1.0, sparsity=0.01):
    """Recursive octave-by-octave VQT (constantq.py:29-115)."""
    n_octaves = int(np.ceil(float(n_bins) / bins_per_octave))
    n_filters = min(bins_per_octave, n_bins)
    alpha = 2.0 ** (1.0 / bins_per_octave) - 1.0
    if fmin is None:
        fmin = C1_HZ
    if tuning is None:
        tuning = estimate_tuning_np(y, sr, bins_per_octave=bins_per_octave)
    if gamma is None:
        gamma = 24.7 * alpha / 0.108
    fmin = fmin * 2.0 ** (tuning / bins_per_octave)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    fmin_t = float(np.min(freqs[-bins_per_octave:]))

    vqt_resp = []
    my_y, my_sr, my_hop = np.asarray(y, dtype=np.float64), float(sr), hop_length
    for i in range(n_octaves):
        if i > 0:
            my_y = resample_kaiser_np(my_y, my_sr, my_sr / 2) * np.sqrt(2)
            my_sr /= 2.0
            my_hop //= 2
        fft_basis, n_fft, _ = cqt_filter_fft_np(my_sr, fmin_t * 2.0 ** -i, n_filters,
                                                bins_per_octave, filter_scale, sparsity, gamma)
        fft_basis = fft_basis * np.sqrt(2**i)
        D = stft_np(my_y, n_fft=n_fft, hop_length=my_hop, window=None)[:, :-1]
        vqt_resp.append(fft_basis @ D)

    max_col = min(r.shape[-1] for r in vqt_resp)
    V = np.empty((n_bins, max_col), dtype=np.complex128)
    end = n_bins
    for r in vqt_resp:
        n_oct = r.shape[0]
        if end < n_oct:
            V[:end] = r[-end:, :max_col]
        else:
            V[end - n_oct : end] = r[:, :max_col]
        end -= n_oct

    lengths = constant_q_lengths_np(sr, fmin, n_bins, bins_per_octave, filter_scale, gamma)
    return V / np.sqrt(lengths[:, None])


def cqt_np(y, sr, hop_length=1024, fmin=None, n_bins=84, bins_per_octave=12, tuning=0.0,
           filter_scale=1.0, sparsity=0.01):
    return vqt_np(y, sr, hop_length=hop_length, fmin=fmin, n_bins=n_bins, gamma=0.0,
                  bins_per_octave=bins_per_octave, tuning=tuning, filter_scale=filter_scale,
                  sparsity=sparsity)


# ---------------------------------------------------------------- chroma --
def hz_to_midi_np(f):
    return 12 * (np.log2(f) - np.log2(440.0)) + 69


def cq_to_chroma_np(n_input, bins_per_octave=12, n_chroma=12, fmin=None, base_c=True):
    """ssar/features/rosa/convert.py:69-117."""
    n_merge = float(bins_per_octave) / n_chroma
    if fmin is None:
        fmin = C1_HZ
    cq_to_ch = np.repeat(np.eye(n_chroma), round(n_merge), axis=1)
    cq_to_ch = np.roll(cq_to_ch, -int(n_merge // 2), axis=1)
    n_octaves = np.ceil(float(n_input) / bins_per_octave)
    cq_to_ch = np.tile(cq_to_ch, (1, int(n_octaves)))[:, :n_input]
    midi_0 = hz_to_midi_np(fmin) % 12
    roll = midi_0 if base_c else midi_0 - 9
    roll = int(np.round(roll * (n_chroma / 12.0)))
    return np.roll(cq_to_ch, roll, axis=0)


def chroma_cqt_np(y, sr, hop_length=1024, fmin=None, threshold=0.0, tuning=None,
                  n_chroma=12, n_octaves=7, bins_per_octave=36, norm=True):
    """spectral.py:286-325."""
    C = np.abs(cqt_np(y, sr, hop_length=hop_length, fmin=fmin, n_bins=n_octaves * bins_per_octave,
                      bins_per_octave=bins_per_octave, tuning=tuning))
    chroma = cq_to_chroma_np(C.shape[0], bins_per_octave=bins_per_octave, n_chroma=n_chroma, fmin=fmin) @ C
    if threshold is not None:
        chroma[chroma < threshold] = 0.0
    if norm:
        chroma = chroma / chroma.max()
    return chroma


@lru_cache(maxsize=None)
def _quant_spline_np():
    """The CENS quantizer spline knots (spectral.py:164-189)."""
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
    return CubicSpline(xs, ys, bc_type="natural"), xs


def step_function_np(w, h=0.25, alpha=20.0):
    """spectral.py:205-214."""
    r = (w - 0.5) - np.floor(w - 0.5) - 0.5
    m = 1.0 / (1.0 + np.exp(-alpha)) - 0.5
    return h * (np.floor(w - 0.5) + 1.0 / (2 * m) * 1.0 / (1.0 + np.exp(-2 * alpha * r)))


def spline_quantize_np(chroma):
    # scipy extrapolates out-of-range points with the edge polynomial, which
    # matches the reference spline_eval's clamped bucket index (spectral.py:192-202)
    cs, _ = _quant_spline_np()
    return step_function_np(cs(chroma))


def chroma_cens_np(y, sr, hop_length=1024, fmin=None, tuning=None, n_chroma=12,
                   n_octaves=7, bins_per_octave=36, win_len_smooth=41):
    """spectral.py:239-280."""
    chroma = chroma_cqt_np(y, sr, hop_length=hop_length, fmin=fmin, bins_per_octave=bins_per_octave,
                           tuning=tuning, n_chroma=n_chroma, n_octaves=n_octaves, norm=False)
    chroma = chroma / np.linalg.norm(chroma, ord=1, axis=0)
    chroma_quant = spline_quantize_np(chroma)
    if win_len_smooth:
        win = hann_np(win_len_smooth + 2)
        win = win / win.sum()
        # torch conv1d is cross-correlation (no kernel flip) and the periodic
        # hann is NOT reversal-symmetric — correlate, don't convolve
        k = len(win)
        pad = k // 2
        cens = np.stack([
            np.lib.stride_tricks.sliding_window_view(
                np.pad(row, (pad, k - 1 - pad)), k) @ win
            for row in chroma_quant
        ])
    else:
        cens = chroma_quant
    return cens / np.linalg.norm(cens, ord=2, axis=0)


# --------------------------------------------------------------- pitch ---
def localmax_np(x):
    """pitch.py:86-95 (local max along axis 0)."""
    x_pad = np.pad(x, ((1, 1), (0, 0)))
    return (x > x_pad[:-2]) & (x >= x_pad[2:])


def piptrack_np(y, sr, n_fft=2048, hop_length=None, fmin=150.0, fmax=4000.0, threshold=0.1):
    """pitch.py:27-83. Note the reference's call chain passes hop_length=None
    -> torch.stft default n_fft // 4."""
    if hop_length is None:
        hop_length = n_fft // 4
    S = spectrogram_np(y, n_fft=n_fft, hop_length=hop_length)
    fmin = max(fmin, 0)
    fmax = min(fmax, float(sr) / 2)
    fft_freqs = np.linspace(0, float(sr) / 2, int(1 + n_fft // 2))

    avg = 0.5 * (S[2:] - S[:-2])
    shift = 2 * S[1:-1] - S[2:] - S[:-2]
    shift = avg / (shift + (np.abs(shift) < np.finfo(shift.dtype).tiny))
    avg = np.pad(avg, ((1, 1), (0, 0)))
    shift = np.pad(shift, ((1, 1), (0, 0)))
    dskew = 0.5 * avg * shift

    pitches = np.zeros_like(S)
    mags = np.zeros_like(S)
    freq_mask = ((fmin <= fft_freqs) & (fft_freqs < fmax))[:, None]
    ref_value = threshold * S.max(axis=0)
    sel = freq_mask & localmax_np(S * (S > ref_value))
    i, j = np.nonzero(sel)
    pitches[i, j] = (i + shift[i, j]) * float(sr) / n_fft
    mags[i, j] = S[i, j] + dskew[i, j]
    return pitches, mags


def pitch_tuning_np(frequencies, resolution=0.01, bins_per_octave=12):
    """pitch.py:98-120."""
    frequencies = np.atleast_1d(frequencies)
    frequencies = frequencies[frequencies > 0]
    if len(frequencies) == 0:
        return 0.0
    octs = np.log2(frequencies / (440.0 / 16))
    residual = (bins_per_octave * octs) % 1.0
    residual[residual >= 0.5] -= 1.0
    bins = int(np.ceil(1.0 / resolution))
    counts, _ = np.histogram(residual, bins=bins, range=(-0.5, 0.5))
    tuning = np.linspace(-0.5, 0.5, bins + 1)
    return float(tuning[np.argmax(counts)])


def estimate_tuning_np(y, sr, n_fft=2048, resolution=0.01, bins_per_octave=12):
    """pitch.py:9-24."""
    pitch, mag = piptrack_np(y, sr, n_fft=n_fft)
    pitch_mask = pitch > 0
    threshold = np.median(mag[pitch_mask]) if pitch_mask.any() else 0.0
    return pitch_tuning_np(pitch[(mag >= threshold) & pitch_mask], resolution=resolution,
                           bins_per_octave=bins_per_octave)


# ---------------------------------------------------------------- onsets --
def onset_strength_np(y, sr, hop_length=1024, n_fft=2048, aggregate=np.mean):
    """beat.py:10-23: positive mel-flux aggregated over bands, right-shifted."""
    S = power_to_db_np(melspectrogram_np(y, sr, n_fft=n_fft, hop_length=hop_length, fmax=11025.0))
    onset_env = np.maximum(0.0, S[:, 1:] - S[:, :-1])
    onset_env = aggregate(onset_env, axis=0)[None, :]
    pad_width = 1 + n_fft // (2 * hop_length)
    onset_env = np.pad(onset_env, ((0, 0), (int(pad_width), 0)))[:, : S.shape[1]]
    return onset_env.squeeze(0)


def fourier_tempogram_np(onset_envelope, win_length=1024):
    """beat.py:33-38 (STFT of the envelope at hop 1)."""
    return stft_np(onset_envelope, n_fft=win_length, hop_length=1, center=True, window="hann")


def plp_np(y, sr, hop_length=1024, win_length=1024, tempo_min=60, tempo_max=180):
    """beat.py:41-75: predominant local pulse."""
    onset_env = onset_strength_np(y, sr, hop_length=hop_length, aggregate=np.median)
    max_win = min(len(onset_env), win_length)
    ftgram = fourier_tempogram_np(onset_env, win_length=max_win)
    rate = sr * 60 / float(hop_length)
    tempo_frequencies = np.linspace(0, float(rate) / 2, int(1 + max_win // 2))
    if tempo_min is not None:
        ftgram[tempo_frequencies < tempo_min] = 0
    if tempo_max is not None:
        ftgram[tempo_frequencies > tempo_max] = 0
    ftmag = np.log1p(1e6 * np.abs(ftgram))
    peak_values = ftmag.max(axis=0, keepdims=True)
    ftgram[ftmag < peak_values] = 0
    absmaxabs = np.abs(ftgram).max(axis=0, keepdims=True)
    ftgram = ftgram / (np.finfo(np.float32).tiny ** 0.5 + absmaxabs)
    pulse = istft_np(ftgram, n_fft=max_win, hop_length=1, length=len(onset_env))
    pulse = np.clip(pulse, 0, None)
    return normalize_np(pulse)


# ------------------------------------------------------------ processing --
def normalize_np(x):
    x = x - x.min()
    return x / (x.max() + 1e-8)


def gaussian_filter_np(x, sigma, mode="wrap"):
    """processing.py:10-48 applied along axis 0 (torch 'circular' == np 'wrap')."""
    x = np.asarray(x, dtype=np.float64)
    squeeze_back = x.ndim == 1
    if x.ndim == 1:
        x = x[:, None]
    n_frames = x.shape[0]
    radius = min(int(sigma * 4), 3 * n_frames)
    kernel = np.exp(-0.5 / sigma**2 * np.arange(-radius, radius + 1, dtype=np.float64) ** 2)
    kernel = kernel / kernel.sum()
    if radius > n_frames:
        xp = np.pad(x, ((n_frames, n_frames), (0, 0)), mode=mode)
        xp = np.pad(xp, ((radius - n_frames, radius - n_frames), (0, 0)), mode="edge")
    else:
        xp = np.pad(x, ((radius, radius), (0, 0)), mode=mode)
    out = np.stack([np.convolve(xp[:, c], kernel, mode="valid") for c in range(x.shape[1])], axis=1)
    # torch path ends with .squeeze(): a (T,1) input comes back (T,)
    return out[:, 0] if (squeeze_back or out.shape[1] == 1) else out


def emphasize_np(envs, strength, percentile):
    """processing.py:141-148 (per-column tanh expander)."""
    envs = np.asarray(envs, dtype=np.float64)
    mn = envs.min(axis=0)
    x = envs - mn
    mx = x.max(axis=0)
    x = x / mx
    x = x * (1 + np.tanh(strength * (x - np.quantile(x, percentile / 100, axis=0))))
    return (x * mx) + mn


def clamp_peaks_percentile_np(signal, percent):
    """processing.py:103-124: clamp each column at the `percent` quantile of
    its local-peak values."""
    if signal.ndim < 2:
        signal = signal[:, None]
    out = []
    for c in range(signal.shape[1]):
        sig = signal[:, c].astype(np.float64)
        locs = np.arange(len(sig))
        plus = sig[np.clip(locs + 1, 0, len(sig) - 1)]
        minus = sig[np.clip(locs - 1, 0, len(sig) - 1)]
        peaks = (sig > plus) & (sig > minus)
        if peaks.any():
            out.append(np.clip(sig, None, np.quantile(sig[peaks], percent / 100)))
        else:  # constant / monotone column: no peaks, clamp is a no-op
            out.append(sig)
    return np.stack(out, axis=1)


def clamp_lower_percentile_np(signal, percentile):
    return np.clip(signal, np.quantile(signal, percentile / 100, axis=0), None)


def _biquad_np(x, b0, b1, b2, a0, a1, a2):
    return scipy.signal.lfilter([b0 / a0, b1 / a0, b2 / a0], [1.0, a1 / a0, a2 / a0],
                                np.asarray(x, dtype=np.float64))


def lowpass_biquad_np(x, sr, cutoff, Q=0.7071067811865476):
    """torchaudio.functional.lowpass_biquad (RBJ cookbook)."""
    w0 = 2 * np.pi * cutoff / sr
    alpha = np.sin(w0) / (2 * Q)
    b0 = (1 - np.cos(w0)) / 2
    b1 = 1 - np.cos(w0)
    return _biquad_np(x, b0, b1, b0, 1 + alpha, -2 * np.cos(w0), 1 - alpha)


def highpass_biquad_np(x, sr, cutoff, Q=0.7071067811865476):
    w0 = 2 * np.pi * cutoff / sr
    alpha = np.sin(w0) / (2 * Q)
    b0 = (1 + np.cos(w0)) / 2
    b1 = -(1 + np.cos(w0))
    return _biquad_np(x, b0, b1, b0, 1 + alpha, -2 * np.cos(w0), 1 - alpha)


def low_pass_np(audio, sr, fmax=200.0):
    return lowpass_biquad_np(audio, sr, fmax)


def high_pass_np(audio, sr, fmin=4000.0):
    return highpass_biquad_np(audio, sr, fmin)


def mid_pass_np(audio, sr, fmin=200.0, fmax=4000.0):
    return low_pass_np(high_pass_np(audio, sr, fmax), sr, fmin)


# --------------------------------------------------------- named features --
def rms_np(y, sr=None, frame_length=2048, hop_length=1024, center=True, pad_mode="reflect"):
    """ssar/features/audio.py:31-37."""
    y = np.asarray(y, dtype=np.float64)
    if center:
        p = frame_length // 2
        y = np.pad(y, (p, p), mode=pad_mode)
    n_frames = (len(y) - frame_length) // hop_length + 1
    frames = np.lib.stride_tricks.sliding_window_view(y, frame_length)[::hop_length][:n_frames][:-1]
    return np.sqrt(np.mean(np.abs(frames) ** 2, axis=1))[:, None]


def drop_strength_np(audio, sr):
    """audio.py:40-41."""
    return emphasize_np(gaussian_filter_np(rms_np(audio, sr), 10), strength=10, percentile=50)[:, None]


def onsets_np(audio, sr):
    """audio.py:27-28."""
    return normalize_np(onset_strength_np(percussive_np(audio), sr))[:, None]


def chromagram_np(audio, sr, tuning=None):
    """audio.py:44-45 (note: harmonic() applied *again* inside)."""
    return chroma_cens_np(harmonic_np(audio), sr, tuning=tuning).T


def tonnetz_np(y, sr, chroma=None, tuning=None):
    """audio.py:48-57."""
    if chroma is None:
        chroma = chromagram_np(y, sr, tuning=tuning).T  # (12, T)
    else:
        chroma = chroma.T
    n = chroma.shape[0]
    dim_map = np.linspace(0, 12, n)
    scale = np.array([7.0 / 6, 7.0 / 6, 3.0 / 2, 3.0 / 2, 2.0 / 3, 2.0 / 3])
    V = scale[:, None] * dim_map[None, :]
    V[::2] -= 0.5
    R = np.array([1, 1, 1, 1, 0.5, 0.5])
    phi = R[:, None] * np.cos(np.pi * V)
    ton = phi @ (chroma / np.linalg.norm(chroma, ord=1, axis=0))
    return ton.T


def mfcc_np(y, sr, n_mfcc=20):
    """audio.py:60-65."""
    S = power_to_db_np(melspectrogram_np(y, sr))
    M = dct_np(S.T, norm="ortho").T[:n_mfcc]
    return M.T


def pulse_np(audio, sr):
    """audio.py:68-69."""
    return plp_np(percussive_np(audio), sr)[:, None]


def spectral_contrast_np(y, sr, n_fft=2048, hop_length=1024, fmin=200.0, n_bands=6,
                         quantile=0.02, linear=False):
    """audio.py:72-123."""
    S = spectrogram_np(y, n_fft=n_fft, hop_length=hop_length)
    freq = np.linspace(0, float(sr) / 2, int(1 + n_fft // 2))
    octa = np.zeros(n_bands + 2)
    octa[1:] = fmin * (2.0 ** np.arange(0, n_bands + 1))
    valley = np.zeros((n_bands + 1, S.shape[1]))
    peak = np.zeros_like(valley)
    for k in range(n_bands + 1):
        f_low, f_high = octa[k], octa[k + 1]
        current_band = (freq >= f_low) & (freq <= f_high)
        if not current_band.any():
            # band entirely above Nyquist (fmin * 2^6 = 12.8 kHz > sr/2 at
            # sr = 24.576 kHz): use the top bin, mirroring the rebuild's
            # documented static-plan choice (ssar_tpu/audio/features.py)
            current_band[-1] = True
        idx = np.flatnonzero(current_band)
        if k > 0:
            current_band[idx[0] - 1] = True
        if k == n_bands:
            current_band[idx[-1] + 1 :] = True
        sub_band = S[current_band]
        if k < n_bands:
            sub_band = sub_band[:-1]
        n_take = int(max(np.round(quantile * current_band.sum()), 1))
        srt = np.sort(sub_band, axis=0)
        valley[k] = np.mean(srt[:n_take], axis=0)
        peak[k] = np.mean(srt[-n_take:], axis=0)
    if linear:
        return (peak - valley).T
    return (power_to_db_np(peak) - power_to_db_np(valley)).T


def spectral_flatness_np(y, sr=None, n_fft=2048, hop_length=1024, amin=1e-10, power=2.0):
    """audio.py:126-133."""
    S = spectrogram_np(y, n_fft=n_fft, hop_length=hop_length, power=1.0)
    S_thresh = np.maximum(amin, S**power)
    gmean = np.exp(np.mean(np.log(S_thresh), axis=0))
    amean = np.mean(S_thresh, axis=0)
    return (gmean / amean)[:, None]


# --------------------------------------------------- the 59-dim stack -----
def audio2features_np(audio, sr, fps, clamp=True, smooth=True, emphasis=False, tuning=None):
    """Full reference feature pipeline (ssar/supervised/data.py:59-107)."""
    audio = np.asarray(audio, dtype=np.float64)
    if audio.ndim == 2:
        audio = audio.mean(0)
    if sr != fps * 1024:
        audio = resample_kaiser_np(audio, sr, fps * 1024)
        sr = fps * 1024

    audio_harm, audio_perc = harmonic_np(audio), percussive_np(audio)
    multi = [
        mfcc_np(audio, sr),
        chromagram_np(audio_harm, sr, tuning=tuning),
        tonnetz_np(audio_harm, sr, tuning=tuning),
        spectral_contrast_np(audio, sr),
    ]
    single = [
        spectral_flatness_np(audio, sr),
        onset_strength_np(audio_perc, sr)[:, None],
        onset_strength_np(low_pass_np(audio_perc, sr), sr)[:, None],
        onset_strength_np(mid_pass_np(audio_perc, sr), sr)[:, None],
        onset_strength_np(high_pass_np(audio_perc, sr), sr)[:, None],
        plp_np(audio_perc, sr)[:, None],
        rms_np(audio_harm, sr),
        rms_np(low_pass_np(audio_harm, sr), sr),
        rms_np(mid_pass_np(audio_harm, sr), sr),
        rms_np(high_pass_np(audio_harm, sr), sr),
        drop_strength_np(audio, sr),
        drop_strength_np(low_pass_np(audio, sr), sr),
        drop_strength_np(mid_pass_np(audio, sr), sr),
        drop_strength_np(high_pass_np(audio, sr), sr),
    ]
    features = np.concatenate(multi + [s.reshape(-1, 1) for s in single], axis=1)
    if clamp:
        P = 2.5
        features = clamp_peaks_percentile_np(features, 100 - P)
        features = clamp_lower_percentile_np(features, 4 * P)
    if smooth:
        features = gaussian_filter_np(features, 0.1 * fps)
    if emphasis:
        features = emphasize_np(features, strength=2, percentile=75)
    return features
