"""Kaiser-windowed sinc resampling as a strided convolution (MXU-friendly).

Equivalent of torchaudio's ``resample(..., resampling_method="kaiser_window")``
used by the reference for (a) the global resample to ``sr = 1024 * fps``
(ssar/supervised/data.py:63) and (b) the per-octave 2x downsampling inside
the recursive CQT (ssar/features/rosa/constantq.py:86).

TPU-first design: the polyphase sinc kernel depends only on the *static*
(orig_freq, new_freq) pair, so it is built once on the host with numpy/scipy
and baked into the jitted program as a constant; the resample itself is a
single ``lax.conv_general_dilated`` with stride = orig_freq and new_freq
output channels — one dense MXU pass, no sequential loops, static output
shape.
"""
from __future__ import annotations

from functools import lru_cache
from math import ceil, gcd

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import i0 as _i0

_KAISER_BETA = 14.769656459379492  # beta for ~80 dB stopband, torchaudio default


@lru_cache(maxsize=None)
def _sinc_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 16, rolloff: float = 0.99,
                 beta: float = _KAISER_BETA):
    """Polyphase kaiser-windowed sinc kernel, shape (new_freq, 1, K), plus pad width."""
    assert orig_freq > 0 and new_freq > 0
    base_freq = min(orig_freq, new_freq) * rolloff
    width = ceil(lowpass_filter_width * orig_freq / base_freq)

    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t = np.clip(t * base_freq, -lowpass_filter_width, lowpass_filter_width)

    window = _i0(beta * np.sqrt(np.clip(1 - (t / lowpass_filter_width) ** 2, 0, None))) / _i0(beta)
    tpi = t * np.pi
    kernel = np.where(tpi == 0, 1.0, np.sin(tpi) / np.where(tpi == 0, 1.0, tpi))
    kernel = kernel * window * (base_freq / orig_freq)
    return kernel[:, None, :].astype(np.float32), width


def resample(waveform: jax.Array, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 16, rolloff: float = 0.99) -> jax.Array:
    """Resample along the last axis. Accepts (..., L); returns (..., ceil(L*new/orig))."""
    orig_freq, new_freq = int(orig_freq), int(new_freq)
    if orig_freq == new_freq:
        return waveform
    g = gcd(orig_freq, new_freq)
    o, n = orig_freq // g, new_freq // g
    kernel_np, width = _sinc_kernel(o, n, lowpass_filter_width, rolloff)
    kernel = jnp.asarray(kernel_np, dtype=jnp.promote_types(waveform.dtype, jnp.float32))

    shape = waveform.shape
    L = shape[-1]
    x = waveform.reshape(-1, 1, L).astype(kernel.dtype)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + o)))
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(o,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, new, L//o + 1)
    y = jnp.swapaxes(y, 1, 2).reshape(x.shape[0], -1)
    target_len = ceil(n * L / o)
    y = y[:, :target_len]
    return y.reshape(shape[:-1] + (target_len,)).astype(waveform.dtype)
