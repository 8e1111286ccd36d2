"""Exact quantiles and percentile clamps (TPU sort-based).

TPU-native replacement for the reference's C++ ``efficient_quantile`` extension
(reference: ssar/analysis/efficient_quantile/efficient_quantile.cpp, used by
ssar/features/processing.py:5,59,95) and the torch.quantile calls in
ssar/features/processing.py:101-138.

Semantics match ``torch.quantile`` / ``numpy.quantile`` linear interpolation:
``pos = q * (n - 1)``; the result interpolates between the two nearest order
statistics.  On TPU an O(n log n) bitonic sort feeds the MXU-free VPU path;
for jit-compatibility with *masked* inputs (dynamic validity counts under
static shapes) we provide :func:`masked_quantile`.

A bit-exact host-side C++ oracle (``native/efficient_quantile.cpp``, built via
ctypes) mirrors the reference's ``std::nth_element`` partial-sort semantics and
is used in the test-suite as ground truth.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def quantile(x: jax.Array, q, axis=None, keepdims: bool = False) -> jax.Array:
    """Exact linear-interpolation quantile (torch.quantile semantics)."""
    return jnp.quantile(x, q, axis=axis, keepdims=keepdims)


def _interp_sorted(sorted_x: jax.Array, pos: jax.Array) -> jax.Array:
    """Linearly interpolate order statistics of a sorted 1-D array at `pos`."""
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(pos.dtype)
    n = sorted_x.shape[0]
    lo = jnp.clip(lo, 0, n - 1)
    hi = jnp.clip(hi, 0, n - 1)
    return sorted_x[lo] * (1 - frac) + sorted_x[hi] * frac


def masked_quantile(x: jax.Array, mask: jax.Array, q: float) -> jax.Array:
    """Quantile over only the elements of `x` where `mask` is True.

    Static-shape friendly: invalid entries are sorted to the end with +inf and
    the interpolation position is computed from the dynamic valid count.
    If no element is valid, returns +inf (i.e. a subsequent upper-clamp at this
    value is a no-op, matching the degenerate-input behaviour we want for
    clamp_peaks_percentile on constant signals).
    """
    x = x.reshape(-1)
    mask = mask.reshape(-1)
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    vals = jnp.where(mask, x, big)
    svals = jnp.sort(vals)
    n_valid = jnp.sum(mask)
    pos = q * (n_valid.astype(x.dtype) - 1.0)
    pos = jnp.maximum(pos, 0.0)
    return jnp.where(n_valid > 0, _interp_sorted(svals, pos), big)


@partial(jax.jit, static_argnames=("percent",))
def clamp_peaks_percentile(signal: jax.Array, percent: float) -> jax.Array:
    """Clamp each channel above the `percent`-quantile of its *local peaks*.

    Reference semantics: ssar/features/processing.py:101-121 — a sample is a
    peak iff strictly greater than both neighbours (boundary samples compare
    against themselves under index clamping, so they are never peaks); each
    channel is upper-clamped at the quantile of its peak values.

    Vectorised over channels (no per-channel Python loop): the masked
    quantile runs as a single batched sort on the VPU.
    """
    squeeze = signal.ndim < 2
    if squeeze:
        signal = signal[:, None]
    T = signal.shape[0]

    prev = signal[jnp.clip(jnp.arange(T) - 1, 0, T - 1)]
    nxt = signal[jnp.clip(jnp.arange(T) + 1, 0, T - 1)]
    peaks = (signal > prev) & (signal > nxt)

    def per_channel(sig, pk):
        thresh = masked_quantile(sig, pk, percent / 100.0)
        return jnp.minimum(sig, thresh)

    out = jax.vmap(per_channel, in_axes=1, out_axes=1)(signal, peaks)
    return out[:, 0] if squeeze else out


def clamp_upper_percentile(signal: jax.Array, percentile: float) -> jax.Array:
    """Clamp above the per-column percentile (ssar/features/processing.py:124-125)."""
    hi = jnp.quantile(signal, percentile / 100.0, axis=0)
    return jnp.minimum(signal, hi)


def clamp_lower_percentile(signal: jax.Array, percentile: float) -> jax.Array:
    """Clamp below the per-column percentile (ssar/features/processing.py:128-129)."""
    lo = jnp.quantile(signal, percentile / 100.0, axis=0)
    return jnp.maximum(signal, lo)
