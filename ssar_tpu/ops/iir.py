"""IIR biquad filters via parallel associative scan.

Equivalents of torchaudio's ``lowpass_biquad`` / ``highpass_biquad`` used by
the reference's band-splitting (ssar/features/processing.py:141-150:
low_pass fmax=200, mid_pass 200-4000, high_pass fmin=4000, Q=1/sqrt(2)).

TPU-first design: a biquad is a linear recurrence
``y[n] = u[n] - a1*y[n-1] - a2*y[n-2]`` (with ``u`` the FIR part, computed as
a parallel convolution).  Rather than a sequential O(T) ``lax.scan`` over
individual samples — which would serialise a multi-second 24.576 kHz
waveform — we run ``jax.lax.associative_scan`` over 2x2 state-transition
matrices: O(T log T) work, O(log T) depth, fully parallel on the VPU.
Standard RBJ cookbook coefficients.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def biquad_coeffs(kind: str, sr: float, cutoff: float, Q: float = 0.7071067811865476):
    """RBJ cookbook biquad coefficients, normalised by a0 (host-side, static)."""
    w0 = 2.0 * np.pi * cutoff / sr
    alpha = np.sin(w0) / (2.0 * Q)
    cosw0 = np.cos(w0)
    if kind == "lowpass":
        b0, b1, b2 = (1 - cosw0) / 2, 1 - cosw0, (1 - cosw0) / 2
    elif kind == "highpass":
        b0, b1, b2 = (1 + cosw0) / 2, -(1 + cosw0), (1 + cosw0) / 2
    else:
        raise ValueError(kind)
    a0, a1, a2 = 1 + alpha, -2 * cosw0, 1 - alpha
    return (b0 / a0, b1 / a0, b2 / a0), (a1 / a0, a2 / a0)


@partial(jax.jit, static_argnames=("b", "a"))
def biquad_apply(x: jax.Array, b: tuple, a: tuple) -> jax.Array:
    """Apply one normalised biquad along the last axis of `x` (zero ICs).

    Numerically-stable parallel formulation: the companion-matrix scan is
    catastrophically non-normal in float32, so we diagonalise the 2nd-order
    recurrence into a *first-order complex* recurrence via partial fractions
    (the same diagonal-state trick S4D uses):

        H(z) = b0 + (A/(z - p) + conj(A)/(z - conj(p)))
        s[n] = p s[n-1] + x[n]         (complex scalar associative scan)
        y[n] = b0 x[n] + 2 Re(A s[n-1])

    The scan multiplies complex scalars of modulus < 1 — no cancellation, so
    f32/complex64 accuracy matches the sequential filter.
    """
    b0, b1, b2 = (float(v) for v in b)
    a1, a2 = (float(v) for v in a)
    disc = a1 * a1 - 4 * a2
    assert disc < 0, "biquad_apply requires complex poles (Q < 0.5 filters unsupported)"
    p = complex(-a1 / 2, np.sqrt(-disc) / 2)
    c1, c0 = b1 - b0 * a1, b2 - b0 * a2
    A = (c1 * p + c0) / (p - np.conj(p))

    rdtype = jnp.promote_types(x.dtype, jnp.float32)
    cdtype = jnp.complex128 if rdtype == jnp.float64 else jnp.complex64
    xr = x.astype(rdtype)

    pc = jnp.asarray(p, dtype=cdtype)
    ps = jnp.broadcast_to(pc, xr.shape)

    def combine(left, right):
        al, vl = left
        ar, vr = right
        return al * ar, ar * vl + vr

    _, s = jax.lax.associative_scan(combine, (ps, xr.astype(cdtype)), axis=x.ndim - 1)
    s_prev = jnp.concatenate([jnp.zeros_like(s[..., :1]), s[..., :-1]], axis=-1)
    y = b0 * xr + 2.0 * jnp.real(jnp.asarray(A, dtype=cdtype) * s_prev)
    return y.astype(rdtype)


def lowpass_biquad(audio: jax.Array, sr: float, cutoff: float) -> jax.Array:
    b, a = biquad_coeffs("lowpass", sr, cutoff)
    return biquad_apply(audio, b, a)


def highpass_biquad(audio: jax.Array, sr: float, cutoff: float) -> jax.Array:
    b, a = biquad_coeffs("highpass", sr, cutoff)
    return biquad_apply(audio, b, a)


def low_pass(audio: jax.Array, sr: float, fmax: float = 200.0) -> jax.Array:
    """ssar/features/processing.py:141-142."""
    return lowpass_biquad(audio, sr, fmax)


def high_pass(audio: jax.Array, sr: float, fmin: float = 4000.0) -> jax.Array:
    """ssar/features/processing.py:149-150."""
    return highpass_biquad(audio, sr, fmin)


def mid_pass(audio: jax.Array, sr: float, fmin: float = 200.0, fmax: float = 4000.0) -> jax.Array:
    """ssar/features/processing.py:145-146 (high_pass at fmax then low_pass at fmin)."""
    return low_pass(high_pass(audio, sr, fmax), sr, fmin)
