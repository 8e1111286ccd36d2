"""DCT-II along the last axis via a single rFFT (MFCC front-end).

Equivalent of the reference's FFT-based DCT (ssar/features/rosa/spectral.py:
35-56).  Uses the classic even/odd permutation trick so one complex FFT of
length N yields the length-N DCT-II — XLA's TPU FFT handles the batch.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def dct(x, norm: str | None = None):
    """Type-II DCT over the last axis; `norm` in {None, "ortho"}."""
    in_shape = x.shape
    N = in_shape[-1]
    x = x.reshape(-1, N)

    v = jnp.concatenate([x[:, ::2], x[:, 1::2][:, ::-1]], axis=1)
    Vc = jnp.fft.fft(v, axis=1)

    k = -jnp.arange(N, dtype=x.dtype)[None, :] * np.pi / (2 * N)
    V = Vc.real * jnp.cos(k) - Vc.imag * jnp.sin(k)

    if norm == "ortho":
        V = V.at[:, 0].divide(np.sqrt(N) * 2)
        V = V.at[:, 1:].divide(np.sqrt(N / 2) * 2)

    return (2 * V).reshape(in_shape)
