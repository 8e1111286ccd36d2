"""Temporal absolute-difference envelope — Pallas kernel + XLA reference.

Equivalent of the reference's Triton kernel (ssar/metrics/absdiff.py:85-116)
and the chunked eager version (ssar/features/video.py:65-74): for a sequence
``x`` of shape (T, ...) compute ``y[t] = sum(|x[t+1] - x[t]|)`` over all
non-time elements for t < T-1, and ``y[T-1] = y[T-2]``.

The Pallas kernel tiles (time x element) blocks in VMEM and accumulates the
element axis into a per-time-block partial sum — the same tiling contract the
reference's Triton kernel uses (atomic_add over element blocks), expressed as
sequential grid revisits of the output block, which is the TPU idiom.  The
jnp reference (`absdiff_ref`) is used for autodiff and as the allclose oracle
in tests (mirroring the reference's own kernel-vs-eager test harness,
ssar/metrics/absdiff.py:119-147).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.platform import pallas_interpret

BLOCK_T = 256
BLOCK_E = 512


def absdiff_ref(x: jax.Array) -> jax.Array:
    """XLA reference: (T, ...) -> (T,)."""
    flat = x.reshape(x.shape[0], -1)
    d = jnp.sum(jnp.abs(flat[1:] - flat[:-1]), axis=1)
    return jnp.concatenate([d, d[-1:]])


def _absdiff_kernel(a_ref, b_ref, out_ref):
    je = pl.program_id(1)

    @pl.when(je == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    diff = jnp.abs(b_ref[:] - a_ref[:])
    out_ref[:] += jnp.sum(diff, axis=1, keepdims=True)


@jax.jit
def absdiff_pallas(x: jax.Array) -> jax.Array:
    """Pallas TPU kernel: (T, ...) -> (T,) with y[T-1] = y[T-2]."""
    flat = x.reshape(x.shape[0], -1).astype(jnp.float32)
    T, E = flat.shape
    a, b = flat[:-1], flat[1:]

    n = T - 1
    pad_t = (-n) % BLOCK_T
    pad_e = (-E) % BLOCK_E
    a = jnp.pad(a, ((0, pad_t), (0, pad_e)))
    b = jnp.pad(b, ((0, pad_t), (0, pad_e)))
    nt, ne = (n + pad_t) // BLOCK_T, (E + pad_e) // BLOCK_E

    out = pl.pallas_call(
        _absdiff_kernel,
        grid=(nt, ne),
        in_specs=[
            pl.BlockSpec((BLOCK_T, BLOCK_E), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, BLOCK_E), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_T, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + pad_t, 1), jnp.float32),
        interpret=pallas_interpret(),
    )(a, b)

    d = out[:n, 0]
    return jnp.concatenate([d, d[-1:]]).astype(x.dtype)


@jax.custom_vjp
def absdiff(x: jax.Array) -> jax.Array:
    """Differentiable absdiff: Pallas forward, analytic sign-based backward."""
    return absdiff_pallas(x)


def _absdiff_fwd(x):
    return absdiff_pallas(x), x


def _absdiff_bwd(x, g):
    flat = x.reshape(x.shape[0], -1)
    s = jnp.sign(flat[1:] - flat[:-1])  # (T-1, E)
    # y[t] = sum|x[t+1]-x[t]| for t<T-1 and y[T-1]=y[T-2]; fold the duplicated
    # tail gradient into its source row.
    gt = g[:-1].at[-1].add(g[-1])  # (T-1,)
    gx = jnp.zeros_like(flat)
    gx = gx.at[1:].add(s * gt[:, None])
    gx = gx.at[:-1].add(-s * gt[:, None])
    return (gx.reshape(x.shape),)


absdiff.defvjp(_absdiff_fwd, _absdiff_bwd)


def video_absdiff(video: jax.Array) -> jax.Array:
    """(T, ...) -> (T, 1) envelope (ssar/features/video.py:65-74)."""
    return absdiff_ref(video)[:, None]
