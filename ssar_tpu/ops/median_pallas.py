"""Pallas sliding-window median kernel (the HPSS hot op).

HPSS runs two 31-tap median filters over a (1025, T) spectrogram
(ssar_tpu/audio/spectral.py:hpss); the jnp formulation materialises a
(F, T, 31) window tensor and runs XLA's generic comparison sort.  This
kernel keeps the 31 shifted views in VMEM registers and sorts them with an
odd-even transposition network of elementwise min/max — pure VPU math, one
pass over HBM.

Works for any odd k (the network is generated at trace time); exact median
(matches jnp.median for odd window sizes).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.platform import pallas_interpret


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _median_kernel(k: int, f_blk: int, t_blk: int, x_hbm, out_ref):
    """Overlapping (f_blk, t_blk + k - 1) windows DMA'd from HBM; odd-even
    transposition network of min/max over the k taps in VMEM.  The copy
    width is rounded up to the 128-lane tiling Mosaic requires."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy_w = _round_up(t_blk + k - 1, 128)

    def body(scratch, sem):
        row = pl.multiple_of(i * f_blk, 8)
        col = pl.multiple_of(j * t_blk, 128)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(row, f_blk), pl.ds(col, copy_w)],
            scratch, sem,
        )
        dma.start()
        dma.wait()
        w = [scratch[:, t : t + t_blk] for t in range(k)]
        for r in range(k):
            for q in range(r % 2, k - 1, 2):
                lo = jnp.minimum(w[q], w[q + 1])
                hi = jnp.maximum(w[q], w[q + 1])
                w[q], w[q + 1] = lo, hi
        out_ref[:] = w[k // 2]

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((f_blk, copy_w), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def sliding_median_lastaxis(x: jax.Array, k: int, f_blk: int = 256, t_blk: int = 256) -> jax.Array:
    """(F, T) -> (F, T) median over a k-wide window on the last axis,
    reflect-padded (torch 'reflect' semantics).  Exact for odd k.

    Differentiable: the VJP routes each output cotangent to the first
    window element equal to the median (a valid subgradient, matching the
    selection semantics of sort-based median gradients).  The (F, T, k)
    window tensor is only materialised on the backward pass — the forward
    stays a single-HBM-pass pallas kernel.
    """
    return _sliding_median_impl(x, k, f_blk, t_blk)


@partial(jax.jit, static_argnames=("k", "f_blk", "t_blk"))
def _sliding_median_impl(x: jax.Array, k: int, f_blk: int = 256, t_blk: int = 256) -> jax.Array:
    assert k % 2 == 1
    F, T = x.shape
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")

    f_blk = min(f_blk, _round_up(F, 8))       # sublane tiling multiple
    t_blk = min(t_blk, _round_up(T, 128))     # lane tiling multiple
    pad_f = (-F) % f_blk
    pad_t = (-T) % t_blk
    # the per-block DMA reads a 128-aligned copy width; make sure the padded
    # array covers the widest read of the last block
    copy_w = ((t_blk + k - 1 + 127) // 128) * 128
    need_w = (T + pad_t) - t_blk + copy_w
    extra_t = max(0, need_w - (T + 2 * p + pad_t))
    xp = jnp.pad(xp, ((0, pad_f), (0, pad_t + extra_t)))
    Fp, Tp = F + pad_f, T + pad_t

    out = pl.pallas_call(
        partial(_median_kernel, k, f_blk, t_blk),
        grid=(Fp // f_blk, Tp // t_blk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((f_blk, t_blk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Fp, Tp), x.dtype),
        interpret=pallas_interpret(),
    )(xp)
    return out[:F, :T]


def _sliding_median_fwd(x, k, f_blk, t_blk):
    out = _sliding_median_impl(x, k, f_blk, t_blk)
    return out, (x, out)


def _sliding_median_bwd(k, f_blk, t_blk, res, g):
    x, out = res
    T = x.shape[1]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
    win = jnp.stack([xp[:, i : i + T] for i in range(k)], axis=-1)  # (F, T, k)
    eq = win == out[..., None]
    sel = eq & (jnp.cumsum(eq, axis=-1) == 1)  # first tap equal to the median
    gwin = g[..., None] * sel.astype(g.dtype)

    gxp = jnp.zeros_like(xp)
    for i in range(k):
        gxp = gxp.at[:, i : i + T].add(gwin[..., i])
    gx = gxp[:, p : p + T]
    if p:  # fold the reflect halo back: xp[:, p-1-j] == x[:, j+1], etc.
        gx = gx.at[:, 1 : p + 1].add(gxp[:, :p][:, ::-1])
        gx = gx.at[:, T - p - 1 : T - 1].add(gxp[:, p + T :][:, ::-1])
    return (gx,)


sliding_median_lastaxis.defvjp(_sliding_median_fwd, _sliding_median_bwd)
