"""Pallas fused Vandermonde kernel for S4D convolution kernels.

The hot op of the reference's S4 stack is a fused Cauchy reduction in CUDA
with a tile autotuner (ssar/models/sashimi/cauchy/cauchy_cuda.cu,
SURVEY.md §2.6).  The diagonal-SSM (S4D) reformulation turns it into a
Vandermonde contraction

    K[h, l] = 2 * Re( sum_n  Cb[h, n] * exp(dtA[h, n] * l) )

which this kernel computes in one pass per (H, L) tile: the complex
exponential is expanded to real VPU math (exp/cos/sin) and the N-axis
reduction happens in VMEM without ever materialising the (H, N, L)
Vandermonde tensor in HBM — the memory the jnp reference implementation
(ssar_tpu/models/s4.py:s4d_kernel) allocates.

Ships with the jnp reference + allclose test (the reference's own
kernel-verification pattern) and block sizes tunable via
ssar_tpu.utils.profiling.autotune.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.platform import pallas_interpret


def _vandermonde_kernel(a_ref, b_ref, cre_ref, cim_ref, out_ref):
    """Block: a/b/cre/cim (H_BLK, N); out (H_BLK, L_BLK)."""
    jL = pl.program_id(1)
    L_BLK = out_ref.shape[1]
    # Mosaic requires integer iota; cast after (f32 iota verifies only in
    # interpret mode)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L_BLK), 2)
    l = (jL * L_BLK + idx).astype(jnp.float32)

    a = a_ref[:][:, :, None]      # (H, N, 1)
    b = b_ref[:][:, :, None]
    cre = cre_ref[:][:, :, None]
    cim = cim_ref[:][:, :, None]

    env = jnp.exp(a * l)          # (H, N, L)
    re = env * (cre * jnp.cos(b * l) - cim * jnp.sin(b * l))
    out_ref[:] = 2.0 * jnp.sum(re, axis=1)


@partial(jax.jit, static_argnames=("L", "h_blk", "l_blk"))
def s4d_vandermonde_pallas(dtA_re: jax.Array, dtA_im: jax.Array, Cb_re: jax.Array,
                           Cb_im: jax.Array, L: int, h_blk: int = 8, l_blk: int = 256) -> jax.Array:
    """(H, N) x4 -> real kernel (H, L)."""
    H, N = dtA_re.shape
    pad_h = (-H) % h_blk
    pad_l = (-L) % l_blk
    args = [jnp.pad(x, ((0, pad_h), (0, 0))).astype(jnp.float32)
            for x in (dtA_re, dtA_im, Cb_re, Cb_im)]
    Hp, Lp = H + pad_h, L + pad_l

    out = pl.pallas_call(
        _vandermonde_kernel,
        grid=(Hp // h_blk, Lp // l_blk),
        in_specs=[pl.BlockSpec((h_blk, N), lambda i, j: (i, 0), memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((h_blk, l_blk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Lp), jnp.float32),
        interpret=pallas_interpret(),
    )(*args)
    return out[:H, :L]


def s4d_vandermonde_ref(dtA_re, dtA_im, Cb_re, Cb_im, L: int) -> jax.Array:
    """jnp reference (materialises (H, N, L))."""
    l = jnp.arange(L, dtype=jnp.float32)
    env = jnp.exp(dtA_re[:, :, None] * l)
    re = env * (Cb_re[:, :, None] * jnp.cos(dtA_im[:, :, None] * l)
                - Cb_im[:, :, None] * jnp.sin(dtA_im[:, :, None] * l))
    return 2.0 * jnp.sum(re, axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _vandermonde(dtA_re, dtA_im, Cb_re, Cb_im, L: int):
    """Differentiable fused Vandermonde: pallas forward, reference backward."""
    return s4d_vandermonde_pallas(dtA_re, dtA_im, Cb_re, Cb_im, L)


def _vandermonde_fwd(dtA_re, dtA_im, Cb_re, Cb_im, L):
    return s4d_vandermonde_pallas(dtA_re, dtA_im, Cb_re, Cb_im, L), (dtA_re, dtA_im, Cb_re, Cb_im)


def _vandermonde_bwd(L, res, g):
    _, vjp = jax.vjp(lambda a, b, cr, ci: s4d_vandermonde_ref(a, b, cr, ci, L), *res)
    return vjp(g)


_vandermonde.defvjp(_vandermonde_fwd, _vandermonde_bwd)


def s4d_kernel_fused(log_dt: jax.Array, A_re: jax.Array, A_im: jax.Array,
                     C_re: jax.Array, C_im: jax.Array, L: int,
                     use_pallas: bool = True) -> jax.Array:
    """Drop-in for models.s4.s4d_kernel with the pallas reduction.

    ZOH input factor Cb = C * (exp(dt*A) - 1) / A computed in plain jnp
    (O(H*N)), then the O(H*N*L) Vandermonde via pallas.
    """
    dt = jnp.exp(log_dt)[:, None]
    are, aim = A_re * dt, A_im * dt
    # exp(dtA) - 1 and division by A, in real/imag parts
    e_re = jnp.exp(are) * jnp.cos(aim) - 1.0
    e_im = jnp.exp(are) * jnp.sin(aim)
    denom = A_re**2 + A_im**2
    f_re = (e_re * A_re + e_im * A_im) / denom
    f_im = (e_im * A_re - e_re * A_im) / denom
    cb_re = C_re * f_re - C_im * f_im
    cb_im = C_re * f_im + C_im * f_re
    if use_pallas:
        return _vandermonde(are, aim, cb_re, cb_im, L)
    return s4d_vandermonde_ref(are, aim, cb_re, cb_im, L)
