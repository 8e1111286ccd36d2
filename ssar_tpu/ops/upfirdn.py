"""upfirdn2d + fused bias/leaky-relu — StyleGAN2's two custom CUDA ops, XLA-native.

The reference delegates synthesis to maua's CUDA `upfirdn2d` / `fused_bias_act`
(SURVEY.md §2.6) with a pure-torch fallback (ssar/models/stylegan2.py:33-93).
On TPU both are expressed so XLA fuses them into the surrounding convs:

- ``upfirdn2d``: zero-insertion upsampling is `lhs_dilation` of a single
  `conv_general_dilated`, the FIR blur is a depthwise conv (channels folded
  into batch), and downsampling is the conv's output stride — one fused op,
  no intermediate materialisation.
- ``fused_leaky_relu``: bias + leaky-relu + sqrt(2) gain, a trivial VPU
  epilogue XLA fuses into the producing matmul/conv.

Layout is NHWC throughout (TPU-native).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_blur_kernel(k=(1, 3, 3, 1)) -> np.ndarray:
    """Normalised separable outer-product FIR kernel."""
    k = np.asarray(k, dtype=np.float32)
    kernel = np.outer(k, k)
    return kernel / kernel.sum()


@partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(x: jax.Array, kernel: jax.Array, up: int = 1, down: int = 1,
              pad: tuple[int, int] = (0, 0)) -> jax.Array:
    """(B, H, W, C) -> upsample x`up` (zero insertion), pad, FIR, downsample x`down`.

    Matches scipy.signal.upfirdn / the StyleGAN2 CUDA op semantics per
    spatial axis: out = ((H - 1) * up + 1 + pad0 + pad1 - (kh - 1) + down - 1) // down.
    """
    B, H, W, C = x.shape
    kh, kw = kernel.shape
    # depthwise conv in native NHWC (feature_group_count=C): 3x faster than
    # folding channels into batch on v5e and avoids the NCHW relayout copies
    # that blew HBM at large batch (padded bf16[B*C,1,H,W] temps).
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)  # true convolution
    kd = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, C))
    pad0, pad1 = pad
    # torch-style upfirdn upsamples to H*up (up-1 trailing zeros); lhs_dilation
    # yields (H-1)*up + 1, so fold the missing zeros into the right pad.
    return jax.lax.conv_general_dilated(
        x, kd,
        window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def fused_leaky_relu(x: jax.Array, bias: jax.Array | None = None, negative_slope: float = 0.2,
                     scale: float = float(np.sqrt(2))) -> jax.Array:
    """bias (broadcast over last axis) + leaky relu + gain."""
    if bias is not None:
        x = x + bias
    return jnp.where(x >= 0, x, negative_slope * x) * jnp.asarray(scale, x.dtype)


def upsample2x(x: jax.Array, blur_kernel=(1, 3, 3, 1)) -> jax.Array:
    """StyleGAN2 `Upsample` module: upfirdn(up=2, k*4, pad=(p+1)//2, p//2)."""
    k = make_blur_kernel(blur_kernel) * 4.0
    p = k.shape[0] - 2
    return upfirdn2d(x, jnp.asarray(k), up=2, pad=((p + 1) // 2 + 1, p // 2))


def downsample2x(x: jax.Array, blur_kernel=(1, 3, 3, 1)) -> jax.Array:
    k = make_blur_kernel(blur_kernel)
    p = k.shape[0] - 2
    return upfirdn2d(x, jnp.asarray(k), down=2, pad=((p + 1) // 2, p // 2))
