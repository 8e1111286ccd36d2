"""Gaussian temporal smoothing along the frame axis.

Equivalent of the reference's ``gaussian_filter``
(ssar/features/processing.py:10-48): a 1-D gaussian kernel of radius
``min(int(sigma * 4), 3 * T)`` convolved along axis 0 with circular padding
by default.  Implemented as a depthwise convolution with the time axis
flattened into the batch dimension — XLA lowers this to a single fused
conv that keeps the VPU busy; no per-channel Python loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PAD_MODE = {"circular": "wrap", "reflect": "reflect", "replicate": "edge", "constant": "constant"}


def gaussian_kernel(sigma: float, radius: int, dtype=jnp.float32) -> jax.Array:
    t = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 / (sigma**2) * t**2)
    return k / jnp.sum(k)


@partial(jax.jit, static_argnames=("sigma", "mode", "causal"))
def gaussian_filter(x: jax.Array, sigma: float, mode: str = "circular", causal: float = 1.0) -> jax.Array:
    """Smooth `x` along axis 0 with a gaussian of std `sigma` (in frames).

    Accepts (T,), (T, C), (T, C, H, W)... — any shape with time leading.
    Output shape follows the reference convention: trailing singleton dims
    introduced internally are squeezed, so a (T, 1) input returns (T,)
    exactly like the torch implementation's ``.squeeze()``
    (ssar/features/processing.py:45-46).
    """
    in_ndim = x.ndim
    in_shape = x.shape
    T = x.shape[0]
    radius = min(int(sigma * 4), 3 * T)

    if radius == 0:
        return x

    kernel = gaussian_kernel(sigma, radius, jnp.promote_types(x.dtype, jnp.float32))

    # Flatten everything but time into a batch axis: (B, 1, T)
    flat = x.reshape(T, -1).T[:, None, :].astype(kernel.dtype)

    if radius > T:  # double-pad trick for very short sequences (ref :31-36)
        flat = jnp.pad(flat, ((0, 0), (0, 0), (T, T)), mode=_PAD_MODE[mode])
        flat = jnp.pad(flat, ((0, 0), (0, 0), (radius - T, radius - T)), mode="edge")
    else:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (radius, radius)), mode=_PAD_MODE[mode])

    out = jax.lax.conv_general_dilated(
        flat,
        kernel[None, None, :],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    out = out[:, 0, :].T.reshape(in_shape).astype(x.dtype)

    # torch path reshapes (T,) -> (T,1,1) and (T,C) -> (T,C,1) then calls
    # .squeeze(); mirror the observable effect: squeeze trailing singletons
    # for inputs of ndim <= 2 only (ndim-3/4 inputs keep their shape).
    if in_ndim <= 2:
        while out.ndim > 1 and out.shape[-1] == 1:
            out = out[..., 0]
    return out
