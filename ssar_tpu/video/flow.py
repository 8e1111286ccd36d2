"""Pure-jnp Farneback optical flow (convolution-only, TPU-friendly).

Equivalent of the reference's differentiable Farneback port
(ssar/analysis/flow.py:173-452 — itself a re-derivation of Farneback 2003):
gaussian-weighted quadratic polynomial expansion per frame via separable
correlations, then iterative displacement solves with neighborhood-averaged
normal equations, coarse-to-fine over an average-pooling pyramid.

Everything is static-shape convs + 2x2 closed-form solves — exactly the
op mix XLA fuses well on TPU; the cv2 implementation remains the test
oracle (ssar_tpu/video/features.py:_optical_flow_cv2).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _poly_basis(n: int, sigma: float):
    """Gaussian applicability + inverse Gram of the quadratic basis
    {1, x, y, x^2, y^2, xy} (host numpy, static)."""
    x = np.arange(-n, n + 1, dtype=np.float64)
    w1d = np.exp(-(x**2) / (2 * sigma**2))
    X, Y = np.meshgrid(x, x, indexing="xy")  # X varies along cols
    w = np.outer(w1d, w1d)
    basis = np.stack([np.ones_like(X), X, Y, X**2, Y**2, X * Y])  # (6, k, k)
    G = np.einsum("ikl,jkl,kl->ij", basis, basis, w)
    Ginv = np.linalg.inv(G)
    kernels = (w[None] * basis).astype(np.float32)  # (6, k, k)
    return kernels, Ginv.astype(np.float32)


def _conv2same(img: jax.Array, kernels: np.ndarray) -> jax.Array:
    """img (B, H, W) ⊛ kernels (K, k, k) -> (B, K, H, W) (correlation)."""
    k = kernels.shape[-1]
    out = jax.lax.conv_general_dilated(
        img[:, None], jnp.asarray(kernels)[:, None],
        window_strides=(1, 1), padding=((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out


def poly_expansion(img: jax.Array, n: int = 7, sigma: float = 1.5):
    """img (B, H, W) -> (A (B,H,W,2,2), b (B,H,W,2), c (B,H,W))."""
    kernels, Ginv = _poly_basis(n, sigma)
    proj = _conv2same(img, kernels)  # (B, 6, H, W)
    coefs = jnp.einsum("ij,bjhw->bihw", jnp.asarray(Ginv), proj)
    c = coefs[:, 0]
    b = jnp.stack([coefs[:, 1], coefs[:, 2]], axis=-1)
    A = jnp.stack([
        jnp.stack([coefs[:, 3], coefs[:, 5] / 2], axis=-1),
        jnp.stack([coefs[:, 5] / 2, coefs[:, 4]], axis=-1),
    ], axis=-2)
    return A, b, c


def _bilinear_warp(field: jax.Array, flow: jax.Array) -> jax.Array:
    """field (B, H, W, ...) sampled at (x + u, y + v); border-clamped."""
    B, H, W = field.shape[:3]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=flow.dtype), jnp.arange(W, dtype=flow.dtype), indexing="ij")
    sx = jnp.clip(xs[None] + flow[..., 0], 0, W - 1)
    sy = jnp.clip(ys[None] + flow[..., 1], 0, H - 1)
    x0 = jnp.clip(jnp.floor(sx), 0, W - 2)
    y0 = jnp.clip(jnp.floor(sy), 0, H - 2)
    fx, fy = sx - x0, sy - y0
    x0, y0 = x0.astype(jnp.int32), y0.astype(jnp.int32)

    def gather(yy, xx):
        flat = field.reshape(B, H * W, -1)
        idx = yy * W + xx
        return jnp.take_along_axis(flat, idx.reshape(B, -1, 1), axis=1).reshape(field.shape[:1] + idx.shape[1:] + field.shape[3:])

    f00 = gather(y0, x0)
    f01 = gather(y0, x0 + 1)
    f10 = gather(y0 + 1, x0)
    f11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None] if field.ndim > 3 else fx
    fy = fy[..., None] if field.ndim > 3 else fy
    while fx.ndim < f00.ndim:
        fx, fy = fx[..., None], fy[..., None]
    return ((1 - fx) * (1 - fy) * f00 + fx * (1 - fy) * f01
            + (1 - fx) * fy * f10 + fx * fy * f11)


def _avg_pool2(x: jax.Array) -> jax.Array:
    B, H, W = x.shape
    return x[:, : H // 2 * 2, : W // 2 * 2].reshape(B, H // 2, 2, W // 2, 2).mean((2, 4))


def _box_blur(x: jax.Array, k: int) -> jax.Array:
    """Separable box filter along last two spatial axes of (B, H, W, ...)."""
    kern = np.ones((1, k, k), np.float32) / (k * k)
    lead = x.shape[:1]
    trail = x.shape[3:]
    flat = x.reshape(lead[0], x.shape[1], x.shape[2], -1)
    flat = jnp.moveaxis(flat, -1, 1).reshape(-1, x.shape[1], x.shape[2])
    out = _conv2same(flat, kern)[:, 0]
    out = out.reshape(lead[0], -1, x.shape[1], x.shape[2])
    return jnp.moveaxis(out, 1, -1).reshape(lead + x.shape[1:3] + trail)


@partial(jax.jit, static_argnames=("levels", "iterations", "poly_n", "win"))
def farneback_flow(gray: jax.Array, levels: int = 3, iterations: int = 3,
                   poly_n: int = 7, poly_sigma: float = 1.5, win: int = 13) -> jax.Array:
    """gray (T, H, W) in [0,1] -> flow (T-1, 2, H, W) (u, v in pixels)."""
    f1 = gray[:-1] * 255.0
    f2 = gray[1:] * 255.0

    pyr1, pyr2 = [f1], [f2]
    for _ in range(levels - 1):
        pyr1.append(_avg_pool2(pyr1[-1]))
        pyr2.append(_avg_pool2(pyr2[-1]))

    flow = None
    for lvl in range(levels - 1, -1, -1):
        a1, b1, _ = poly_expansion(pyr1[lvl], poly_n, poly_sigma)
        a2, b2, _ = poly_expansion(pyr2[lvl], poly_n, poly_sigma)
        B, H, W = pyr1[lvl].shape
        if flow is None:
            flow = jnp.zeros((B, H, W, 2), gray.dtype)
        else:
            flow = 2.0 * jax.image.resize(flow, (B, H, W, 2), method="bilinear")

        for _ in range(iterations):
            a2w = _bilinear_warp(a2.reshape(B, H, W, 4), flow).reshape(B, H, W, 2, 2)
            b2w = _bilinear_warp(b2, flow)
            A = 0.5 * (a1 + a2w)
            db = -0.5 * (b2w - b1) + jnp.einsum("bhwij,bhwj->bhwi", A, flow)
            G = _box_blur(jnp.einsum("bhwki,bhwkj->bhwij", A, A).reshape(B, H, W, 4), win).reshape(B, H, W, 2, 2)
            h = _box_blur(jnp.einsum("bhwki,bhwk->bhwi", A, db), win)
            det = G[..., 0, 0] * G[..., 1, 1] - G[..., 0, 1] * G[..., 1, 0]
            det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
            u = (G[..., 1, 1] * h[..., 0] - G[..., 0, 1] * h[..., 1]) / det
            v = (-G[..., 1, 0] * h[..., 0] + G[..., 0, 0] * h[..., 1]) / det
            flow = jnp.stack([u, v], axis=-1)

    return jnp.moveaxis(flow, -1, 1)


# -------------------------------------------------------- Lucas-Kanade --
@lru_cache(maxsize=None)
def _gauss_kernel_1d(k: int, sigma: float) -> np.ndarray:
    x = np.arange(k, dtype=np.float64) - (k - 1) / 2
    w = np.exp(-(x**2) / (2 * sigma**2))
    return (w / w.sum()).astype(np.float32)


def _gauss_blur2d(img: jax.Array, k: int = 5, sigma: float = 3.0) -> jax.Array:
    """(H, W) separable gaussian blur, reflect-padded 'same'."""
    w = jnp.asarray(_gauss_kernel_1d(k, sigma))
    p = k // 2
    x = jnp.pad(img, ((p, p), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(x[None, None], w[None, None, :, None],
                                     (1, 1), "VALID",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"),
                                     precision=jax.lax.Precision.HIGHEST)[0, 0]
    x = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
    x = jax.lax.conv_general_dilated(x[None, None], w[None, None, None, :],
                                     (1, 1), "VALID",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"),
                                     precision=jax.lax.Precision.HIGHEST)[0, 0]
    return x


def lucas_kanade(im1: jax.Array, im2: jax.Array, win: int = 2) -> jax.Array:
    """Single-level differentiable Lucas-Kanade flow (flow.py:76-131).

    im1, im2: (H, W) grayscale.  Central-difference gradients, gaussian-
    blurred structure-tensor entries, integral-image window sums of width
    2*win+1, closed-form 2x2 solve per pixel; borders zero.  (H, W, 2).
    """
    H, W = im1.shape
    z = jnp.zeros_like(im1)
    I_x = z.at[1:-1, 1:-1].set((im1[1:-1, 2:] - im1[1:-1, :-2]) / 2)
    I_y = z.at[1:-1, 1:-1].set((im1[2:, 1:-1] - im1[:-2, 1:-1]) / 2)
    I_t = z.at[1:-1, 1:-1].set(im1[1:-1, 1:-1] - im2[1:-1, 1:-1])

    params = jnp.stack([_gauss_blur2d(p) for p in
                        (I_x * I_x, I_y * I_y, I_x * I_y, I_x * I_t, I_y * I_t)], axis=-1)
    cum = jnp.cumsum(jnp.cumsum(params, axis=0), axis=1)
    s = 2 * win + 1
    wp = (cum[s:, s:] - cum[s:, :-s] - cum[:-s, s:] + cum[:-s, :-s])

    det = wp[..., 0] * wp[..., 1] - wp[..., 2] ** 2
    safe = jnp.where(det != 0, det, 1.0)
    fx = jnp.where(det != 0, (wp[..., 1] * wp[..., 3] - wp[..., 2] * wp[..., 4]) / safe, 0.0)
    fy = jnp.where(det != 0, (wp[..., 0] * wp[..., 4] - wp[..., 2] * wp[..., 3]) / safe, 0.0)

    flow = jnp.zeros((H, W, 2), im1.dtype)
    flow = flow.at[win + 1 : -1 - win, win + 1 : -1 - win, 0].set(fx[:-1, :-1])
    flow = flow.at[win + 1 : -1 - win, win + 1 : -1 - win, 1].set(fy[:-1, :-1])
    return flow


def _pyramid_reduce(img: jax.Array) -> jax.Array:
    return _gauss_blur2d(img, 5, 1.0)[::2, ::2]


@partial(jax.jit, static_argnames=("levels",))
def lucas_kanade_pyramid(im1: jax.Array, im2: jax.Array, levels: int = 4) -> jax.Array:
    """Coarse-to-fine gaussian-pyramid LK (flow.py:134-156).  (H, W, 2)."""
    pyramid = []
    a, b = im1, im2
    for _ in range(levels):
        a, b = _pyramid_reduce(a), _pyramid_reduce(b)
        pyramid.append((a, b))

    flow = lucas_kanade(a, b)
    for p1, p2 in pyramid[-2::-1]:
        up = 2.0 * jax.image.resize(flow, (flow.shape[0] * 2, flow.shape[1] * 2, 2), "bilinear")
        flow = up[: p1.shape[0], : p1.shape[1]] + lucas_kanade(p1, p2)
    return flow
