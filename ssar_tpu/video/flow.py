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


# ------------------------------------- parametrized (certainty) Farneback --
@lru_cache(maxsize=None)
def _nc_basis(sigma: float):
    """Separable normalized-convolution basis (host, static): gaussian
    applicability a and the 6 quadratic basis columns along each axis
    (ssar/analysis/flow.py:196-238).  Returns the (k, 6) per-axis
    applicability-weighted bases and raw bases."""
    n = int(4 * sigma + 1)
    x = np.arange(-n, n + 1, dtype=np.float64)
    a = np.exp(-(x ** 2) / (2 * sigma ** 2))
    one = np.ones_like(x)
    bx = np.stack([one, x, one, x ** 2, one, x], -1)   # basis along width
    by = np.stack([one, one, x, one, x ** 2, x], -1)   # basis along height
    return (a[:, None] * bx).astype(np.float32), bx.astype(np.float32), \
        (a[:, None] * by).astype(np.float32), by.astype(np.float32)


def _corr_rows(img: jax.Array, kernels: jax.Array) -> jax.Array:
    """(B, C, H, W) correlated along H with per-channel kernels (C, k)."""
    C, k = kernels.shape
    return jax.lax.conv_general_dilated(
        img, kernels[:, None, :, None], window_strides=(1, 1),
        padding=((k // 2, k // 2), (0, 0)), feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=jax.lax.Precision.HIGHEST)


def _corr_cols(img: jax.Array, kernels: jax.Array) -> jax.Array:
    C, k = kernels.shape
    return jax.lax.conv_general_dilated(
        img, kernels[:, None, None, :], window_strides=(1, 1),
        padding=((0, 0), (k // 2, k // 2)), feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=jax.lax.Precision.HIGHEST)


def poly_expansion_certainty(f: jax.Array, c: jax.Array, sigma: float = 4.0):
    """Certainty-weighted polynomial expansion (normalized convolution,
    ssar/analysis/flow.py:173-258): per-pixel 6x6 Gram from separable
    basis correlations of the certainty field, solved in one batched call.

    f, c: (B, H, W) -> (A (B,H,W,2,2), b (B,H,W,2), C0 (B,H,W)).
    The 36 G entries + 6 v entries run as two grouped convs per axis —
    one MXU-shaped program instead of the reference's 84 python-loop
    correlations.
    """
    abx, bx, aby, by = _nc_basis(float(sigma))
    # pair products: along each axis the (i, j) kernel is a * b_i * b_j
    gx = jnp.asarray((abx[:, :, None] * bx[:, None, :]).reshape(-1, 36).T)  # (36, k)
    gy = jnp.asarray((aby[:, :, None] * by[:, None, :]).reshape(-1, 36).T)
    B_, H, W = f.shape
    c4 = jnp.broadcast_to(c[:, None], (B_, 36, H, W)) if c.ndim == 3 else \
        jnp.broadcast_to(c[None, None], (B_, 36, H, W))
    G = _corr_cols(_corr_rows(c4, gy), gx)  # height kernel = y basis
    cf = (c * f)[:, None]
    v = _corr_cols(_corr_rows(jnp.broadcast_to(cf, (B_, 6, H, W)), jnp.asarray(aby.T)),
                   jnp.asarray(abx.T))
    Gm = G.transpose(0, 2, 3, 1).reshape(B_, H, W, 6, 6)
    vm = v.transpose(0, 2, 3, 1)
    ridge = 1e-6 * jnp.trace(Gm, axis1=-2, axis2=-1)[..., None, None] * jnp.eye(6)
    r = jnp.linalg.solve(Gm + ridge, vm[..., None])[..., 0]
    A = jnp.stack([jnp.stack([r[..., 3], r[..., 5] / 2], -1),
                   jnp.stack([r[..., 5] / 2, r[..., 4]], -1)], -2)
    b = jnp.stack([r[..., 1], r[..., 2]], -1)  # (d/dx, d/dy)
    return A, b, r[..., 0]


def _border_certainty(H: int, W: int) -> np.ndarray:
    """Linear 5-pixel confidence ramp at the image border
    (ssar/analysis/flow.py:427-429)."""
    i = np.arange(H, dtype=np.float32)[:, None]
    j = np.arange(W, dtype=np.float32)[None, :]
    c = np.minimum(np.minimum(i, H - 1 - i), np.minimum(j, W - 1 - j)) / 5.0
    return np.minimum(c, 1.0)


def _warp_model_S(H: int, W: int, model: str) -> np.ndarray | None:
    """Warp parametrization S (H, W, 2, k): d = S p
    (ssar/analysis/flow.py:294-325), in (x, y) displacement convention."""
    if model == "constant":
        return None
    y, x = np.meshgrid(np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij")
    k = 6 if model == "affine" else 8
    S = np.zeros((H, W, 2, k), np.float32)
    S[..., 0, 0] = 1; S[..., 0, 1] = x; S[..., 0, 2] = y
    S[..., 1, 3] = 1; S[..., 1, 4] = x; S[..., 1, 5] = y
    if model == "eight_param":
        S[..., 0, 6] = x * x; S[..., 0, 7] = x * y
        S[..., 1, 6] = x * y; S[..., 1, 7] = y * y
    return S


def _gauss_sep_blur(x: jax.Array, sigma_flow: float) -> jax.Array:
    """Unnormalized gaussian matching window along H, W of (B, H, W, ...)
    (ssar/analysis/flow.py:289-292)."""
    n = int(4 * sigma_flow + 1)
    t = np.arange(-n, n + 1, dtype=np.float64)
    w = np.exp(-(t ** 2) / (2 * sigma_flow ** 2)).astype(np.float32)
    lead, trail = x.shape[0], x.shape[3:]
    flat = x.reshape(lead, x.shape[1], x.shape[2], -1)
    flat = jnp.moveaxis(flat, -1, 1).reshape(-1, 1, x.shape[1], x.shape[2])
    wj = jnp.asarray(w)
    out = _corr_rows(flat, wj[None])
    out = _corr_cols(out, wj[None])[:, 0]
    out = out.reshape(lead, -1, x.shape[1], x.shape[2])
    return jnp.moveaxis(out, 1, -1).reshape(x.shape[:3] + trail)


def _nearest_gather(field: jax.Array, xi: jax.Array, yi: jax.Array) -> jax.Array:
    """field (B, H, W, ...) at integer pixel indices (B, H, W)."""
    B, H, W = field.shape[:3]
    flat = field.reshape(B, H * W, -1)
    idx = yi * W + xi
    out = jnp.take_along_axis(flat, idx.reshape(B, -1, 1), axis=1)
    return out.reshape(field.shape[:1] + idx.shape[1:] + field.shape[3:])


@partial(jax.jit, static_argnames=("model", "mu", "n_pyr", "num_iter", "sigma", "sigma_flow"))
def farneback_parametrized(gray: jax.Array, model: str = "constant", mu: float = 0.0,
                           sigma: float = 4.0, sigma_flow: float = 4.0,
                           n_pyr: int = 1, num_iter: int = 1) -> jax.Array:
    """Certainty-weighted Farneback with parametrized warp models
    (ssar/analysis/flow.py:260-452): gray (T, H, W) in [0, 1] ->
    flow (T-1, 2, H, W), (u, v) in pixels.

    model: "constant" solves a per-pixel 2-vector; "affine"/"eight_param"
    fit d = S p with per-pixel k-param normal equations S^T A^T A S.
    mu != 0 regularizes the local solve toward the GLOBAL parametrized
    warp (mu < 0 -> trace(G_avg)/2, the thesis default).  Note the
    reference's mu branch computes ``S @ sol`` with a 2-vector sol and so
    only ever ran with model="constant"; here the regularized local
    2-vector solve works under every model, which is the intended
    semantics.  Batched over frame pairs — every step is a conv, einsum,
    or batched small solve.
    """
    f1 = gray[:-1] * 255.0
    f2 = gray[1:] * 255.0
    pyr1, pyr2 = [f1], [f2]
    for _ in range(n_pyr - 1):
        pyr1.append(_avg_pool2(pyr1[-1]))
        pyr2.append(_avg_pool2(pyr2[-1]))

    flow = None
    for lvl in range(n_pyr - 1, -1, -1):
        p1, p2 = pyr1[lvl], pyr2[lvl]
        B, H, W = p1.shape
        cert = jnp.asarray(_border_certainty(H, W))
        if flow is None:
            flow = jnp.zeros((B, H, W, 2), gray.dtype)
        else:
            flow = 2.0 * jax.image.resize(flow, (B, H, W, 2), method="bilinear")
        A1, b1, _ = poly_expansion_certainty(p1, jnp.broadcast_to(cert, p1.shape), sigma)
        A2, b2, _ = poly_expansion_certainty(p2, jnp.broadcast_to(cert, p2.shape), sigma)
        S = _warp_model_S(H, W, model)
        Sj = None if S is None else jnp.asarray(S)
        ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")

        for _ in range(num_iter):
            # nearest-pixel displacement gather, certainty 0 off-image
            xi = xs[None] + flow[..., 0].astype(jnp.int32)
            yi = ys[None] + flow[..., 1].astype(jnp.int32)
            xi_c = jnp.clip(xi, 0, W - 1)
            yi_c = jnp.clip(yi, 0, H - 1)
            on_img = ((xi == xi_c) & (yi == yi_c)).astype(gray.dtype)
            c_ = cert[None] * on_img * _nearest_gather(cert[None].repeat(B, 0)[..., None], xi_c, yi_c)[..., 0]

            A = 0.5 * (A1 + _nearest_gather(A2.reshape(B, H, W, 4), xi_c, yi_c).reshape(B, H, W, 2, 2))
            A = A * c_[..., None, None]
            delB = -0.5 * (_nearest_gather(b2, xi_c, yi_c) - b1) \
                + jnp.einsum("bhwij,bhwj->bhwi", A, flow)
            delB = delB * c_[..., None]

            AtA = jnp.einsum("bhwki,bhwkj->bhwij", A, A)
            Atb = jnp.einsum("bhwki,bhwk->bhwi", A, delB)
            if mu == 0.0:
                if Sj is None:
                    G = _gauss_sep_blur(AtA.reshape(B, H, W, 4), sigma_flow).reshape(B, H, W, 2, 2)
                    h = _gauss_sep_blur(Atb, sigma_flow)
                    ridge = 1e-6 * jnp.trace(G, axis1=-2, axis2=-1)[..., None, None] * jnp.eye(2)
                    flow = jnp.linalg.solve(G + ridge, h[..., None])[..., 0]
                else:
                    k = Sj.shape[-1]
                    GS = jnp.einsum("hwik,bhwij,hwjl->bhwkl", Sj, AtA, Sj)
                    hS = jnp.einsum("hwik,bhwi->bhwk", Sj, Atb)
                    GS = _gauss_sep_blur(GS.reshape(B, H, W, k * k), sigma_flow).reshape(B, H, W, k, k)
                    hS = _gauss_sep_blur(hS, sigma_flow)
                    ridge = 1e-6 * jnp.trace(GS, axis1=-2, axis2=-1)[..., None, None] * jnp.eye(k)
                    sol = jnp.linalg.solve(GS + ridge, hS[..., None])[..., 0]
                    flow = jnp.einsum("hwik,bhwk->bhwi", Sj, sol)
            else:
                if Sj is None:
                    G_avg = AtA.mean((1, 2))
                    p_avg = jnp.linalg.solve(G_avg, Atb.mean((1, 2))[..., None])[..., 0]
                    d_avg = jnp.broadcast_to(p_avg[:, None, None], (B, H, W, 2))
                else:
                    k = Sj.shape[-1]
                    G_avg = jnp.einsum("hwik,bhwij,hwjl->bkl", Sj, AtA, Sj) / (H * W)
                    h_avg = jnp.einsum("hwik,bhwi->bk", Sj, Atb) / (H * W)
                    p_avg = jnp.linalg.solve(G_avg, h_avg[..., None])[..., 0]
                    d_avg = jnp.einsum("hwik,bk->bhwi", Sj, p_avg)
                mu_eff = jnp.where(mu < 0, 0.5 * jnp.trace(G_avg, axis1=-2, axis2=-1), mu)[:, None, None]
                G = _gauss_sep_blur(AtA.reshape(B, H, W, 4), sigma_flow).reshape(B, H, W, 2, 2)
                h = _gauss_sep_blur(Atb, sigma_flow)
                Gr = G + mu_eff[..., None, None] * jnp.eye(2)
                flow = jnp.linalg.solve(Gr, (h + mu_eff[..., None] * d_avg)[..., None])[..., 0]

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
