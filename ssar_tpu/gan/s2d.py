"""Space-to-depth StyleGAN2 synthesis level (the lane-packing optimisation).

At 1024 px the synthesis channels (32) fill a quarter of the TPU's 128-lane
registers, so every pass over the (B, 1024, 1024, 32) activations moves 4x
padded HBM traffic.  This module re-expresses a whole resolution level in
space-to-depth form — activations live as (B, H/2, W/2, 4C), channel index
``c*4 + phase`` with phase = 2*dy + dx — so the lanes stay full and the
full-resolution grid never materialises until one final depth-to-space.

Every kernel builder is verified numerically against the full-resolution
op it replaces (tests/test_gan.py); the level output is bit-comparable to
the reference formulation within bf16 tolerance.

No reference counterpart (the CUDA path has no layout problem); this is
TPU-specific engineering on top of ssar/models/stylegan2.py semantics.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, 2H, 2W, C) -> (B, H, W, 4C), channel = c*4 + (2*dy + dx)."""
    B, H2, W2, C = x.shape
    x = x.reshape(B, H2 // 2, 2, W2 // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H, W, C, dy, dx)
    return x.reshape(B, H2 // 2, W2 // 2, C * 4)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H, W, 4C) -> (B, 2H, 2W, C)."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, H, W, C, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, dy, W, dx, C)
    return x.reshape(B, 2 * H, 2 * W, C)


def _phase(dy: int, dx: int) -> int:
    return 2 * dy + dx


# ------------------------------------------------------- kernel builders --
def upconv_s2d_kernel(K: jax.Array) -> jax.Array:
    """3x3 conv_transpose(stride 2) kernel (kh, kw, Cin, Cout) [our layout,
    as consumed by jax.lax.conv_transpose with swapaxes+transpose_kernel]
    -> (2, 2, Cin, 4*Cout) s2d kernel: one plain conv on the full-res input
    produces all four output phases.

    Derivation: y[m, n] = sum_{i,j} x[i, j] K[m - 2i, n - 2j]; for output
    s2d position (a, b) phase (py, px), taps K[2u + py, 2v + px] hit input
    (a - u, b - v) — i.e. a 2x2 cross-correlation with the flipped
    phase-strided sub-kernel.
    """
    kh, kw, Cin, Cout = K.shape
    assert kh == 3 and kw == 3
    out = jnp.zeros((2, 2, Cin, 4 * Cout), K.dtype)
    for py in (0, 1):
        for px in (0, 1):
            p = _phase(py, px)
            for u in (0, 1):
                for v in (0, 1):
                    ky, kx = 2 * u + py, 2 * v + px
                    if ky < 3 and kx < 3:
                        # cross-correlation index: tap at input offset (-u, -v)
                        # -> kernel position (1 - u, 1 - v) in a 2x2 window
                        # anchored so padding (1, 0) aligns (see conv below)
                        out = out.at[1 - u, 1 - v, :, p * Cout : (p + 1) * Cout].add(
                            K[ky, kx])
    # interleave phases into c*4 + p channel order
    return out.reshape(2, 2, Cin, 4, Cout).transpose(0, 1, 2, 4, 3).reshape(2, 2, Cin, 4 * Cout)


def upconv_s2d(x: jax.Array, K: jax.Array, dtype=None) -> jax.Array:
    """Full-res input (B, H, W, Cin) -> s2d output (B, H+1, W+1, 4*Cout):
    s2d of the stride-2 VALID conv_transpose output (2H+1 rows) padded with
    one trailing zero row/col (so the following blur sees the boundary
    exactly as upfirdn's pad does)."""
    ks = upconv_s2d_kernel(K).astype(dtype or x.dtype)
    return jax.lax.conv_general_dilated(
        x, ks, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _blur_phase_kernel(blur) -> np.ndarray:
    """(3, 3, pin, pout) phase-mixing correlation kernel of the 4-tap FIR
    on the s2d grid (the per-channel factor of blur_s2d_kernel)."""
    blur = np.asarray(blur, np.float64)
    bf = blur[::-1, ::-1]
    k = np.zeros((3, 3, 4, 4))
    for py in (0, 1):
        for px in (0, 1):
            pout = _phase(py, px)
            for ty in range(4):
                for tx in range(4):
                    fy, fx = py - 1 + ty, px - 1 + tx
                    qy, ry = divmod(fy, 2)
                    qx, rx = divmod(fx, 2)
                    k[qy + 1, qx + 1, _phase(ry, rx), pout] += bf[ty, tx]
    return k


def _upconv_blur_keff(K: jax.Array, blur) -> jax.Array:
    """Composed up-conv+FIR kernel (4, 4, Cin, Cout, 4): one stride-1 conv
    of the full-res input with this kernel (padding (2, 1)) produces the
    s2d of upfirdn2d(conv_transpose(x, K), blur, pad=(1, 1))."""
    kh, kw, Cin, Cout = K.shape
    ku = upconv_s2d_kernel(K).reshape(2, 2, Cin, Cout, 4)
    kph = _blur_phase_kernel(blur)  # (3, 3, 4, 4) numpy constant
    keff = jnp.zeros((4, 4, Cin, Cout, 4), K.dtype)
    for sy in range(3):
        for sx in range(3):
            kb = jnp.asarray(kph[sy, sx], K.dtype)  # (pin, pout)
            for uy in range(2):
                for ux in range(2):
                    keff = keff.at[sy + uy, sx + ux].add(
                        jnp.einsum("icp,pq->icq", ku[uy, ux], kb))
    return keff


def upconv_blur_s2d(x: jax.Array, K: jax.Array | None, blur, keff: jax.Array | None = None) -> jax.Array:
    """The styled up path: conv_transpose(stride 2) + 4-tap FIR (pad 1,1) —
    (B, H, W, Cin) full-res -> (B, H, W, 4*Cout) s2d, numerically equal to
    s2d(upfirdn2d(conv_transpose(x, K), blur, pad=(1, 1))).

    The two convs are composed into ONE dense (4, 4, Cin, 4*Cout) kernel:
    XLA lowers the grouped phase-mixing conv with an 8x-padded temp, and a
    dense conv keeps everything on the MXU in one pass.

    Pass a precomposed ``keff`` (from :func:`upconv_blur_s2d_keff`) to skip
    the on-device composition — it depends only on the weights, and building
    it inside the hot program measured ~45 ms/step at 1024 px (the tiny
    slice/einsum chain serialises; see prepare_synthesis in stylegan2.py).
    """
    if keff is None:
        kh, kw, Cin, Cout = K.shape
        keff = _upconv_blur_keff(K, blur).reshape(4, 4, Cin, 4 * Cout)
    out = jax.lax.conv_general_dilated(
        x, keff.astype(x.dtype), (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[:, : x.shape[1], : x.shape[2]]


def upconv_blur_s2d_keff(K: jax.Array, blur) -> jax.Array:
    """Precompose the up-conv+blur kernel for :func:`upconv_blur_s2d`."""
    kh, kw, Cin, Cout = K.shape
    return _upconv_blur_keff(K, blur).reshape(4, 4, Cin, 4 * Cout)


def blur_s2d_kernel(blur: jax.Array, C: int, dtype=jnp.float32) -> jax.Array:
    """4x4 depthwise FIR -> s2d grouped kernel (3, 3, 4, 4*C) for
    feature_group_count=C (channel layout c*4 + phase).

    Output phase (py, px) at (a, b) sums input full-res taps
    (2a + py - dy0 + t) for the 4 taps; in s2d coords that spans 3 window
    positions, so the grouped kernel is 3x3 over (in-phase -> out-phase).
    """
    blur = np.asarray(blur, np.float64)  # static FIR -> all-numpy (jit-safe constant)
    kb = blur.shape[0]
    assert kb == 4
    # full-res cross-correlation offsets for pad (1, 2) 'same'-ish window:
    # out[m] = sum_t in[m - 1 + t] * blur_flipped[t]  (t = 0..3)
    bf = blur[::-1, ::-1]
    k = np.zeros((3, 3, 4, 4))  # (wy, wx, pin, pout)
    for py in (0, 1):
        for px in (0, 1):
            pout = _phase(py, px)
            for ty in range(4):
                for tx in range(4):
                    # input full-res index = 2a + py - 1 + ty
                    fy = py - 1 + ty
                    fx = px - 1 + tx
                    qy, ry = divmod(fy, 2)   # s2d row offset, input phase row
                    qx, rx = divmod(fx, 2)
                    # window position: qy in {-1, 0, 1} -> wy = qy + 1
                    k[qy + 1, qx + 1, _phase(ry, rx), pout] += bf[ty, tx]
    return jnp.asarray(np.tile(k, (1, 1, 1, C)), dtype)  # every channel same FIR


def blur_s2d(x: jax.Array, blur: jax.Array) -> jax.Array:
    """(B, H, W, 4C) s2d -> blurred s2d, equal to
    s2d(upfirdn-style 4-tap FIR with pad (1, 2) on the full-res image)."""
    C = x.shape[-1] // 4
    k = blur_s2d_kernel(blur, C, dtype=x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def conv3x3_s2d_kernel(K: jax.Array) -> jax.Array:
    """Full-res 3x3 SAME conv kernel (3, 3, Cin, Cout) -> s2d kernel
    (3, 3, 4*Cin, 4*Cout), channel layout c*4 + phase."""
    kh, kw, Cin, Cout = K.shape
    assert kh == 3 and kw == 3
    out = jnp.zeros((3, 3, Cin, 4, Cout, 4), K.dtype)  # traced-weight safe
    for py in (0, 1):
        for px in (0, 1):
            pout = _phase(py, px)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    fy, fx = py + dy, px + dx        # input full-res offset
                    qy, ry = divmod(fy, 2)
                    qx, rx = divmod(fx, 2)
                    out = out.at[qy + 1, qx + 1, :, _phase(ry, rx), :, pout].add(
                        K[dy + 1, dx + 1])
    return out.reshape(3, 3, 4 * Cin, 4 * Cout)


def conv3x3_s2d(x: jax.Array, K: jax.Array | None, ks: jax.Array | None = None) -> jax.Array:
    if ks is None:
        ks = conv3x3_s2d_kernel(K)
    return jax.lax.conv_general_dilated(
        x, ks.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv1x1_s2d_kernel(K: jax.Array) -> jax.Array:
    """1x1 conv (1, 1, Cin, Cout) -> phase-diagonal (1, 1, 4Cin, 4Cout)."""
    _, _, Cin, Cout = K.shape
    out = jnp.zeros((1, 1, Cin, 4, Cout, 4), K.dtype)  # traced-weight safe
    for p in range(4):
        out = out.at[0, 0, :, p, :, p].set(K[0, 0])
    return out.reshape(1, 1, 4 * Cin, 4 * Cout)


def upsample2x_s2d_kernel(blur4: jax.Array, C: int) -> jax.Array:
    """upsample2x (zero-insert + 4-tap FIR * 4, pads (2,1)) from full-res
    (B, H, W, C) directly INTO s2d (B, H, W, 4C): kernel (2, 2, 1, 4) per
    group (feature_group_count=C is wrong here since input has C channels
    -> build (2, 2, C, 4C) dense-diagonal instead)."""
    bf = np.asarray(blur4, np.float64)[::-1, ::-1]  # static FIR, jit-safe
    out = np.zeros((3, 3, C, C, 4), np.float32)
    for py in (0, 1):
        for px in (0, 1):
            p = _phase(py, px)
            # full-res output m = 2a + py; upfirdn up=2 pad (2,1):
            # out[m] = sum_t z[m - 2 + t] bf[t], z = zero-inserted input
            # (z[2i] = x[i]); nonzero taps where m - 2 + t even.
            for ty in range(4):
                for tx in range(4):
                    fy, fx = py - 2 + ty, px - 2 + tx
                    if fy % 2 == 0 and fx % 2 == 0:
                        qy, qx = fy // 2, fx // 2     # in {-1, 0, 1}
                        for c in range(C):
                            out[qy + 1, qx + 1, c, c, p] += bf[ty, tx]
    return jnp.asarray(out.reshape(3, 3, C, 4 * C))


def upsample2x_s2d(x: jax.Array, blur4: jax.Array) -> jax.Array:
    """Full-res (B, H, W, C) -> s2d of upsample2x(x): (B, H, W, 4C)."""
    k = upsample2x_s2d_kernel(blur4, x.shape[-1]).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def repeat4(v: jax.Array) -> jax.Array:
    """Per-channel vector (..., C) -> (..., 4C) matching layout c*4 + p."""
    return jnp.repeat(v, 4, axis=-1)


def noise_to_s2d(noise: jax.Array) -> jax.Array:
    """(B, 2H, 2W, 1) full-res noise -> (B, H, W, 4) phase planes."""
    return space_to_depth(noise)


# ------------------------------------------------- block-4 (s2d^2) level --
# The FINAL level's up-conv can consume the previous level's s2d output
# directly and emit block-4 space-to-depth (4x4 pixel blocks as 16 channel
# phases): both of the last two resolution levels then run with full
# 128-lane registers and the full-resolution grid materialises exactly
# once, at the 3-channel RGB output.  Phase layout: channel = c*16 + ph,
# ph = 4*py + px, image[4e + py, 4f + px] = s2d4[e, f, c*16 + ph].

def space_to_depth4(x: jax.Array) -> jax.Array:
    """(B, 4H, 4W, C) -> (B, H, W, 16C), channel = c*16 + (4*py + px)."""
    B, H4, W4, C = x.shape
    x = x.reshape(B, H4 // 4, 4, W4 // 4, 4, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H, W, C, py, px)
    return x.reshape(B, H4 // 4, W4 // 4, C * 16)


def depth_to_space4(x: jax.Array) -> jax.Array:
    """(B, H, W, 16C) -> (B, 4H, 4W, C)."""
    B, H, W, C16 = x.shape
    C = C16 // 16
    x = x.reshape(B, H, W, C, 4, 4)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, py, W, px, C)
    return x.reshape(B, 4 * H, 4 * W, C)


def _phase4(py: int, px: int) -> int:
    return 4 * py + px


def upconv_blur_s2d_chain_kernel(K: jax.Array, blur) -> jax.Array:
    """(3, 3, 4*Cin, 16*Cout) kernel: one SAME conv of the s2d (block-2)
    input with this kernel equals s2d4 of the full-res up path
    (conv_transpose stride 2 + FIR) — i.e. upconv_blur_s2d composed with
    depth_to_space on the input and a block-2 re-blocking on the output,
    with zero handoff passes.

    Derivation: the composed full-res kernel keff (4, 4, Cin, Cout, p2)
    maps full-res input row i = m - 2 + sy to block-2-of-2H output at m.
    Writing m = 2e + u (u in {0,1} — the extra s2d of the OUTPUT grid) and
    i = 2a + ry (the s2d form of the INPUT) gives a 3x3 window over the
    input cells a with output phase PY = 2u + py.
    """
    kh, kw, Cin, Cout = K.shape
    keff = _upconv_blur_keff(K, blur)  # (4, 4, Cin, Cout, 4)
    out = jnp.zeros((3, 3, Cin, 4, Cout, 16), K.dtype)
    for u in (0, 1):
        for sy in range(4):
            oy = u - 2 + sy
            wy, ry = (oy - (oy % 2)) // 2 + 1, oy % 2
            for v in (0, 1):
                for sx in range(4):
                    ox = v - 2 + sx
                    wx, rx = (ox - (ox % 2)) // 2 + 1, ox % 2
                    kblk = keff[sy, sx].reshape(Cin, Cout, 2, 2)  # (ci, co, py, px)
                    for py in (0, 1):
                        for px in (0, 1):
                            ph = _phase4(2 * u + py, 2 * v + px)
                            out = out.at[wy, wx, :, _phase(ry, rx), :, ph].add(
                                kblk[:, :, py, px])
    return out.reshape(3, 3, 4 * Cin, 16 * Cout)


def upconv_blur_s2d_chain(x2: jax.Array, K: jax.Array, blur, dtype=None) -> jax.Array:
    """s2d input (B, H, W, 4*Cin) [block-2 of a (2H, 2W, Cin) image] ->
    s2d4 output (B, H, W, 16*Cout) [block-4 of the (4H, 4W, Cout) up path]."""
    ks = upconv_blur_s2d_chain_kernel(K, blur).astype(dtype or x2.dtype)
    return jax.lax.conv_general_dilated(
        x2, ks, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv3x3_s2d4_kernel(K: jax.Array) -> jax.Array:
    """Full-res 3x3 SAME conv (3, 3, Cin, Cout) -> block-4 kernel
    (3, 3, 16*Cin, 16*Cout)."""
    kh, kw, Cin, Cout = K.shape
    assert kh == 3 and kw == 3
    out = jnp.zeros((3, 3, Cin, 16, Cout, 16), K.dtype)
    for py in range(4):
        for px in range(4):
            pout = _phase4(py, px)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    fy, fx = py + dy, px + dx
                    qy, ry = fy // 4, fy % 4
                    qx, rx = fx // 4, fx % 4
                    out = out.at[qy + 1, qx + 1, :, _phase4(ry, rx), :, pout].add(
                        K[dy + 1, dx + 1])
    return out.reshape(3, 3, 16 * Cin, 16 * Cout)


def conv3x3_s2d4(x: jax.Array, K: jax.Array) -> jax.Array:
    ks = conv3x3_s2d4_kernel(K).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, ks, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv1x1_s2d4_kernel(K: jax.Array) -> jax.Array:
    """1x1 conv (1, 1, Cin, Cout) -> phase-diagonal (1, 1, 16Cin, 16Cout)."""
    _, _, Cin, Cout = K.shape
    out = jnp.zeros((1, 1, Cin, 16, Cout, 16), K.dtype)
    for p in range(16):
        out = out.at[0, 0, :, p, :, p].set(K[0, 0])
    return out.reshape(1, 1, 16 * Cin, 16 * Cout)


def upsample2x_s2d_chain_kernel(blur4, C: int) -> jax.Array:
    """upsample2x (zero-insert + 4-tap FIR, pads (2, 1)) mapping a block-2
    s2d image (B, H, W, 4C) [of the (2H, 2W, C) skip] directly to block-4
    (B, H, W, 16C) [of the (4H, 4W, C) upsampled skip]: (3, 3, 4C, 16C),
    diagonal over c.  The FIR taps land on even zero-inserted positions
    only; per output phase PY that is 2 taps spanning 3 input cells."""
    bf = np.asarray(blur4, np.float64)[::-1, ::-1]  # static FIR, jit-safe
    out = np.zeros((3, 3, C, 4, C, 16), np.float32)
    for PY in range(4):
        for PX in range(4):
            ph = _phase4(PY, PX)
            for ty in range(4):
                oy = PY - 2 + ty
                if oy % 2:
                    continue
                gy = oy // 2
                wy, ry = (gy - (gy % 2)) // 2 + 1, gy % 2
                for tx in range(4):
                    ox = PX - 2 + tx
                    if ox % 2:
                        continue
                    gx = ox // 2
                    wx, rx = (gx - (gx % 2)) // 2 + 1, gx % 2
                    for c in range(C):
                        out[wy, wx, c, _phase(ry, rx), c, ph] += bf[ty, tx]
    return jnp.asarray(out.reshape(3, 3, 4 * C, 16 * C))


def upsample2x_s2d_chain(x2: jax.Array, blur4) -> jax.Array:
    """Block-2 s2d skip (B, H, W, 4C) -> block-4 of upsample2x: (B, H, W, 16C)."""
    k = upsample2x_s2d_chain_kernel(blur4, x2.shape[-1] // 4).astype(x2.dtype)
    return jax.lax.conv_general_dilated(
        x2, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def repeat16(v: jax.Array) -> jax.Array:
    """Per-channel vector (..., C) -> (..., 16C) matching layout c*16 + ph."""
    return jnp.repeat(v, 16, axis=-1)


def noise_to_s2d4(noise: jax.Array) -> jax.Array:
    """(B, 4H, 4W, 1) full-res noise -> (B, H, W, 16) phase planes."""
    return space_to_depth4(noise)
