"""StyleGAN2 generator — functional JAX, NHWC, MXU-shaped modulated convs.

Re-provides the synthesis capability the reference delegates to maua /
rosinality (ssar/models/stylegan2.py, SURVEY.md §2.9) with a TPU-first
design rather than a translation:

- **Modulate-input / demodulate-output**: the reference builds per-sample
  weights and runs a grouped conv with groups=B (stylegan2.py:253-345) —
  hostile to the MXU.  Because conv is linear, ``conv(x * s, W) * d`` is
  mathematically identical (demodulation is a per-(batch, out-channel)
  scalar), so we run ONE dense batched conv and fold style/demod into
  cheap elementwise pre/post-scales that XLA fuses.
- **NHWC + bf16**: activations in bf16, demod accumulation in f32,
  params stored f32.
- **upfirdn2d / fused_bias_act** ride ssar_tpu.ops.upfirdn (XLA-fused).

Weight tensors are stored in torch-free layout (kh, kw, in, out); the
rosinality checkpoint converter lives in ssar_tpu/gan/convert.py.

Layer structure follows the StyleGAN2 paper/rosinality topology so that
converted checkpoints reproduce reference imagery: const 4x4 input,
one 3x3 styled conv at 4x4, then per doubled resolution [up-conv, conv,
to_rgb with skip], noise injection per styled conv.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.upfirdn import fused_leaky_relu, make_blur_kernel, upfirdn2d, upsample2x

HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class StyleGAN2Config:
    resolution: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: tuple = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    # optional width cap (lane-friendly multiples of 128 recommended): the
    # in-environment calibration G (scripts/train_calibration_g.py) trains a
    # narrowed generator so its checkpoint-of-record is committable; 512
    # reproduces the reference channel table exactly
    max_channels: int = 512

    @property
    def log_size(self) -> int:
        return int(np.log2(self.resolution))

    @property
    def n_latent(self) -> int:
        """Number of W+ rows (18 for 1024px)."""
        return self.log_size * 2 - 2

    @property
    def num_layers(self) -> int:
        """Number of noise inputs (17 for 1024px)."""
        return (self.log_size - 2) * 2 + 1

    def channels(self) -> dict[int, int]:
        cm = self.channel_multiplier
        full = {
            4: 512, 8: 512, 16: 512, 32: 512,
            64: 256 * cm, 128: 128 * cm, 256: 64 * cm, 512: 32 * cm, 1024: 16 * cm,
        }
        return {k: min(v, self.max_channels) for k, v in full.items()}

    def noise_shapes(self) -> list[tuple[int, int]]:
        shapes = [(4, 4)]
        for i in range(3, self.log_size + 1):
            shapes += [(2**i, 2**i)] * 2
        return shapes


# ------------------------------------------------------------------ init --
def init_generator(key: jax.Array, config: StyleGAN2Config) -> dict:
    """Random init matching StyleGAN2 distributions (N(0,1) raw weights +
    runtime equalized-lr scaling)."""
    chans = config.channels()
    keys = iter(jax.random.split(key, 256))

    def linear(in_f, out_f, bias_init=0.0, lr_mul=1.0):
        # equalized-lr: raw weight ~ N(0, 1/lr_mul^2); runtime scale
        # (1/sqrt(in)) * lr_mul restores unit-variance activations
        return {
            "weight": jax.random.normal(next(keys), (in_f, out_f), jnp.float32) / lr_mul,
            "bias": jnp.full((out_f,), bias_init, jnp.float32),
        }

    def styled_conv(in_ch, out_ch, k):
        return {
            "weight": jax.random.normal(next(keys), (k, k, in_ch, out_ch), jnp.float32),
            "mod": linear(config.style_dim, in_ch, bias_init=1.0),
            "noise_weight": jnp.zeros((), jnp.float32),
            "bias": jnp.zeros((out_ch,), jnp.float32),
        }

    def to_rgb(in_ch):
        return {
            "weight": jax.random.normal(next(keys), (1, 1, in_ch, 3), jnp.float32),
            "mod": linear(config.style_dim, in_ch, bias_init=1.0),
            "bias": jnp.zeros((3,), jnp.float32),
        }

    params: dict[str, Any] = {
        "mapping": [linear(config.style_dim, config.style_dim, lr_mul=config.lr_mlp)
                    for _ in range(config.n_mlp)],
        "const": jax.random.normal(next(keys), (4, 4, chans[4]), jnp.float32),
        "conv1": styled_conv(chans[4], chans[4], 3),
        "to_rgb1": to_rgb(chans[4]),
        "convs": [],
        "to_rgbs": [],
        "w_avg": jnp.zeros((config.style_dim,), jnp.float32),
    }
    in_ch = chans[4]
    for i in range(3, config.log_size + 1):
        out_ch = chans[2**i]
        params["convs"].append(styled_conv(in_ch, out_ch, 3))   # up-conv
        params["convs"].append(styled_conv(out_ch, out_ch, 3))  # regular conv
        params["to_rgbs"].append(to_rgb(out_ch))
        in_ch = out_ch
    return params


# --------------------------------------------------------------- mapping --
def equal_linear(p: dict, x: jax.Array, lr_mul: float = 1.0, activation: bool = False) -> jax.Array:
    in_f = p["weight"].shape[0]
    scale = (1.0 / np.sqrt(in_f)) * lr_mul
    out = jnp.matmul(x, p["weight"] * scale, precision=HIGHEST)
    if activation:
        return fused_leaky_relu(out, p["bias"] * lr_mul)
    return out + p["bias"] * lr_mul


def pixel_norm(x: jax.Array) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + 1e-8)


def mapping(params: dict, z: jax.Array, config: StyleGAN2Config) -> jax.Array:
    """z (B, 512) -> w (B, 512)."""
    x = pixel_norm(z)
    for layer in params["mapping"]:
        x = equal_linear(layer, x, lr_mul=config.lr_mlp, activation=True)
    return x


def w_to_wplus(w: jax.Array, config: StyleGAN2Config) -> jax.Array:
    return jnp.repeat(w[:, None, :], config.n_latent, axis=1)


# ------------------------------------------------------------- synthesis --
def _modulated_conv(p: dict, x: jax.Array, w: jax.Array, *, up: bool = False,
                    demodulate: bool = True, blur_kernel=(1, 3, 3, 1),
                    dtype=jnp.float32, prep: dict | None = None) -> jax.Array:
    """Styled conv via input-modulation / output-demodulation.

    x: (B, H, W, Cin) NHWC; w: (B, style_dim).  Equivalent to the reference's
    per-sample-weight grouped conv (ssar/models/stylegan2.py:253-345) but as
    one dense conv: style scales the input channels, demod rescales output
    channels; both are rank-1 w.r.t. the conv and commute with it.

    `prep` (from :func:`prepare_synthesis`) supplies the pre-scaled/cast
    kernel and the demod Gram `w2` so no weight-derived tensor is computed
    in the hot program.
    """
    weight = p["weight"]  # (kh, kw, in, out) raw
    kh, kw, cin, cout = weight.shape
    wscale = 1.0 / np.sqrt(cin * kh * kw)

    style = equal_linear(p["mod"], w)  # (B, cin)

    if demodulate:
        # demod_bo = rsqrt(sum_{i,k} (scale * W_{k i o} * s_{b i})^2 + eps) — f32
        if prep is not None:
            w2 = prep["w2"]
        else:
            w2 = (weight.astype(jnp.float32) * wscale) ** 2  # (kh,kw,cin,cout)
            w2 = jnp.sum(w2, axis=(0, 1))  # (cin, cout)
        demod = jax.lax.rsqrt(jnp.matmul(style.astype(jnp.float32) ** 2, w2, precision=HIGHEST) + 1e-8)

    # cast style DOWN to the compute dtype before the multiply: x is bf16
    # coming off the previous level, and bf16 * f32 promotes — XLA then
    # materialises the full-res activation in f32 (2x the HBM traffic of the
    # level) before converting back.  Style rounding to bf16 is imperceptible
    # (demod still accumulates in f32).
    xs = x.astype(dtype) * style[:, None, None, :].astype(dtype)

    if up:
        # transposed conv stride 2 (torch semantics) + blur, as in the reference;
        # transpose_kernel expects the kernel with (out, in) channel order
        kernel_t = prep["kernel"] if prep is not None else (weight * wscale).astype(dtype).swapaxes(2, 3)
        out = jax.lax.conv_transpose(
            xs, kernel_t.astype(dtype), strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        )
        k = make_blur_kernel(blur_kernel) * 4.0
        p_ = (len(blur_kernel) - 2) - (kh - 1)
        pad0 = (p_ + 1) // 2 + 1
        pad1 = p_ // 2 + 1
        out = upfirdn2d(out, jnp.asarray(k, dtype), pad=(pad0, pad1))
    else:
        kernel = prep["kernel"] if prep is not None else (weight * wscale).astype(dtype)
        out = jax.lax.conv_general_dilated(
            xs, kernel.astype(dtype), window_strides=(1, 1), padding=((kh // 2,) * 2, (kw // 2,) * 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    if demodulate:
        out = out * demod[:, None, None, :].astype(out.dtype)
    return out


def styled_conv(p: dict, x: jax.Array, w: jax.Array, noise: jax.Array | None, *,
                up: bool = False, blur_kernel=(1, 3, 3, 1), dtype=jnp.float32,
                prep: dict | None = None) -> jax.Array:
    out = _modulated_conv(p, x, w, up=up, demodulate=True, blur_kernel=blur_kernel,
                          dtype=dtype, prep=prep)
    if noise is not None:
        out = out + p["noise_weight"].astype(out.dtype) * noise.astype(out.dtype)
    return fused_leaky_relu(out, p["bias"].astype(out.dtype))


def to_rgb(p: dict, x: jax.Array, w: jax.Array, skip: jax.Array | None = None,
           dtype=jnp.float32, prep: dict | None = None) -> jax.Array:
    out = _modulated_conv(p, x, w, demodulate=False, dtype=dtype, prep=prep) + p["bias"].astype(dtype)
    if skip is not None:
        out = out + upsample2x(skip)
    return out


def _style_demod(p: dict, w: jax.Array, demodulate: bool = True, prep: dict | None = None):
    """(style (B, cin), demod (B, cout) | None, scaled kernel fn inputs).

    With `prep`, the demod Gram comes precomputed and the returned kernel is
    None (callers then use prep's composed kernels directly)."""
    weight = p["weight"]
    kh, kw, cin, cout = weight.shape
    wscale = 1.0 / np.sqrt(cin * kh * kw)
    style = equal_linear(p["mod"], w)
    demod = None
    if demodulate:
        if prep is not None:
            w2 = prep["w2"]
        else:
            w2 = jnp.sum((weight.astype(jnp.float32) * wscale) ** 2, axis=(0, 1))
        demod = jax.lax.rsqrt(
            jnp.matmul(style.astype(jnp.float32) ** 2, w2, precision=HIGHEST) + 1e-8)
    return style, demod, (None if prep is not None else weight * wscale)


def _final_level_s2d(pu: dict, pc: dict, pr: dict, x: jax.Array, wu, wc, wr,
                     nu, nc, skip: jax.Array, blur_kernel, dtype,
                     prep: dict | None = None) -> jax.Array:
    """One whole resolution level (up-conv, conv, to_rgb + skip) computed in
    space-to-depth form (gan/s2d.py): activations stay (B, H/2, W/2, 4C) so
    the low channel counts at high resolution don't lane-pad every pass.
    Numerically equal to the full-resolution formulation (tests/test_gan.py).
    Returns the new full-resolution skip image.

    `prep` = prepare_synthesis(...)["final"][res]: the composed s2d kernels
    (keff/k3/k1) and demod Grams, so the hot program contains no kernel
    composition (on-device composition measured ~90 ms/step at 1024 px)."""
    from .s2d import (conv1x1_s2d_kernel, conv3x3_s2d, depth_to_space, noise_to_s2d,
                      repeat4, upconv_blur_s2d, upsample2x_s2d)

    blur = make_blur_kernel(blur_kernel) * 4.0  # numpy: stays a jit constant
    pre_u = prep["up"] if prep is not None else None
    pre_c = prep["conv"] if prep is not None else None
    pre_r = prep["rgb"] if prep is not None else None

    def mul_c4(h, vec):
        """h (B, H, W, 4C) [layout c*4 + phase] * per-channel vec (B, C).

        Expressed as a 5-D (C, 4)-view broadcast multiply rather than
        ``h * repeat4(vec)[:, None, None, :]``: jnp.repeat is
        broadcast+reshape, which XLA cannot fuse into a consuming conv
        fusion — it materialised the (B, H, W, 4C) broadcast and relayout-
        copied it (2 x 19 ms/step at 1024 px measured).  A plain broadcast
        over the minor split dims fuses for free."""
        B_, H_, W_, C4 = h.shape
        h5 = h.reshape(B_, H_, W_, C4 // 4, 4)
        return (h5 * vec[:, None, None, :, None].astype(h.dtype)).reshape(h.shape)

    def add_noise_c4(h, n4, weight):
        """h (B, H, W, 4C) + weight * n4 (B, H, W, 4) broadcast over c.

        The barrier materialises n4 itself (H*W*4, small) so the broadcast
        over c happens INSIDE the consuming fusion; without it XLA
        materialises the full (B, H, W, 4C) broadcast and relayout-copies
        it (19 ms/step each at 1024 px measured)."""
        n4 = jax.lax.optimization_barrier(n4)
        B_, H_, W_, C4 = h.shape
        h5 = h.reshape(B_, H_, W_, C4 // 4, 4)
        h5 = h5 + weight.astype(h.dtype) * n4[:, :, :, None, :]
        return h5.reshape(h.shape)

    # up conv (modulated)
    style, demod, kernel = _style_demod(pu, wu, prep=pre_u)
    # style cast down BEFORE the multiply — see the note in _modulated_conv
    # (bf16 * f32 promotes and materialises a full-res f32 temp)
    xs = x.astype(dtype) * style[:, None, None, :].astype(dtype)
    h = upconv_blur_s2d(xs, None if kernel is None else kernel.astype(dtype), blur,
                        keff=None if pre_u is None else pre_u["keff"])
    h = mul_c4(h, demod)
    if nu is not None:
        h = add_noise_c4(h, noise_to_s2d(nu.astype(h.dtype)), pu["noise_weight"])
    h = fused_leaky_relu(h, repeat4(pu["bias"]).astype(h.dtype))

    # regular conv (modulated)
    style2, demod2, kernel2 = _style_demod(pc, wc, prep=pre_c)
    xs2 = mul_c4(h, style2)
    h = conv3x3_s2d(xs2, None if kernel2 is None else kernel2.astype(dtype),
                    ks=None if pre_c is None else pre_c["k3"])
    h = mul_c4(h, demod2)
    if nc is not None:
        h = add_noise_c4(h, noise_to_s2d(nc.astype(h.dtype)), pc["noise_weight"])
    h = fused_leaky_relu(h, repeat4(pc["bias"]).astype(h.dtype))

    # to_rgb (no demod) + upsampled skip, still in s2d
    style3, _, kernel3 = _style_demod(pr, wr, demodulate=False, prep=pre_r)
    xs3 = mul_c4(h, style3)
    k1 = pre_r["k1"] if pre_r is not None else conv1x1_s2d_kernel(kernel3.astype(dtype))
    rgb = jax.lax.conv_general_dilated(xs3, k1.astype(dtype), (1, 1), "SAME",
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rgb = rgb + repeat4(pr["bias"]).astype(rgb.dtype)
    rgb = rgb + upsample2x_s2d(skip.astype(dtype), blur)
    return h, rgb  # both in s2d (channel = c*4 + phase)


def _final_level_s2d4(pu: dict, pc: dict, pr: dict, x2: jax.Array, wu, wc, wr,
                      nu, nc, skip2: jax.Array, blur_kernel, dtype) -> jax.Array:
    """The LAST resolution level computed entirely in block-4 space-to-depth,
    consuming the previous level's block-2 s2d activations and skip directly
    (gan/s2d.py chain builders): the full-resolution grid never materialises
    before the final 3-channel depth_to_space4.  Numerically equal to the
    full-resolution formulation (tests/test_gan.py).

    NOT used by ``synthesis``: measured SLOWER than the single-level s2d
    form at 1024 px (155 vs 209 fps end-to-end; the dense phase-mixing
    kernels multiply conv FLOPs 16x and the level is FLOP-limited, not
    lane-limited — see docs/ARCHITECTURE.md "Known optimization headroom").
    Kept because the builders are verified and the trade flips for
    configurations with even narrower channels.

    x2 (B, H, W, 4*Cin): s2d of the penultimate level's output;
    skip2 (B, H, W, 12): s2d of its RGB.  Returns block-4 RGB (B, H, W, 48).
    """
    from .s2d import (conv1x1_s2d4_kernel, conv3x3_s2d4, noise_to_s2d4, repeat4,
                      repeat16, upconv_blur_s2d_chain, upsample2x_s2d_chain)

    blur = make_blur_kernel(blur_kernel) * 4.0  # numpy: stays a jit constant

    # up conv (modulated), block-2 in -> block-4 out
    style, demod, kernel = _style_demod(pu, wu)
    xs = (x2 * repeat4(style)[:, None, None, :]).astype(dtype)
    h = upconv_blur_s2d_chain(xs, kernel.astype(dtype), blur)
    h = h * repeat16(demod)[:, None, None, :].astype(h.dtype)
    if nu is not None:
        n16 = noise_to_s2d4(nu.astype(h.dtype))  # (B, H, W, 16)
        h = h + pu["noise_weight"].astype(h.dtype) * jnp.tile(n16, (1, 1, 1, h.shape[-1] // 16))
    h = fused_leaky_relu(h, repeat16(pu["bias"]).astype(h.dtype))

    # regular conv (modulated), block-4
    style2, demod2, kernel2 = _style_demod(pc, wc)
    xs2 = h * repeat16(style2)[:, None, None, :].astype(h.dtype)
    h = conv3x3_s2d4(xs2, kernel2.astype(dtype))
    h = h * repeat16(demod2)[:, None, None, :].astype(h.dtype)
    if nc is not None:
        n16 = noise_to_s2d4(nc.astype(h.dtype))
        h = h + pc["noise_weight"].astype(h.dtype) * jnp.tile(n16, (1, 1, 1, h.shape[-1] // 16))
    h = fused_leaky_relu(h, repeat16(pc["bias"]).astype(h.dtype))

    # to_rgb (no demod) + upsampled block-2 skip, all in block-4
    style3, _, kernel3 = _style_demod(pr, wr, demodulate=False)
    xs3 = h * repeat16(style3)[:, None, None, :].astype(h.dtype)
    k1 = conv1x1_s2d4_kernel(kernel3.astype(dtype))
    rgb = jax.lax.conv_general_dilated(xs3, k1, (1, 1), "SAME",
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rgb = rgb + repeat16(pr["bias"]).astype(rgb.dtype)
    rgb = rgb + upsample2x_s2d_chain(skip2.astype(rgb.dtype), blur)
    return rgb  # block-4 (channel = c*16 + 4*py + px)


def prepare_synthesis(params: dict, config: StyleGAN2Config, dtype=jnp.float32) -> dict:
    """Precompute every weight-derived constant of the synthesis pass.

    The modulate-input/demodulate-output design makes all conv kernels
    style-independent, so scaling, casting, transposing and s2d-composing
    them is per-checkpoint work, not per-batch work.  Computing them inside
    the jitted step measured ~90 ms of a 214 ms step at 1024 px/B=64 on v5e
    (the composition lowers to a serialised chain of tiny slice/einsum
    fusions).  Returns a pytree to pass as ``synthesis(..., prep=...)``;
    rebuild it whenever `params` change (it is itself jittable).
    """
    from .s2d import conv1x1_s2d_kernel, conv3x3_s2d_kernel, upconv_blur_s2d_keff

    blur = make_blur_kernel(config.blur_kernel) * 4.0

    def conv_prep(p, up=False):
        weight = p["weight"]
        kh, kw, cin, cout = weight.shape
        wscale = 1.0 / np.sqrt(cin * kh * kw)
        scaled = weight * wscale
        w2 = jnp.sum(scaled.astype(jnp.float32) ** 2, axis=(0, 1))
        kernel = scaled.astype(dtype).swapaxes(2, 3) if up else scaled.astype(dtype)
        return {"kernel": kernel, "w2": w2, "scaled": scaled}

    def rgb_prep(p):
        weight = p["weight"]
        kh, kw, cin, cout = weight.shape
        scaled = weight * (1.0 / np.sqrt(cin * kh * kw))
        return {"kernel": scaled.astype(dtype), "scaled": scaled}

    prep = {
        "conv1": conv_prep(params["conv1"]),
        "to_rgb1": rgb_prep(params["to_rgb1"]),
        "convs": [conv_prep(p, up=(i % 2 == 0)) for i, p in enumerate(params["convs"])],
        "to_rgbs": [rgb_prep(p) for p in params["to_rgbs"]],
        "final": {},
    }
    # composed s2d kernels for every level the s2d final-level gate can take
    for level, conv in enumerate(params["convs"][1::2]):
        res = 2 ** (level + 3)
        out_ch = conv["weight"].shape[-1]
        if out_ch < 128:
            up_p = prep["convs"][2 * level]
            c_p = prep["convs"][2 * level + 1]
            r_p = prep["to_rgbs"][level]
            prep["final"][res] = {
                "up": {"w2": up_p["w2"],
                       "keff": upconv_blur_s2d_keff(up_p["scaled"], blur).astype(dtype)},
                "conv": {"w2": c_p["w2"], "k3": conv3x3_s2d_kernel(c_p["scaled"]).astype(dtype)},
                "rgb": {"k1": conv1x1_s2d_kernel(r_p["scaled"]).astype(dtype)},
            }
    # the general path consumes "kernel"/"w2" only; drop the f32 staging copies
    for entry in [prep["conv1"], prep["to_rgb1"], *prep["convs"], *prep["to_rgbs"]]:
        entry.pop("scaled", None)
    return prep


def synthesis(params: dict, latents: jax.Array, noises: list[jax.Array] | None,
              config: StyleGAN2Config, *, dtype=jnp.float32, output_size: int | None = None,
              return_features: bool = False, bends: dict | None = None,
              bend_mods: dict | None = None, prep: dict | None = None,
              s2d: bool = True):
    """W+ latents (B, n_latent, 512) [+ noises list of (B, H, W, 1)] -> images
    (B, R, R, 3) in [-1, 1] (unclamped).

    `output_size` < native resolution early-exits at the matching skip
    branch — the progressive to_rgb skips make every intermediate resolution
    a valid image (TPU-friendly way to render small previews).

    `bends` maps a feature level (0 = the 4x4 block, 1 = 8x8, ...) to a
    traceable NHWC transform applied to that level's activations before its
    to_rgb — the network-bending hook of the maua-era patches
    (ssar/patches/examples/01_intro.py:101-107, list of {"layer", "transform"}).
    A bend may change the spatial shape (e.g. replication-pad 4x4 -> 4x8 for
    widescreen renders); downstream convs are shape-polymorphic, but then the
    caller must supply matching `noises` or None.

    `bend_mods` (optional) maps a level to this batch's slice of a per-frame
    modulation array; that level's transform is then called as
    ``transform(x, mod)`` — the animated-bend idiom (tauceti's scrolling
    drop).  The arrays are traced arguments, so animating a bend does not
    re-compile per frame.
    """
    B = latents.shape[0]
    bends = bends or {}
    bend_mods = bend_mods or {}

    def apply_bend(lvl, x):
        # time-varying bends (ssar/patches/examples/tauceti.py:93-140): the
        # transform also receives this batch's slice of a per-frame
        # modulation array (scroll fractions, zoom factors, ...)
        if lvl in bend_mods:
            return bends[lvl](x, bend_mods[lvl])
        return bends[lvl](x)

    if noises is None:
        noises = [None] * config.num_layers

    feats = []
    x = jnp.broadcast_to(params["const"].astype(dtype), (B,) + params["const"].shape)
    x = styled_conv(params["conv1"], x, latents[:, 0], noises[0], dtype=dtype,
                    prep=None if prep is None else prep["conv1"])
    if 0 in bends:
        x = apply_bend(0, x)
    feats.append(x)
    skip = to_rgb(params["to_rgb1"], x, latents[:, 1], dtype=dtype,
                  prep=None if prep is None else prep["to_rgb1"])

    if output_size is not None and output_size == 4:
        return (skip.astype(jnp.float32), feats) if return_features else skip.astype(jnp.float32)

    target_res = min(output_size or config.resolution, config.resolution)
    i = 1
    for level, (conv_up, conv) in enumerate(zip(params["convs"][::2], params["convs"][1::2])):
        res = 2 ** (level + 3)
        out_ch = conv["weight"].shape[-1]
        if s2d and res == target_res and res >= 8 and out_ch < 128 and not return_features \
                and not bends:  # bends may change spatial shapes; take the plain path
            # FINAL level in space-to-depth form: low channel counts at high
            # resolution otherwise lane-pad every pass (gan/s2d.py).
            # (Chaining earlier levels through s2d measured SLOWER — the
            # depth-to-space handoff passes outweigh the savings.)
            from .s2d import depth_to_space

            _, rgb_s2d = _final_level_s2d(conv_up, conv, params["to_rgbs"][level], x,
                                          latents[:, i], latents[:, i + 1],
                                          latents[:, i + 2],
                                          noises[i], noises[i + 1], skip,
                                          config.blur_kernel, dtype,
                                          prep=None if prep is None else prep["final"][res])
            skip = depth_to_space(rgb_s2d)
            i += 2
            break
        x = styled_conv(conv_up, x, latents[:, i], noises[i], up=True, dtype=dtype,
                        prep=None if prep is None else prep["convs"][2 * level])
        x = styled_conv(conv, x, latents[:, i + 1], noises[i + 1], dtype=dtype,
                        prep=None if prep is None else prep["convs"][2 * level + 1])
        if (level + 1) in bends:
            x = apply_bend(level + 1, x)
        feats.append(x)
        skip = to_rgb(params["to_rgbs"][level], x, latents[:, i + 2], skip, dtype=dtype,
                      prep=None if prep is None else prep["to_rgbs"][level])
        i += 2
        if output_size is not None and res >= output_size:
            break
    out = skip.astype(jnp.float32)
    return (out, feats) if return_features else out


def generate(params: dict, z: jax.Array, config: StyleGAN2Config, *, truncation: float = 1.0,
             noises: list[jax.Array] | None = None, dtype=jnp.float32) -> jax.Array:
    """z (B, 512) -> images; convenience wrapper: mapping + broadcast + synthesis."""
    w = mapping(params, z, config)
    if truncation < 1.0:
        w = params["w_avg"] + truncation * (w - params["w_avg"])
    return synthesis(params, w_to_wplus(w, config), noises, config, dtype=dtype)
