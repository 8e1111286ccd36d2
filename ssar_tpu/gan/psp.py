"""pixel2style2pixel (pSp) image -> W+ inversion, native jnp.

The reference uses the full pSp model for video-inversion experiments
(ssar/models/pixel2style2pixel.py, consumed by
ssar/selfsupervised/train_stylevideogan.py:15,43): an ArcFace-style IR-SE
ResNet trunk whose three scale taps feed an FPN and per-style "map2style"
heads (GradualStyleEncoder, pixel2style2pixel.py:57-135), two single-tap
variants (BackboneEncoderUsingLastLayerIntoW / IntoWPlus, :137-194), and a
wrapper that adds the decoder's average latent and runs StyleGAN2
synthesis (pSp, :203-317).

This is that architecture as a functional params-dict model in the style
of models/resnet.py: NHWC, inference-mode BN with frozen stats, HIGHEST
conv precision (the tunneled TPU backend defaults to low matmul
precision), static shapes throughout.  Every forward derives channel
counts, style-head depth, and tap positions from the params tree itself,
so the same code runs the 50/100/152-layer trunks and the tiny
test-configured ones.

Convert torch pSp checkpoints offline::

    python -m ssar_tpu.gan.psp psp_ffhq_encode.pt out.npz

The decoder subtree reuses the rosinality converter (gan/convert.py); the
result loads with ``gan.convert.load_npz`` and runs via :func:`psp_apply`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST

# per-stage (in_channel, depth, num_units); first unit of each stage has
# stride 2 (pixel2style2pixel.py:329-357)
IR_STAGES = {
    50: ((64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)),
    100: ((64, 64, 3), (64, 128, 13), (128, 256, 30), (256, 512, 3)),
    152: ((64, 64, 3), (64, 128, 8), (128, 256, 36), (256, 512, 3)),
}


def stage_units(stages) -> list[tuple[int, int, int]]:
    """Flatten stage specs to per-unit (in_c, depth, stride)."""
    if isinstance(stages, int):
        stages = IR_STAGES[stages]
    units = []
    for in_c, depth, n in stages:
        units.append((in_c, depth, 2))
        units += [(depth, depth, 1)] * (n - 1)
    return units


def _stage_end_indices(stages) -> list[int]:
    if isinstance(stages, int):
        stages = IR_STAGES[stages]
    ends, i = [], -1
    for _, _, n in stages:
        i += n
        ends.append(i)
    return ends


# ------------------------------------------------------------------ ops --
def _conv(x, kernel, stride=1, bias=None, padding=None):
    # torch-style symmetric k//2 padding (models/resnet.py:36-45)
    if padding is None:
        k = kernel.shape[0]
        padding = [(k // 2, k // 2)] * 2
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=HIGHEST)
    return y if bias is None else y + bias


def _bn(x, p, eps=1e-5):
    inv = p["scale"] / jnp.sqrt(p["var"] + eps)
    return x * inv + (p["bias"] - p["mean"] * inv)


def _prelu(x, a):
    return jnp.maximum(x, 0.0) + a * jnp.minimum(x, 0.0)


def _se(x, p):
    """Squeeze-excite (SEModule, pixel2style2pixel.py:360-377)."""
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = jax.nn.relu(_conv(s, p["fc1"]))
    s = jax.nn.sigmoid(_conv(s, p["fc2"]))
    return x * s


def _unit(x, p, stride):
    """bottleneck_IR(_SE) (pixel2style2pixel.py:379-419).  The identity
    shortcut is MaxPool2d(kernel=1, stride) == a strided slice."""
    if "shortcut" in p:
        sc = _bn(_conv(x, p["shortcut"]["conv"], stride=stride), p["shortcut"]["bn"])
    else:
        sc = x[:, ::stride, ::stride, :]
    h = _bn(x, p["bn_in"])
    h = _prelu(_conv(h, p["conv1"]), p["prelu"])
    h = _bn(_conv(h, p["conv2"], stride=stride), p["bn_out"])
    if "se" in p:
        h = _se(h, p["se"])
    return h + sc


def _equal_linear(x, p):
    """Rosinality EqualLinear with lr_mul=1: runtime 1/sqrt(in) scaling.
    `weight` is stored (in, out)."""
    scale = 1.0 / np.sqrt(x.shape[-1])
    return x @ (p["weight"] * scale) + p["bias"]


def _resize_align_corners(x, H, W):
    """Bilinear resize with align_corners=True — the FPN upsample
    (_upsample_add, pixel2style2pixel.py:89-106).  jax.image.resize uses
    half-pixel centers, which is align_corners=False; the corner-aligned
    grid is small enough to gather directly."""
    _, h, w, _ = x.shape

    def axis(n_in, n_out):
        pos = (jnp.linspace(0.0, n_in - 1.0, n_out) if n_out > 1
               else jnp.zeros((1,)))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.minimum(lo + 1, n_in - 1)
        return lo, hi, (pos - lo).astype(x.dtype)

    y0, y1, wy = axis(h, H)
    x0, x1, wx = axis(w, W)
    rows = (jnp.take(x, y0, axis=1) * (1 - wy)[None, :, None, None]
            + jnp.take(x, y1, axis=1) * wy[None, :, None, None])
    return (jnp.take(rows, x0, axis=2) * (1 - wx)[None, None, :, None]
            + jnp.take(rows, x1, axis=2) * wx[None, None, :, None])


def adaptive_avg_pool(x, out: int):
    """torch AdaptiveAvgPool2d semantics: bin i spans
    [floor(i*n/out), ceil((i+1)*n/out)) — exact for any n, static shapes."""
    def pool_axis(h, axis):
        n = h.shape[axis]
        slabs = []
        for i in range(out):
            lo, hi = (i * n) // out, -((-(i + 1) * n) // out)
            slabs.append(jnp.mean(jax.lax.slice_in_dim(h, lo, hi, axis=axis),
                                  axis=axis, keepdims=True))
        return jnp.concatenate(slabs, axis=axis)

    return pool_axis(pool_axis(x, 1), 2)


# ------------------------------------------------------------- encoders --
def _input_and_body(params, images, stages):
    """Shared stem + IR body; returns per-stage-end feature maps."""
    p = params["input"]
    x = _prelu(_bn(_conv(images, p["conv"]), p["bn"]), p["prelu"])
    ends = set(_stage_end_indices(stages))
    taps = []
    for i, (_, _, stride) in enumerate(stage_units(stages)):
        x = _unit(x, params["body"][i], stride)
        if i in ends:
            taps.append(x)
    return taps  # [c0 (unused), c1, c2, c3] per stage


def _style_block(p, f):
    """GradualStyleBlock (pixel2style2pixel.py:37-54): stride-2 3x3 convs
    + LeakyReLU down to 1x1, then EqualLinear."""
    for c in p["convs"]:
        f = jax.nn.leaky_relu(_conv(f, c["kernel"], stride=2, bias=c["bias"]),
                              negative_slope=0.01)
    return _equal_linear(f.reshape(f.shape[0], -1), p["linear"])


def gradual_style_encoder(params: dict, images: jax.Array,
                          stages=50) -> jax.Array:
    """(B, H, W, 3) -> (B, n_styles, style_dim) W+ codes
    (GradualStyleEncoder.forward, pixel2style2pixel.py:108-134).
    Taps: the last unit of stages 2/3/4 (body indices 6/20/23 for IR-50)."""
    _, c1, c2, c3 = _input_and_body(params, images, stages)
    styles = params["styles"]
    n_styles = len(styles)
    coarse_ind, middle_ind = 3, 7

    latents = [_style_block(styles[j], c3) for j in range(min(coarse_ind, n_styles))]
    p2 = (_resize_align_corners(c3, c2.shape[1], c2.shape[2])
          + _conv(c2, params["lat1"]["kernel"], bias=params["lat1"]["bias"]))
    latents += [_style_block(styles[j], p2)
                for j in range(coarse_ind, min(middle_ind, n_styles))]
    p1 = (_resize_align_corners(p2, c1.shape[1], c1.shape[2])
          + _conv(c1, params["lat2"]["kernel"], bias=params["lat2"]["bias"]))
    latents += [_style_block(styles[j], p1) for j in range(middle_ind, n_styles)]
    return jnp.stack(latents, axis=1)


def backbone_encoder_w(params: dict, images: jax.Array, stages=50) -> jax.Array:
    """(B, H, W, 3) -> (B, style_dim) single-W variant
    (BackboneEncoderUsingLastLayerIntoW, pixel2style2pixel.py:137-163)."""
    c3 = _input_and_body(params, images, stages)[-1]
    return _equal_linear(jnp.mean(c3, axis=(1, 2)), params["linear"])


def backbone_encoder_wplus(params: dict, images: jax.Array, stages=50) -> jax.Array:
    """(B, H, W, 3) -> (B, n_styles, style_dim)
    (BackboneEncoderUsingLastLayerIntoWPlus, pixel2style2pixel.py:165-194).
    The flatten after the 7x7 adaptive pool follows torch's channels-first
    order; the converter pre-permutes the Linear accordingly, so here the
    NHWC map is flattened to (H, W, C) order."""
    c3 = _input_and_body(params, images, stages)[-1]
    h = adaptive_avg_pool(_bn(c3, params["out_bn"]), 7)
    h = h.reshape(h.shape[0], -1) @ params["out_linear"]["weight"] + params["out_linear"]["bias"]
    h = _equal_linear(h, params["linear"])
    style_dim = params["out_linear"]["bias"].shape[-1]
    return h.reshape(h.shape[0], -1, style_dim)


ENCODERS = {
    "GradualStyleEncoder": gradual_style_encoder,
    "BackboneEncoderUsingLastLayerIntoW": backbone_encoder_w,
    "BackboneEncoderUsingLastLayerIntoWPlus": backbone_encoder_wplus,
}


# ------------------------------------------------------------- pSp wrap --
def psp_apply(params: dict, images: jax.Array, config, *,
              encoder_type: str = "GradualStyleEncoder", stages=50,
              input_code: bool = False, latent_mask=None, inject_latent=None,
              alpha: float | None = None, resize: bool = True,
              noises=None, dtype=jnp.float32):
    """Full pSp forward (pSp.forward, pixel2style2pixel.py:241-285):
    encode -> + latent_avg -> optional style mixing via latent_mask ->
    StyleGAN2 synthesis -> optional 256px pool.  Returns (images, codes).

    `params` is the converter's tree: {"encoder", "decoder", "latent_avg"?}.
    `config` is the decoder's StyleGAN2Config.
    """
    from .stylegan2 import synthesis

    if input_code:
        codes = images
    else:
        codes = ENCODERS[encoder_type](params["encoder"], images, stages)
        if params.get("latent_avg") is not None:
            avg = jnp.asarray(params["latent_avg"])
            codes = codes + (avg[None] if codes.ndim == avg.ndim + 1 else avg[None, None])
    if codes.ndim == 2:  # single-W encoder -> broadcast over W+ rows
        codes = jnp.repeat(codes[:, None], config.n_latent, axis=1)

    if latent_mask is not None:
        for i in latent_mask:
            if inject_latent is not None:
                mix = (alpha * inject_latent[:, i] + (1 - alpha) * codes[:, i]
                       if alpha is not None else inject_latent[:, i])
            else:
                mix = jnp.zeros_like(codes[:, i])
            codes = codes.at[:, i].set(mix)

    frames = synthesis(params["decoder"], codes, noises, config, dtype=dtype)
    if resize and frames.shape[1] > 256:
        frames = adaptive_avg_pool(frames, 256)
    return frames, codes


def invert_frames(params: dict, frames: jax.Array, *, stages=50,
                  encoder_type: str = "GradualStyleEncoder",
                  batch_size: int = 16) -> jax.Array:
    """Video frames (T, H, W, 3) in [-1, 1] -> W+ trajectory
    (T, n_styles, 512) — the StyleVideoGAN front-end
    (ssar/selfsupervised/train_stylevideogan.py:40-52).  Chunked so long
    clips fit device memory; pads the tail chunk to keep one compile."""
    # params must be a jit ARGUMENT: closing over the weight tree would bake
    # ~100 MB of IR-SE-50 weights into the HLO as literals, which the remote
    # compiler chokes on
    encode = jax.jit(lambda p, x: ENCODERS[encoder_type](p, x, stages))
    # move the weight tree to device ONCE — a host numpy tree would be
    # re-transferred on every chunk (seconds per call over the tunneled
    # runtime for the ~100 MB IR-SE-50 tree)
    enc_params = jax.device_put(params["encoder"])
    avg = params.get("latent_avg")
    T = frames.shape[0]
    outs = []
    for s in range(0, T, batch_size):
        chunk = frames[s : s + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.repeat(chunk[-1:], pad, axis=0)])
        w = encode(enc_params, chunk)
        outs.append(w[: batch_size - pad] if pad else w)
    w = jnp.concatenate(outs)
    if avg is not None:
        w = w + jnp.asarray(avg)[None]
    return w


# ----------------------------------------------------------------- init --
def init_random_params(key=None, stages=50, n_styles: int = 18,
                       input_res: int = 256, style_dim: int = 512,
                       se: bool = True, encoder_type: str = "GradualStyleEncoder",
                       dtype=np.float32) -> dict:
    """Random encoder tree with the converter's layout (shape-contract
    testing; pretrained use goes through convert_psp)."""
    rng = np.random.RandomState(0 if key is None else int(jax.random.randint(key, (), 0, 2**31 - 1)))

    def conv(ci, co, k):
        return (rng.randn(k, k, ci, co) * (2.0 / (k * k * ci)) ** 0.5).astype(dtype)

    def bn(c):
        return {"scale": np.ones(c, dtype), "bias": np.zeros(c, dtype),
                "mean": np.zeros(c, dtype), "var": np.ones(c, dtype)}

    units = stage_units(stages)
    stem = units[0][0]
    params: dict = {"input": {"conv": conv(3, stem, 3), "bn": bn(stem),
                              "prelu": np.full(stem, 0.25, dtype)}}
    body = []
    for in_c, depth, _ in units:
        u = {"bn_in": bn(in_c), "conv1": conv(in_c, depth, 3),
             "prelu": np.full(depth, 0.25, dtype),
             "conv2": conv(depth, depth, 3), "bn_out": bn(depth)}
        if se:
            u["se"] = {"fc1": conv(depth, max(1, depth // 16), 1),
                       "fc2": conv(max(1, depth // 16), depth, 1)}
        if in_c != depth:
            u["shortcut"] = {"conv": conv(in_c, depth, 1), "bn": bn(depth)}
        body.append(u)
    params["body"] = body

    depths = [d for _, d, _ in (IR_STAGES[stages] if isinstance(stages, int) else stages)]
    c1d, c2d, c3d = depths[1], depths[2], depths[3]

    if encoder_type == "GradualStyleEncoder":
        # tap spatials: input_res / 4, / 8, / 16 (taps at stages 2/3/4)
        spatials = {"coarse": input_res // 16, "middle": input_res // 8,
                    "fine": input_res // 4}
        styles = []
        for j in range(n_styles):
            sp = (spatials["coarse"] if j < 3 else
                  spatials["middle"] if j < 7 else spatials["fine"])
            n_convs = max(1, int(np.log2(sp)))
            convs = [{"kernel": conv(c3d if i == 0 else style_dim, style_dim, 3),
                      "bias": np.zeros(style_dim, dtype)} for i in range(n_convs)]
            styles.append({"convs": convs,
                           "linear": {"weight": rng.randn(style_dim, style_dim).astype(dtype),
                                      "bias": np.zeros(style_dim, dtype)}})
        params["styles"] = styles
        params["lat1"] = {"kernel": conv(c2d, c3d, 1), "bias": np.zeros(c3d, dtype)}
        params["lat2"] = {"kernel": conv(c1d, c3d, 1), "bias": np.zeros(c3d, dtype)}
    elif encoder_type == "BackboneEncoderUsingLastLayerIntoW":
        params["linear"] = {"weight": rng.randn(c3d, style_dim).astype(dtype),
                            "bias": np.zeros(style_dim, dtype)}
    else:  # IntoWPlus
        params["out_bn"] = bn(c3d)
        params["out_linear"] = {"weight": rng.randn(49 * c3d, style_dim).astype(dtype)
                                / np.sqrt(49 * c3d),
                                "bias": np.zeros(style_dim, dtype)}
        params["linear"] = {"weight": rng.randn(style_dim, style_dim * n_styles).astype(dtype),
                            "bias": np.zeros(style_dim * n_styles, dtype)}
    return params


# ------------------------------------------------------------ converter --
def _conv2d_w(w):  # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_psp(state_dict: dict, stages=50, decoder_config=None) -> dict:
    """torch pSp checkpoint state_dict -> native params tree.

    Handles the ``encoder.`` / ``decoder.`` / ``latent_avg`` split of
    pSp.load_weights (pixel2style2pixel.py:235-239); decoder conversion is
    delegated to the rosinality mapping in gan/convert.py.
    """
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}

    def bn(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"],
                "mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}

    enc: dict = {"input": {"conv": _conv2d_w(sd["encoder.input_layer.0.weight"]),
                           "bn": bn("encoder.input_layer.1"),
                           "prelu": sd["encoder.input_layer.2.weight"]}}
    body = []
    for i, (in_c, depth, _) in enumerate(stage_units(stages)):
        pre = f"encoder.body.{i}"
        u = {"bn_in": bn(f"{pre}.res_layer.0"),
             "conv1": _conv2d_w(sd[f"{pre}.res_layer.1.weight"]),
             "prelu": sd[f"{pre}.res_layer.2.weight"],
             "conv2": _conv2d_w(sd[f"{pre}.res_layer.3.weight"]),
             "bn_out": bn(f"{pre}.res_layer.4")}
        if f"{pre}.res_layer.5.fc1.weight" in sd:
            u["se"] = {"fc1": _conv2d_w(sd[f"{pre}.res_layer.5.fc1.weight"]),
                       "fc2": _conv2d_w(sd[f"{pre}.res_layer.5.fc2.weight"])}
        if in_c != depth:
            u["shortcut"] = {"conv": _conv2d_w(sd[f"{pre}.shortcut_layer.0.weight"]),
                             "bn": bn(f"{pre}.shortcut_layer.1")}
        body.append(u)
    enc["body"] = body

    j = 0
    styles = []
    while f"encoder.styles.{j}.linear.weight" in sd:
        convs, k = [], 0
        while f"encoder.styles.{j}.convs.{k}.weight" in sd:
            convs.append({"kernel": _conv2d_w(sd[f"encoder.styles.{j}.convs.{k}.weight"]),
                          "bias": sd[f"encoder.styles.{j}.convs.{k}.bias"]})
            k += 2  # Sequential interleaves LeakyReLU at odd indices
        styles.append({"convs": convs,
                       "linear": {"weight": sd[f"encoder.styles.{j}.linear.weight"].T,
                                  "bias": sd[f"encoder.styles.{j}.linear.bias"]}})
        j += 1
    if styles:
        enc["styles"] = styles
        enc["lat1"] = {"kernel": _conv2d_w(sd["encoder.latlayer1.weight"]),
                       "bias": sd["encoder.latlayer1.bias"]}
        enc["lat2"] = {"kernel": _conv2d_w(sd["encoder.latlayer2.weight"]),
                       "bias": sd["encoder.latlayer2.bias"]}
    if "encoder.linear.weight" in sd:
        enc["linear"] = {"weight": sd["encoder.linear.weight"].T,
                         "bias": sd["encoder.linear.bias"]}
    if "encoder.output_layer_2.0.weight" in sd:
        enc["out_bn"] = bn("encoder.output_layer_2.0")
        c3d = enc["out_bn"]["scale"].shape[0]
        # torch flattens NCHW (C,7,7); our NHWC flatten is (7,7,C)
        w = sd["encoder.output_layer_2.3.weight"].reshape(-1, c3d, 7, 7)
        w = np.transpose(w, (0, 2, 3, 1)).reshape(w.shape[0], 7 * 7 * c3d).T
        enc["out_linear"] = {"weight": w, "bias": sd["encoder.output_layer_2.3.bias"]}

    out: dict = {"encoder": enc}
    if "latent_avg" in sd:
        out["latent_avg"] = sd["latent_avg"]
    dec_sd = {k[len("decoder."):]: v for k, v in sd.items() if k.startswith("decoder.")}
    if dec_sd and decoder_config is not None:
        from .convert import convert_rosinality_sd

        out["decoder"] = convert_rosinality_sd(dec_sd, decoder_config)
    return out


if __name__ == "__main__":
    import sys

    import torch

    from .convert import save_npz
    from .stylegan2 import StyleGAN2Config

    src, dst = sys.argv[1], sys.argv[2]
    output_size = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    if "latent_avg" in ckpt:
        sd = dict(sd, latent_avg=ckpt["latent_avg"])
    params = convert_psp(sd, decoder_config=StyleGAN2Config(resolution=output_size))
    save_npz(dst, params)
    print(f"wrote {dst}")
