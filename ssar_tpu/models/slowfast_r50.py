"""SlowFast R50 (Kinetics SLOWFAST_8x8_R50) natively in jnp.

The reference's video embeddings come from facebookresearch/SlowFast's
SLOWFAST_8x8_R50 via the acav100m wrapper (ssar/models/slowfast.py:50-366):
a two-pathway 3-D ResNet-50 — a Slow pathway over every alpha-th frame and
a low-channel Fast pathway over all frames — with Fast->Slow lateral
fusions after the stem and stages 2-4, and a per-layer feature extractor
(LayerSlowFast, slowfast.py:145-189) that spatially pools each stage's two
pathways, nearest-interpolates the slow stream to the fast frame rate, and
concatenates channels -> five (B, T, C) feature levels of dims
[88, 352, 704, 1408, 2304].

This is that architecture as a functional params-dict model in the style
of models/resnet.py: channels-last (B, T, H, W, C), frozen-stats BN,
HIGHEST conv precision, fully shape-driven so a tiny test config runs the
same code as the 8x8 R50.  Convert facebook-slowfast state_dicts offline::

    python -m ssar_tpu.models.convert_extractors ckpt.pyth out.npz --arch slowfast_r50
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST

KINETICS_MEAN = np.array([0.45, 0.45, 0.45], np.float32)
KINETICS_STD = np.array([0.225, 0.225, 0.225], np.float32)


@dataclass(frozen=True)
class SlowFastConfig:
    """SLOWFAST_8x8_R50 defaults (facebook-slowfast Kinetics/c2 yaml)."""

    alpha: int = 4                  # fast/slow frame-rate ratio
    beta_inv: int = 8               # slow/fast channel ratio
    width: int = 64                 # slow stem width
    depths: tuple = (3, 4, 6, 3)    # bottlenecks per stage (R50)
    fusion_kernel: int = 7          # FuseFastToSlow temporal kernel
    fusion_ratio: int = 2           # fuse output = fast_ch * ratio
    # temporal kernel of each stage's 1x1x1 "a" conv, per pathway
    temp_kernels_slow: tuple = (1, 1, 3, 3)
    temp_kernels_fast: tuple = (3, 3, 3, 3)
    spatial_strides: tuple = (1, 2, 2, 2)

    @property
    def fast_width(self) -> int:
        return self.width // self.beta_inv

    def stage_dims(self, pathway: int) -> list[tuple[int, int]]:
        """Per-stage (dim_inner, dim_out)."""
        base = self.width if pathway == 0 else self.fast_width
        return [(base * 2**i, base * 4 * 2**i) for i in range(len(self.depths))]


def _conv3(x, kernel, stride=(1, 1, 1), padding=None):
    if padding is None:
        kt, kh, kw = kernel.shape[:3]
        padding = [(kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    return jax.lax.conv_general_dilated(
        x, kernel, stride, padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), precision=HIGHEST)


def _bn(x, p, eps=1e-5):
    inv = p["scale"] / jnp.sqrt(p["var"] + eps)
    return x * inv + (p["bias"] - p["mean"] * inv)


def _stem(x, p, temporal_kernel):
    kt = temporal_kernel
    h = _conv3(x, p["conv"], stride=(1, 2, 2),
               padding=[(kt // 2, kt // 2), (3, 3), (3, 3)])
    h = jax.nn.relu(_bn(h, p["bn"]))
    # maxpool (1, 3, 3) stride (1, 2, 2) pad (0, 1, 1)
    h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    return jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                 (1, 1, 3, 3, 1), (1, 1, 2, 2, 1), "VALID")


def _fuse(slow, fast, p, alpha):
    """FuseFastToSlow: temporal conv of the fast stream down to the slow
    frame rate, concatenated onto the slow channels."""
    kt = p["conv"].shape[0]
    f = _conv3(fast, p["conv"], stride=(alpha, 1, 1),
               padding=[(kt // 2, kt // 2), (0, 0), (0, 0)])
    f = jax.nn.relu(_bn(f, p["bn"]))
    return jnp.concatenate([slow, f], axis=-1)


def _bottleneck(x, p, spatial_stride):
    """ResBlock with BottleneckTransform (temporal 1x1, spatial 3x3 carrying
    the stride — facebook-slowfast STRIDE_1X1=False — then 1x1)."""
    s = (1, spatial_stride, spatial_stride)
    if "branch1" in p:
        sc = _bn(_conv3(x, p["branch1"]["conv"], stride=s), p["branch1"]["bn"])
    else:
        sc = x
    h = jax.nn.relu(_bn(_conv3(x, p["a"]["conv"]), p["a"]["bn"]))
    h = jax.nn.relu(_bn(_conv3(h, p["b"]["conv"], stride=s), p["b"]["bn"]))
    h = _bn(_conv3(h, p["c"]["conv"]), p["c"]["bn"])
    return jax.nn.relu(h + sc)


def _nearest_time(x, T):
    """torch F.interpolate(mode='nearest') along the frame axis of (B,T,C)."""
    idx = jnp.floor(jnp.arange(T) * (x.shape[1] / T)).astype(jnp.int32)
    return jnp.take(x, jnp.clip(idx, 0, x.shape[1] - 1), axis=1)


def _layer_feature(slow, fast):
    """LayerSlowFast.get_pool (slowfast.py:166-174): spatial mean, slow
    nearest-upsampled to the fast frame count, channel concat -> (B, T, C)."""
    s = jnp.mean(slow, axis=(2, 3))  # (B, T_s, C_s)
    f = jnp.mean(fast, axis=(2, 3))  # (B, T_f, C_f)
    return jnp.concatenate([_nearest_time(s, f.shape[1]), f], axis=-1)


def slowfast_features(params: dict, slow: jax.Array, fast: jax.Array,
                      config: SlowFastConfig = SlowFastConfig()) -> list[jax.Array]:
    """(B, T/alpha, H, W, 3) slow + (B, T, H, W, 3) fast (normalized) ->
    five per-stage (B, T, C) features, dims [88, 352, 704, 1408, 2304]
    for the 8x8 R50 (LayerSlowFast._forward, slowfast.py:103-137)."""
    cfg = config
    s = _stem(slow, params["stem"]["0"], 1)
    f = _stem(fast, params["stem"]["1"], params["stem"]["1"]["conv"].shape[0])
    s = _fuse(s, f, params["fuse"]["0"], cfg.alpha)
    feats = [_layer_feature(s, f)]

    for stage in range(len(cfg.depths)):
        stride = cfg.spatial_strides[stage]
        for path, x in ((0, s), (1, f)):
            blocks = params["stages"][str(stage)][str(path)]
            for j in range(len(blocks)):
                x = _bottleneck(x, blocks[str(j)], stride if j == 0 else 1)
            if path == 0:
                s = x
            else:
                f = x
        if stage < len(cfg.depths) - 1:
            s = _fuse(s, f, params["fuse"][str(stage + 1)], cfg.alpha)
        feats.append(_layer_feature(s, f))
    return feats


def slowfast_embed(params: dict, slow: jax.Array, fast: jax.Array,
                   config: SlowFastConfig = SlowFastConfig()) -> jax.Array:
    """(B, 2304) clip embedding: the head's per-pathway global average pool
    + channel concat (SlowFast._forward, slowfast.py:109-133)."""
    feats = slowfast_features(params, slow, fast, config)
    return jnp.mean(feats[-1], axis=1)


# ------------------------------------------------------------- extractor --
class SlowFastR50Extractor:
    """Video (T, H, W, 3) or (T, 3, H, W) in [0, 1] -> per-layer feature
    sequences, the LayerSlowFast surface (slowfast.py:66-82): clips of
    ``clip_len`` frames, kinetics normalization, five (T', C) outputs."""

    def __init__(self, params=None, config: SlowFastConfig = SlowFastConfig(),
                 clip_len: int = 32, seed: int = 0):
        self.config = config
        self.clip_len = clip_len
        self.params = params if params is not None else init_random_params(seed, config)
        self.params = jax.device_put(self.params)
        self._fwd = jax.jit(lambda p, s, f: slowfast_features(p, s, f, self.config))

    def __call__(self, video) -> list[jax.Array]:
        video = jnp.asarray(video, jnp.float32)
        if video.ndim == 4 and video.shape[1] == 3:
            video = jnp.transpose(video, (0, 2, 3, 1))
        video = (video - jnp.asarray(KINETICS_MEAN)) / jnp.asarray(KINETICS_STD)
        n = max(1, video.shape[0] // self.clip_len)
        clips = video[: n * self.clip_len]
        if clips.shape[0] < self.clip_len:  # short video: pad by repetition
            reps = -(-self.clip_len // clips.shape[0])
            clips = jnp.tile(clips, (reps, 1, 1, 1))[: self.clip_len]
            n = 1
        clips = clips.reshape(n, self.clip_len, *clips.shape[1:])
        feats = self._fwd(self.params, clips[:, :: self.config.alpha], clips)
        # (n_clips, T, C) -> (n_clips * T, C) per layer, matching the
        # reference's torch.cat over chunks (slowfast.py:80)
        return [x.reshape(-1, x.shape[-1]) for x in feats]


# ----------------------------------------------------------------- init --
def init_random_params(seed: int = 0, config: SlowFastConfig = SlowFastConfig(),
                       dtype=np.float32) -> dict:
    rng = np.random.RandomState(seed)
    cfg = config

    def conv(ci, co, kt, ks):
        fan = kt * ks * ks * ci
        return (rng.randn(kt, ks, ks, ci, co) * (2.0 / fan) ** 0.5).astype(dtype)

    def bn(c):
        return {"scale": np.ones(c, dtype), "bias": np.zeros(c, dtype),
                "mean": np.zeros(c, dtype), "var": np.ones(c, dtype)}

    fast_w = cfg.fast_width
    fuse_out = lambda c: c * cfg.fusion_ratio  # noqa: E731
    params = {"stem": {"0": {"conv": conv(3, cfg.width, 1, 7), "bn": bn(cfg.width)},
                       "1": {"conv": conv(3, fast_w, 5, 7), "bn": bn(fast_w)}}}

    slow_dims, fast_dims = cfg.stage_dims(0), cfg.stage_dims(1)
    fuse, stages = {}, {}
    f_in = fast_w
    s_in = cfg.width + fuse_out(fast_w)
    fuse["0"] = {"conv": conv(fast_w, fuse_out(fast_w), cfg.fusion_kernel, 1),
            "bn": bn(fuse_out(fast_w))}
    for stage in range(len(cfg.depths)):
        per_path = {}
        for path in range(2):
            inner, out = (slow_dims if path == 0 else fast_dims)[stage]
            cin = s_in if path == 0 else f_in
            tk = (cfg.temp_kernels_slow if path == 0 else cfg.temp_kernels_fast)[stage]
            blocks = {}
            for j in range(cfg.depths[stage]):
                ci = cin if j == 0 else out
                b = {"a": {"conv": conv(ci, inner, tk, 1), "bn": bn(inner)},
                     "b": {"conv": conv(inner, inner, 1, 3), "bn": bn(inner)},
                     "c": {"conv": conv(inner, out, 1, 1), "bn": bn(out)}}
                if j == 0 and (ci != out or cfg.spatial_strides[stage] > 1):
                    b["branch1"] = {"conv": conv(ci, out, 1, 1), "bn": bn(out)}
                blocks[str(j)] = b
            per_path[str(path)] = blocks
            if path == 0:
                s_in = out
            else:
                f_in = out
        stages[str(stage)] = per_path
        if stage < len(cfg.depths) - 1:
            fuse[str(stage + 1)] = {"conv": conv(f_in, fuse_out(f_in), cfg.fusion_kernel, 1),
                                    "bn": bn(fuse_out(f_in))}
            s_in = s_in + fuse_out(f_in)
    params["fuse"] = fuse
    params["stages"] = stages
    return params
