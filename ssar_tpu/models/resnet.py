"""ResNet-50 trunk (eval mode) — the SwAV/Inception-class OOD extractor.

The reference's FID/KID/PRDC numbers come from maua's SwAV extractor
(ssar/ood.py:100-206), whose trunk is a torchvision-layout ResNet-50.
This is that trunk natively in jnp (inference only, frozen running stats,
NHWC, fp32 matmul precision), producing the 2048-d global-average-pooled
features the OOD metrics consume.  Convert torchvision/SwAV checkpoints
offline with ``python -m ssar_tpu.models.convert_extractors ckpt.pt out.npz
--arch resnet50`` and pass ``swav_extractor(load_converted(...))`` to
``metrics.ood.compute``.

Param tree layout (matching the converter):
  {"stem": {"kernel"}, "bn1": {scale, bias, mean, var},
   "layer{1..4}": {"0": {"conv{1..3}": {...}, "bn{1..3}": {...},
                         "downsample": {...}?, "downsample_bn": {...}?}, ...}}
  (blocks keyed by string index so the tree flattens to .npz losslessly)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST

# bottleneck counts for ResNet-50
BLOCKS = (3, 4, 6, 3)
WIDTHS = (64, 128, 256, 512)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _conv(x, kernel, stride=1, padding=None):
    # torch-style symmetric padding k//2 (NOT XLA "SAME": with stride 2 on
    # even inputs SAME pads asymmetrically and shifts the sampling grid)
    if padding is None:
        k = kernel.shape[0]
        padding = [(k // 2, k // 2)] * 2
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=HIGHEST)


def _bn(x, p, eps=1e-5):
    inv = p["scale"] / jnp.sqrt(p["var"] + eps)
    return x * inv + (p["bias"] - p["mean"] * inv)


def _bottleneck(x, bp, stride):
    h = jax.nn.relu(_bn(_conv(x, bp["conv1"]["kernel"]), bp["bn1"]))
    h = jax.nn.relu(_bn(_conv(h, bp["conv2"]["kernel"], stride=stride), bp["bn2"]))
    h = _bn(_conv(h, bp["conv3"]["kernel"]), bp["bn3"])
    if "downsample" in bp:
        x = _bn(_conv(x, bp["downsample"]["kernel"], stride=stride), bp["downsample_bn"])
    return jax.nn.relu(h + x)


@jax.jit
def resnet50_features(params: dict, images: jax.Array) -> jax.Array:
    """(N, H, W, 3) in [0, 1] -> (N, 2048) pooled trunk features."""
    x = (images - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    # stem: 7x7/2 conv (torch pads 3), bn, relu, 3x3/2 maxpool (pad 1)
    x = _conv(x, params["stem"]["kernel"], stride=2, padding=[(3, 3), (3, 3)])
    x = jax.nn.relu(_bn(x, params["bn1"]))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")

    for li in range(4):
        blocks = params[f"layer{li + 1}"]
        for bi in range(BLOCKS[li]):
            stride = 2 if (bi == 0 and li > 0) else 1
            x = _bottleneck(x, blocks[str(bi)], stride)
    return jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)


def swav_extractor(params: dict, resize_to: int = 224, batch_size: int = 32):
    """Extractor callable for metrics.ood.compute: resizes to 224, runs the
    trunk in minibatches."""

    def extract(images):
        images = jnp.asarray(images, jnp.float32)
        if images.shape[1] != resize_to or images.shape[2] != resize_to:
            images = jax.image.resize(
                images, (images.shape[0], resize_to, resize_to, images.shape[3]), "bilinear")
        outs = []
        for i in range(0, images.shape[0], batch_size):
            outs.append(resnet50_features(params, images[i : i + batch_size]))
        return jnp.concatenate(outs, axis=0)

    return extract


def init_random_params(key=None, dtype=np.float32) -> dict:
    """Randomly-initialised ResNet-50 tree (shape contract / tests)."""
    rng = np.random.RandomState(0)

    def conv(ci, co, k):
        return {"kernel": (rng.randn(k, k, ci, co) * np.sqrt(2.0 / (k * k * ci))).astype(dtype)}

    def bn(c):
        return {"scale": np.ones(c, dtype), "bias": np.zeros(c, dtype),
                "mean": np.zeros(c, dtype), "var": np.ones(c, dtype)}

    params = {"stem": conv(3, 64, 7), "bn1": bn(64)}
    cin = 64
    for li, (n, w) in enumerate(zip(BLOCKS, WIDTHS)):
        blocks = {}
        for bi in range(n):
            bp = {"conv1": conv(cin if bi == 0 else w * 4, w, 1), "bn1": bn(w),
                  "conv2": conv(w, w, 3), "bn2": bn(w),
                  "conv3": conv(w, w * 4, 1), "bn3": bn(w * 4)}
            if bi == 0:
                bp["downsample"] = conv(cin, w * 4, 1)
                bp["downsample_bn"] = bn(w * 4)
            blocks[str(bi)] = bp
        cin = w * 4
        params[f"layer{li + 1}"] = blocks
    return params
