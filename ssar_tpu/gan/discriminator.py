"""StyleGAN2 discriminator + pSp-style W+ encoder (image -> latent).

Equivalents of the reference's in-repo rosinality Discriminator
(ssar/models/stylegan2.py:673-729) and the pixel2style2pixel encoder
(ssar/models/pixel2style2pixel.py) used for video-inversion experiments.
NHWC, residual downsampling blocks with equalized-lr convs, minibatch
stddev; the pSp encoder reuses the same trunk with per-W+-row heads.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.upfirdn import downsample2x, fused_leaky_relu


class EqualConv(nn.Module):
    features: int
    kernel: int = 3
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        scale = 1.0 / np.sqrt(cin * self.kernel**2)
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.kernel, self.kernel, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        out = jax.lax.conv_general_dilated(
            x, w * scale, (1, 1), ((self.kernel // 2,) * 2, (self.kernel // 2,) * 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return fused_leaky_relu(out, b) if self.activate else out + b


class DiscriminatorBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = EqualConv(x.shape[-1])(x)
        h = EqualConv(self.features)(downsample2x(h))
        skip = EqualConv(self.features, kernel=1, activate=False)(downsample2x(x))
        return (h + skip) / np.sqrt(2)


def minibatch_stddev(x: jax.Array, group: int = 4) -> jax.Array:
    B, H, W, C = x.shape
    g = min(group, B)
    y = x[: B // g * g].reshape(g, -1, H, W, C)
    std = jnp.sqrt(jnp.var(y, axis=0) + 1e-8).mean(axis=(1, 2, 3), keepdims=True)
    std = jnp.broadcast_to(jnp.repeat(std, g, axis=0), (B, H, W, 1))
    return jnp.concatenate([x, std], axis=-1)


class Discriminator(nn.Module):
    """(B, R, R, 3) -> (B,) realness scores (stylegan2.py:673-729).

    ``features=True`` returns the (B, 512) penultimate activations instead
    of the score — a TRAINED in-environment feature extractor for the
    FID/KID/PRDC mechanism (metrics/ood.py discriminator_extractor)."""

    resolution: int = 256
    channel_multiplier: int = 2

    @nn.compact
    def __call__(self, x, features: bool = False):
        cm = self.channel_multiplier
        chans = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm, 128: 128 * cm,
                 256: 64 * cm, 512: 32 * cm, 1024: 16 * cm}
        log = int(np.log2(self.resolution))
        h = EqualConv(chans[self.resolution], kernel=1)(x)
        for i in range(log, 2, -1):
            h = DiscriminatorBlock(chans[2 ** (i - 1)])(h)
        h = minibatch_stddev(h)
        h = EqualConv(chans[4])(h)
        h = h.reshape(h.shape[0], -1)
        h = fused_leaky_relu(nn.Dense(chans[4])(h))
        if features:
            return h
        return nn.Dense(1)(h)[:, 0]


class PSPEncoder(nn.Module):
    """Image -> W+ (B, n_styles, 512) (pixel2style2pixel.py): shared conv
    trunk with per-depth feature taps feeding map2style heads for the
    coarse / medium / fine W+ groups."""

    n_styles: int = 18
    resolution: int = 256

    @nn.compact
    def __call__(self, x):
        feats = []
        h = EqualConv(64)(x)
        res = self.resolution
        while res > 4:
            h = DiscriminatorBlock(min(512, h.shape[-1] * 2))(h)
            res //= 2
            feats.append(h)
        # fine/medium/coarse taps = shallowest/middle/deepest available
        coarse = feats[-1]
        medium = feats[max(0, len(feats) - 2)]
        fine = feats[max(0, len(feats) - 3)]

        def map2style(f, n):
            out = []
            for _ in range(n):
                g = f
                while g.shape[1] > 1:
                    g = EqualConv(512)(downsample2x(g))
                out.append(nn.Dense(512)(g.reshape(g.shape[0], -1)))
            return out

        n_c = self.n_styles // 3
        styles = (map2style(coarse, n_c) + map2style(medium, n_c)
                  + map2style(fine, self.n_styles - 2 * n_c))
        return jnp.stack(styles, axis=1)
