"""Sashimi: U-Net of S4D blocks with temporal pooling.

Equivalent of ssar/models/sashimi/sashimi.py:213-479 (down-pool by p=4 via
reshape+linear, residual S4 blocks per tier, up-pool with skip connections)
built on the diagonal S4D layer (ssar_tpu/models/s4.py).  The reference's
recurrent `step` mode for O(1)-per-frame streaming generation
(sashimi.py:374-434) is provided at the S4D-layer level (`S4DLayer.step`);
full-UNet streaming composes those states tier by tier.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .s4 import S4Block


class DownPool(nn.Module):
    """(B, T, H) -> (B, T/p, H*expand) by folding p frames into channels."""

    features: int
    pool: int = 4

    @nn.compact
    def __call__(self, x):
        B, T, H = x.shape
        p = self.pool
        x = x[:, : T // p * p].reshape(B, T // p, p * H)
        return nn.Dense(self.features)(x)


class UpPool(nn.Module):
    """(B, T, H) -> (B, T*p, features) by expanding channels into frames.

    The output is shifted right by one pooled step (causality-preserving, as
    in the reference's up-pool, sashimi.py:69-107)."""

    features: int
    pool: int = 4

    @nn.compact
    def __call__(self, x):
        B, T, H = x.shape
        p = self.pool
        h = nn.Dense(self.features * p)(x)
        h = h.reshape(B, T * p, self.features)
        # causal shift by one pooled frame
        return jnp.pad(h, ((0, 0), (p, 0), (0, 0)))[:, : T * p]


class Sashimi(nn.Module):
    """(B, T, H) -> (B, T, H); T must be divisible by pool**n_tiers."""

    features: int
    n_layers_per_tier: int = 2
    n_tiers: int = 2
    pool: int = 4
    expand: int = 2
    state_dim: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feats = self.features
        skips = []

        # down path
        for tier in range(self.n_tiers):
            for _ in range(self.n_layers_per_tier):
                x = S4Block(feats, self.state_dim, self.dropout)(x, deterministic)
            skips.append(x)
            feats = feats * self.expand
            x = DownPool(feats, self.pool)(x)

        # center
        for _ in range(self.n_layers_per_tier):
            x = S4Block(feats, self.state_dim, self.dropout)(x, deterministic)

        # up path
        for tier in range(self.n_tiers - 1, -1, -1):
            feats = feats // self.expand
            x = UpPool(feats, self.pool)(x)
            skip = skips[tier]
            x = x[:, : skip.shape[1]] + skip
            for _ in range(self.n_layers_per_tier):
                x = S4Block(feats, self.state_dim, self.dropout)(x, deterministic)

        return nn.LayerNorm()(x)
