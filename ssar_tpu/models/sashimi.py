"""Sashimi: U-Net of S4D blocks with temporal pooling.

Equivalent of ssar/models/sashimi/sashimi.py:213-479 (down-pool by p=4 via
reshape+linear, residual S4 blocks per tier, up-pool with skip connections)
built on the diagonal S4D layer (ssar_tpu/models/s4.py).

The reference's recurrent `step` mode for O(1)-per-frame streaming
generation (sashimi.py:374-434) is ``SashimiStreamer``: S4 blocks step
their SSM recurrences, DownPools buffer ``pool`` frames and fire at the
pooled rate, UpPools pop from a queue that the deeper tier refills one
pooled step ahead (the causal shift).  Streaming output equals the conv
mode exactly (tests/test_models.py).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .s4 import S4Block


class DownPool(nn.Module):
    """(B, T, H) -> (B, T/p, H*expand) by folding p frames into channels."""

    features: int
    pool: int = 4

    def setup(self):
        self.proj = nn.Dense(self.features)

    def __call__(self, x):
        B, T, H = x.shape
        p = self.pool
        x = x[:, : T // p * p].reshape(B, T // p, p * H)
        return self.proj(x)

    def step_pool(self, frames: jax.Array) -> jax.Array:
        """frames (B, p, H) -> (B, features): one pooled step."""
        B = frames.shape[0]
        return self.proj(frames.reshape(B, -1))


class UpPool(nn.Module):
    """(B, T, H) -> (B, T*p, features) by expanding channels into frames.

    The output is shifted right by one pooled step (causality-preserving, as
    in the reference's up-pool, sashimi.py:69-107)."""

    features: int
    pool: int = 4

    def setup(self):
        self.proj = nn.Dense(self.features * self.pool)

    def __call__(self, x):
        B, T, H = x.shape
        p = self.pool
        h = self.proj(x)
        h = h.reshape(B, T * p, self.features)
        # causal shift by one pooled frame
        return jnp.pad(h, ((0, 0), (p, 0), (0, 0)))[:, : T * p]

    def step_expand(self, z: jax.Array) -> jax.Array:
        """z (B, H) -> (B, p, features): the next p output frames."""
        B = z.shape[0]
        return self.proj(z).reshape(B, self.pool, self.features)


class Sashimi(nn.Module):
    """(B, T, H) -> (B, T, H); T must be divisible by pool**n_tiers."""

    features: int
    n_layers_per_tier: int = 2
    n_tiers: int = 2
    pool: int = 4
    expand: int = 2
    state_dim: int = 64
    dropout: float = 0.0

    def setup(self):
        feats = self.features
        down_blocks, down_pools, up_blocks, up_pools = [], [], [], []
        for tier in range(self.n_tiers):
            down_blocks.append([S4Block(feats, self.state_dim, self.dropout)
                                for _ in range(self.n_layers_per_tier)])
            up_blocks.append([S4Block(feats, self.state_dim, self.dropout)
                              for _ in range(self.n_layers_per_tier)])
            up_pools.append(UpPool(feats, self.pool))
            feats = feats * self.expand
            down_pools.append(DownPool(feats, self.pool))
        self.down_blocks = down_blocks
        self.down_pools = down_pools
        self.up_blocks = up_blocks      # indexed by tier (0 = full rate)
        self.up_pools = up_pools        # up_pools[tier] expands INTO tier's rate
        self.center_blocks = [S4Block(feats, self.state_dim, self.dropout)
                              for _ in range(self.n_layers_per_tier)]
        self.out_norm = nn.LayerNorm()

    def __call__(self, x, deterministic: bool = True):
        skips = []
        for tier in range(self.n_tiers):
            for blk in self.down_blocks[tier]:
                x = blk(x, deterministic)
            skips.append(x)
            x = self.down_pools[tier](x)

        for blk in self.center_blocks:
            x = blk(x, deterministic)

        for tier in range(self.n_tiers - 1, -1, -1):
            x = self.up_pools[tier](x)
            skip = skips[tier]
            x = x[:, : skip.shape[1]] + skip
            for blk in self.up_blocks[tier]:
                x = blk(x, deterministic)

        return self.out_norm(x)


class SashimiStreamer:
    """O(1)-per-frame streaming evaluation of a trained Sashimi
    (sashimi.py:374-434 equivalent).

    >>> streamer = SashimiStreamer(model, params, batch_size=B)
    >>> y_t = streamer.step(x_t)        # x_t (B, H) per frame

    Tier t steps every pool**t frames; UpPool queues start as zeros, which
    reproduces the conv mode's causal right-shift exactly.
    """

    def __init__(self, model: Sashimi, params, batch_size: int):
        self.model = model
        self.bound = model.bind(params)
        self.B = batch_size
        p, nt = model.pool, model.n_tiers
        self.p = p
        B = batch_size

        def blk_states(blocks):
            return [blk.init_state((B,)) for blk in blocks]

        self.down_states = [blk_states(self.bound.down_blocks[t]) for t in range(nt)]
        self.up_states = [blk_states(self.bound.up_blocks[t]) for t in range(nt)]
        self.center_states = blk_states(self.bound.center_blocks)
        self.buffers: list[list] = [[] for _ in range(nt)]  # DownPool input frames
        feats = [model.features * model.expand**t for t in range(nt)]
        self.queues = [list(jnp.zeros((p, B, feats[t]))) for t in range(nt)]

    def _step_blocks(self, blocks, states, x):
        for i, blk in enumerate(blocks):
            states[i], x = blk.step(states[i], x)
        return x

    def _tier_step(self, tier: int, x: jax.Array) -> jax.Array:
        """One step of tier `tier` (x at that tier's rate) -> output frame."""
        bound = self.bound
        x = self._step_blocks(bound.down_blocks[tier], self.down_states[tier], x)
        skip = x
        self.buffers[tier].append(x)

        y_up = self.queues[tier].pop(0)
        if len(self.buffers[tier]) == self.p:  # deeper tiers fire
            frames = jnp.stack(self.buffers[tier], axis=1)  # (B, p, H)
            self.buffers[tier] = []
            z = bound.down_pools[tier].step_pool(frames)
            if tier + 1 < self.model.n_tiers:
                z = self._tier_step(tier + 1, z)
            else:
                z = self._step_blocks(bound.center_blocks, self.center_states, z)
            expanded = bound.up_pools[tier].step_expand(z)  # (B, p, feats)
            self.queues[tier].extend(jnp.swapaxes(expanded, 0, 1))

        y = y_up + skip
        y = self._step_blocks(bound.up_blocks[tier], self.up_states[tier], y)
        return y

    def step(self, x_t: jax.Array) -> jax.Array:
        """x_t (B, H) -> y_t (B, H)."""
        return self.bound.out_norm(self._tier_step(0, x_t))
