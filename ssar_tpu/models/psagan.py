"""PSA-GAN: progressive self-attention GAN over 1-D latent sequences.

Equivalent of ssar/models/psagan.py (used by the supervised GAN trainer,
ssar/supervised/train_gan.py): a progressive-growing generator/discriminator
pair over time series with residual self-attention blocks, conditioned on
per-frame audio features.  TPU notes: attention is full (T <= a few hundred
frames), progressive stages are static graphs selected by `stage`, fade-in
is a traced scalar.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SelfAttention1d(nn.Module):
    """Scaled-dot self-attention over time with a residual gate
    (psagan.py:25-133)."""

    features: int
    n_heads: int = 4

    @nn.compact
    def __call__(self, x):
        a = nn.MultiHeadDotProductAttention(num_heads=self.n_heads, qkv_features=self.features)(x, x)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + gamma * a


class ConvResidualSelfAttention(nn.Module):
    """Conv -> attention -> conv residual block (psagan.py:208-310)."""

    features: int
    use_attention: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3,), padding="SAME")(x)
        h = nn.leaky_relu(h, 0.2)
        if self.use_attention:
            h = SelfAttention1d(self.features)(h)
        h = nn.Conv(self.features, (3,), padding="SAME")(h)
        h = nn.leaky_relu(h, 0.2)
        if x.shape[-1] != self.features:
            x = nn.Dense(self.features)(x)
        return x + h


class ProgressiveGenerator(nn.Module):
    """(B, T, cond_dim) audio features + noise -> (B, T, out_dim) latent
    sequences, grown stage by stage from T/2^stages (psagan.py:313-491).

    `stage` selects how many upsampling blocks are active; `alpha` in [0,1]
    fades the newest block in (both static/traced respectively).
    """

    out_dim: int = 512
    features: int = 64
    n_stages: int = 4
    noise_dim: int = 32

    @nn.compact
    def __call__(self, cond, key, stage: int | None = None, alpha: float = 1.0):
        stage = self.n_stages if stage is None else stage
        B, T, _ = cond.shape
        T0 = T // (2**stage) if stage > 0 else T

        # coarse conditioning: average-pool features to the base length
        def pool_to(c, length):
            f = c.shape[1] // length
            return c[:, : length * f].reshape(B, length, f, -1).mean(2)

        z = jax.random.normal(key, (B, T0, self.noise_dim))
        h = jnp.concatenate([pool_to(cond, T0), z], axis=-1)
        h = nn.Dense(self.features)(h)
        h = ConvResidualSelfAttention(self.features, use_attention=False)(h)

        prev = None
        for s in range(stage):
            prev = h
            h = jnp.repeat(h, 2, axis=1)  # nearest-neighbour time upsample
            length = h.shape[1]
            h = jnp.concatenate([h, pool_to(cond, length)], axis=-1)
            h = ConvResidualSelfAttention(self.features, use_attention=(s >= stage - 2))(h)
            if s == stage - 1 and prev is not None and alpha < 1.0:
                h = alpha * h + (1 - alpha) * nn.Dense(self.features)(jnp.repeat(prev, 2, axis=1))
        out = nn.Dense(self.out_dim)(h)
        return out[:, :T]


class ProgressiveDiscriminator(nn.Module):
    """(B, T, in_dim) sequences + (B, T, cond_dim) features -> (B,) scores
    (psagan.py:511-650)."""

    features: int = 64
    n_stages: int = 4

    @nn.compact
    def __call__(self, x, cond, stage: int | None = None):
        stage = self.n_stages if stage is None else stage
        h = jnp.concatenate([x, cond[:, : x.shape[1]]], axis=-1)
        h = nn.Dense(self.features)(h)
        for s in range(stage):
            h = ConvResidualSelfAttention(self.features, use_attention=(s < 2))(h)
            B, T, C = h.shape
            h = h[:, : T // 2 * 2].reshape(B, T // 2, 2 * C)
            h = nn.Dense(self.features)(h)
        h = ConvResidualSelfAttention(self.features, use_attention=False)(h)
        return nn.Dense(1)(jnp.mean(h, axis=1))[:, 0]
