"""Sequence backbones for the EnvelopeReactor (GRU/LSTM/conv/MLP/transformer/S4).

Equivalents of the backbone zoo in ssar/models/latent_n_noise2.py:40-63
(GRU/LSTM via torch cuDNN, ConvNeXtSeq2Seq, MLPSeq2Seq, x-transformers
Encoder, Sashimi).  TPU-first: recurrent nets run as ``lax.scan`` over time
with the (batch x hidden) math on the MXU; conv/MLP/transformer/S4 are
fully parallel over the 192-frame windows.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .s4 import S4Block


class VariationalLSTM(nn.Module):
    """LSTM with variational (locked) dropout — the better_lstm equivalent
    (ssar/models/audio2latent.py:173-183 passes dropouti/dropoutw/dropouto).

    One Bernoulli mask per sequence (not per step): input features
    (dropouti), recurrent hidden state (dropoutw — the Gal & Ghahramani
    stand-in for weight DropConnect), outputs (dropouto)."""

    features: int
    dropouti: float = 0.0
    dropoutw: float = 0.0
    dropouto: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B = x.shape[0]
        cell = nn.OptimizedLSTMCell(self.features)
        mh = jnp.ones((B, self.features), x.dtype)
        if not deterministic and (self.dropouti or self.dropoutw or self.dropouto):
            k1, k2, k3 = jax.random.split(self.make_rng("dropout"), 3)
            if self.dropouti:
                keep = 1 - self.dropouti
                x = x * jax.random.bernoulli(k1, keep, (B, 1, x.shape[-1])) / keep
            if self.dropoutw:
                keep = 1 - self.dropoutw
                mh = jax.random.bernoulli(k2, keep, mh.shape).astype(x.dtype) / keep
            mo = None
            if self.dropouto:
                keep = 1 - self.dropouto
                mo = jax.random.bernoulli(k3, keep, (B, 1, self.features)).astype(x.dtype) / keep
        else:
            mo = None

        carry = cell.initialize_carry(jax.random.PRNGKey(0), x[:, 0].shape)

        def step(cell_, carry_, xt):
            c, h = carry_
            return cell_((c, h * mh), xt)

        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        _, ys = scan(cell, carry, x)
        return ys * mo if mo is not None else ys


class MultiLayerRNN(nn.Module):
    """Stacked GRU/LSTM over (B, L, H) via nn.RNN (lax.scan inside).

    cell="lstm" uses VariationalLSTM with dropouti=dropoutw=dropouto=dropout,
    matching the reference's better_lstm configuration."""

    features: int
    num_layers: int = 4
    cell: str = "gru"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_layers):
            if self.cell == "gru":
                x = nn.RNN(nn.GRUCell(self.features))(x)
                if self.dropout > 0 and i < self.num_layers - 1:
                    x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            else:
                x = VariationalLSTM(self.features, self.dropout, self.dropout,
                                    self.dropout)(x, deterministic=deterministic)
        return x


class ConvNeXtBlock1d(nn.Module):
    """1-D ConvNeXt block (depthwise 7-tap + pointwise MLP + layerscale),
    the reference's ConvNeXtSeq2Seq unit (ssar/models/convnext.py:154-216)."""

    features: int
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Conv(self.features, (7,), feature_group_count=self.features, padding="SAME")(x)
        h = nn.LayerNorm()(h)
        h = nn.Dense(4 * self.features)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.features)(h)
        gamma = self.param("layerscale", nn.initializers.constant(1e-6), (self.features,))
        h = gamma * h
        if self.drop_path > 0:
            keep = 1.0 - self.drop_path
            if not deterministic:
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
                h = h * mask / keep
        return x + h


class ConvNeXtSeq2Seq(nn.Module):
    features: int
    num_layers: int = 4
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for _ in range(self.num_layers):
            x = ConvNeXtBlock1d(self.features, self.drop_path_rate)(x, deterministic)
        return x


class GatedMLPBlock(nn.Module):
    """Conv-gated MLP block (the reference's MLPSeq2Seq unit, ssar/models/mlp.py)."""

    features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm()(x)
        h = nn.Dense(2 * self.features)(h)
        h = nn.gelu(h)
        # spatial gating: split channels, gate one half with a temporal conv of the other
        u, v = jnp.split(h, 2, axis=-1)
        v = nn.LayerNorm()(v)
        v = nn.Conv(self.features, (5,), padding="SAME")(v)
        h = u * v
        h = nn.Dense(self.features)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class MLPSeq2Seq(nn.Module):
    features: int
    num_layers: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for _ in range(self.num_layers):
            x = GatedMLPBlock(self.features, self.dropout)(x, deterministic)
        return x


def alibi_bias(n_heads: int, L: int) -> np.ndarray:
    """ALiBi linear positional bias (the reference's transformer reactor uses
    alibi_pos_bias, ssar/models/latent_n_noise.py:46-57). (heads, L, L)."""
    slopes = 2.0 ** (-8.0 * (np.arange(1, n_heads + 1) / n_heads))
    rel = -np.abs(np.arange(L)[None, :] - np.arange(L)[:, None])
    return (slopes[:, None, None] * rel[None]).astype(np.float32)


class TransformerEncoder(nn.Module):
    """Pre-LN transformer encoder with ALiBi bias (x-transformers Encoder
    equivalent, latent_n_noise2.py:55-59: heads=4, dim_head=hidden//4)."""

    features: int
    num_layers: int = 4
    n_heads: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        L = x.shape[-2]
        bias = jnp.asarray(alibi_bias(self.n_heads, L))  # (heads, L, L)
        dim_head = self.features // self.n_heads
        for _ in range(self.num_layers):
            h = nn.LayerNorm()(x)
            q = nn.DenseGeneral((self.n_heads, dim_head))(h)
            k = nn.DenseGeneral((self.n_heads, dim_head))(h)
            v = nn.DenseGeneral((self.n_heads, dim_head))(h)
            a = nn.dot_product_attention(q, k, v, bias=bias[None])
            h = nn.DenseGeneral(self.features, axis=(-2, -1))(a)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            x = x + h
            h = nn.LayerNorm()(x)
            h = nn.Dense(4 * self.features)(h)
            h = nn.gelu(h)
            h = nn.Dense(self.features)(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            x = x + h
        return x


class S4Backbone(nn.Module):
    features: int
    num_layers: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for _ in range(self.num_layers):
            x = S4Block(self.features, dropout=self.dropout)(x, deterministic)
        return nn.LayerNorm()(x)


BACKBONES = {
    "gru": lambda h, n, d: MultiLayerRNN(h, n, "gru", d),
    "lstm": lambda h, n, d: MultiLayerRNN(h, n, "lstm", d),
    "conv": lambda h, n, d: ConvNeXtSeq2Seq(h, n, d),
    "mlp": lambda h, n, d: MLPSeq2Seq(h, n, d),
    "transformer": lambda h, n, d: TransformerEncoder(h, n, 4, d),
    "sashimi": lambda h, n, d: S4Backbone(h, n, d),
}
