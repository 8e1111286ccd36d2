"""Audio2Latent v1 and v2 — the earlier supervised audio->W+ model family.

Equivalents of ssar/models/audio2latent.py (GRU/LSTM/conv-autoencoder
backbone + optional attention skip branch + per-layer-group output heads)
and ssar/models/audio2latent2.py (a temporal U-Net of
context-and-correlation layers).  Flax, time-major-batch (B, T, F) like the
rest of the framework; recurrent parts are lax.scan.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbones import MultiLayerRNN
from .reactor import LayerwiseLinear, Normalize


class AttentionSkip(nn.Module):
    """The skip branch: MLP + single self-attention layer
    (ssar/models/audio2latent.py:209-222)."""

    features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.features)(x)
        h = nn.Dropout(self.dropout)(nn.leaky_relu(h, 0.2), deterministic=deterministic)
        h = nn.Dense(self.features)(h)
        h = nn.Dropout(self.dropout)(nn.leaky_relu(h, 0.2), deterministic=deterministic)
        a = nn.MultiHeadDotProductAttention(num_heads=4, qkv_features=self.features,
                                            dropout_rate=self.dropout,
                                            deterministic=deterministic)(h, h)
        return nn.Dropout(self.dropout)(nn.leaky_relu(a, 0.2), deterministic=deterministic)


class ConvAutoencoder1d(nn.Module):
    """Strided conv encoder / transposed-conv decoder over time
    (audio2latent.py:186-200): channel width doubles toward the bottleneck."""

    features: int
    num_layers: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        T = x.shape[1]
        for n in range(self.num_layers):
            mult = 2 ** min(n, self.num_layers - n - 1)
            transpose = n >= self.num_layers // 2
            if transpose:
                x = nn.ConvTranspose(self.features * mult, (5,), strides=(2,), padding="SAME")(x)
            else:
                x = nn.Conv(self.features * mult, (5,), strides=(2,), padding="SAME")(x)
            x = nn.Dropout(self.dropout)(nn.leaky_relu(x, 0.2), deterministic=deterministic)
        # pad/trim back to T frames
        if x.shape[1] < T:
            x = jnp.pad(x, ((0, 0), (0, T - x.shape[1]), (0, 0)))
        return x[:, :T]


class LayerwiseConv(nn.Module):
    """Per-group temporal-conv output heads (audio2latent.py:106-145)."""

    out_channels: int = 512
    n_outputs: int = 18
    n_layerwise: int = 3
    kernel_size: int = 5
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        per = self.n_outputs // self.n_layerwise
        outs = []
        for _ in range(self.n_layerwise):
            h = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME")(x)
            h = nn.Dropout(self.dropout)(nn.leaky_relu(h, 0.2), deterministic=deterministic)
            h = nn.Conv(per * self.out_channels, (self.kernel_size,), padding="SAME")(h)
            outs.append(h.reshape(x.shape[0], x.shape[1], per, self.out_channels))
        return jnp.concatenate(outs, axis=2)


class Audio2Latent(nn.Module):
    """(B, T, F) -> W+ (B, T, n_outputs, output_size) (audio2latent.py:148-256)."""

    input_mean: jnp.ndarray
    input_std: jnp.ndarray
    hidden_size: int = 64
    num_layers: int = 4
    n_outputs: int = 18
    output_size: int = 512
    backbone: str = "gru"
    skip_backbone: bool = True
    layerwise: str = "dense"
    n_layerwise: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = Normalize(self.input_mean, self.input_std)(x)
        if self.backbone in ("gru", "lstm"):
            w = MultiLayerRNN(self.hidden_size, self.num_layers, self.backbone, self.dropout)(
                h, deterministic=deterministic
            )
        elif self.backbone == "conv":
            w = ConvAutoencoder1d(self.hidden_size, self.num_layers, self.dropout)(
                h, deterministic=deterministic
            )
        else:
            raise NotImplementedError(self.backbone)

        w = nn.Dropout(self.dropout)(nn.leaky_relu(w, 0.2), deterministic=deterministic)
        if self.skip_backbone:
            skip = AttentionSkip(self.hidden_size, self.dropout)(x, deterministic=deterministic)
            w = jnp.concatenate([w, skip], axis=2)

        if self.layerwise == "dense":
            return LayerwiseLinear(self.output_size, self.n_outputs, self.n_layerwise,
                                   self.dropout)(w, deterministic)
        return LayerwiseConv(self.output_size, self.n_outputs, self.n_layerwise,
                             dropout=self.dropout)(w, deterministic)


class EfficientChannelAttention(nn.Module):
    """ECA: 1-D conv over channel descriptors (audio2latent2.py sub-module)."""

    kernel_size: int = 5

    @nn.compact
    def __call__(self, x):
        # x (B, T, C): squeeze over time, conv over channel axis, sigmoid gate
        y = jnp.mean(x, axis=1)  # (B, C)
        y = nn.Conv(1, (self.kernel_size,), padding="SAME")(y[..., None])[..., 0]
        return x * jax.nn.sigmoid(y)[:, None, :]


class ContextAndCorrelationLayer(nn.Module):
    """Parallel temporal-context and channel-correlation paths
    (audio2latent2.py:101-144)."""

    context: str = "gru"
    correlation: str = "linear"
    out_channels: int = 64
    kernel_size: int = 5
    dropout: float = 0.0
    additive: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        oc = self.out_channels if self.additive else self.out_channels // 2
        if self.context in ("gru", "lstm"):
            ctx = MultiLayerRNN(oc, 1, self.context, self.dropout)(x, deterministic=deterministic)
        elif self.context == "conv":
            ctx = nn.Conv(oc, (self.kernel_size,), padding="SAME")(x)
            ctx = nn.Dropout(self.dropout)(ctx, deterministic=deterministic)
        elif self.context == "transformer":
            ctx = nn.MultiHeadDotProductAttention(num_heads=4, qkv_features=oc, out_features=oc,
                                                  dropout_rate=self.dropout,
                                                  deterministic=deterministic)(x, x)
        else:
            raise NotImplementedError(self.context)

        h = x
        if self.correlation == "eca":
            h = EfficientChannelAttention(self.kernel_size)(h)
        corr = nn.Dense(oc)(h)
        corr = nn.Dropout(self.dropout)(corr, deterministic=deterministic)
        return ctx + corr if self.additive else jnp.concatenate([ctx, corr], axis=2)


class Audio2Latent2(nn.Module):
    """Temporal U-Net of context+correlation layers
    (audio2latent2.py:146-246): pool time by 2 on the way down, unpool on the
    way up with skip connections, then per-group W+ heads."""

    input_mean: jnp.ndarray
    input_std: jnp.ndarray
    hidden_size: int = 64
    num_layers: int = 4
    n_outputs: int = 18
    output_size: int = 512
    context: str = "gru"
    correlation: str = "linear"
    n_layerwise: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = Normalize(self.input_mean, self.input_std)(x)
        h = nn.Dense(self.hidden_size)(h)

        downs = []
        depth = self.num_layers // 2
        for _ in range(depth):
            h = ContextAndCorrelationLayer(self.context, self.correlation, self.hidden_size,
                                           dropout=self.dropout)(h, deterministic)
            downs.append(h)
            B, T, C = h.shape
            h = h[:, : T // 2 * 2].reshape(B, T // 2, 2 * C)  # time pool
            h = nn.Dense(self.hidden_size)(h)
        for i in range(depth):
            h = ContextAndCorrelationLayer(self.context, self.correlation, self.hidden_size,
                                           dropout=self.dropout)(h, deterministic)
            B, T, C = h.shape
            h = jnp.repeat(h, 2, axis=1)  # time unpool
            skip = downs[depth - 1 - i]
            h = nn.Dense(self.hidden_size)(h[:, : skip.shape[1]]) + skip
        return LayerwiseLinear(self.output_size, self.n_outputs, self.n_layerwise,
                               self.dropout)(h, deterministic)
