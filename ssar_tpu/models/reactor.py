"""LatentNoiseReactor — the flagship audio->latent+noise sequence model.

Equivalent of ssar/models/latent_n_noise2.py: an EnvelopeReactor (normalise
-> Linear+GELU -> backbone -> GELU+Linear) produces per-frame envelopes that
either a Fixed or Learned decoder turns into StyleGAN2 W+ sequences
(B, T, n_ws, 512) plus a 4-level noise pyramid [(B,T,4,4)...(B,T,32,32)].

Stochastic noise synthesis (the reference draws fresh randn each forward and
gaussian-smooths it over time, latent_n_noise2.py:104-111,166-173) is
reproduced with explicit flax rng collections ("noise") — reproducible under
jax key threading, the randomness contract SURVEY.md §7 calls for.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gaussian import gaussian_filter
from .backbones import BACKBONES


class Normalize(nn.Module):
    """Fixed input standardisation (ssar/models/audio2latent.py:19-26)."""

    mean: jnp.ndarray
    std: jnp.ndarray

    def __call__(self, x):
        return (x - self.mean) / (self.std + 1e-8)


class EnvelopeReactor(nn.Module):
    """(B, T, F) features -> (B, T, E) envelopes (latent_n_noise2.py:20-70)."""

    input_mean: jnp.ndarray
    input_std: jnp.ndarray
    hidden_size: int = 64
    output_size: int | None = None
    num_layers: int = 4
    backbone: str = "gru"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = Normalize(self.input_mean, self.input_std)(x)
        h = nn.Dense(self.hidden_size)(h)
        h = nn.gelu(h)
        h = BACKBONES[self.backbone.lower()](self.hidden_size, self.num_layers, self.dropout)(
            h, deterministic=deterministic
        )
        h = nn.gelu(h)
        return nn.Dense(self.hidden_size if self.output_size is None else self.output_size)(h)


def _smoothed_noise(key, shape_bt, size: int, sigma: float = 5.0):
    """Time-smoothed standard noise (B, T, size, size): randn smoothed along T
    (latent_n_noise2.py:108,171: gaussian_filter over the time axis)."""
    B, T = shape_bt
    n = jax.random.normal(key, (T, B, size, size))
    n = gaussian_filter(n, sigma)  # smooth along leading (time) axis
    return jnp.transpose(n, (1, 0, 2, 3))


class FixedLatentNoiseDecoder(nn.Module):
    """Envelopes = convex weights over a frozen W+ palette
    (latent_n_noise2.py:134-178).

    latents: (S*H, n_ws, 512) palette; envelopes (B, T, S*H + 2*n_noise).
    Each of the S latent splits mixes its H palette rows over its n_ws/S
    W+ layer band; the trailing 2*n_noise envelopes are (mu, sigma) pairs
    scaling smoothed noise at 4x4..32x32.
    """

    latents: jnp.ndarray
    hidden_size: int = 12
    n_latent_split: int = 3
    n_noise: int = 4
    # OPT-IN stability guard (default 0 = the reference's exact unguarded
    # normalisation, latent_n_noise2.py:151).  The unguarded env/env.sum
    # fires enormous outputs whenever a window's envelope sum lands near
    # zero — the measured cause of both the training collapse (docs/GRID.md
    # r3) and the heavy-tailed val metric; at hidden_size 3 (the
    # reference's own record config) the 3-term sum crosses zero so often
    # the cell is unstable-by-construction (docs/GRID.md r5).  A small eps
    # clamps |sum| away from zero, preserving sign.
    env_guard_eps: float = 0.0

    @nn.compact
    def __call__(self, x):
        S, H = self.n_latent_split, self.hidden_size
        assert self.latents.shape[0] == S * H
        W = self.latents.shape[1] // S

        outs = []
        for i in range(S):
            env = x[..., i * H : (i + 1) * H]
            s = jnp.sum(env, axis=-1, keepdims=True)
            if self.env_guard_eps:
                s = jnp.where(jnp.abs(s) < self.env_guard_eps,
                              jnp.where(s >= 0, self.env_guard_eps, -self.env_guard_eps), s)
            env = env / s
            lat = jax.lax.stop_gradient(self.latents[i * H : (i + 1) * H, i * W : (i + 1) * W])
            outs.append(jnp.einsum("BTH,HWL->BTWL", env, lat))
        latents = jnp.concatenate(outs, axis=2)

        noise_envs = x[..., S * H :]
        B, T = x.shape[0], x.shape[1]
        noise = []
        for i in range(noise_envs.shape[-1] // 2):
            mu = noise_envs[..., 2 * i][..., None, None]
            sig = noise_envs[..., 2 * i + 1][..., None, None]
            size = 2 ** (i + 2)
            base = jax.lax.stop_gradient(
                _smoothed_noise(self.make_rng("noise"), (B, T), size)
            )
            noise.append(mu + sig * base)
        return latents, noise


class NoiseHead(nn.Module):
    """Learned per-scale (mu, sigma) noise head (latent_n_noise2.py:73-112)."""

    n_outputs: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, T, C = x.shape
        noise = []
        for i in range(self.n_outputs):
            h = nn.Dense(C // 2)(x)
            h = nn.Dropout(self.dropout)(nn.gelu(h), deterministic=deterministic)
            mu_sig = nn.Dense(2)(h)  # (B, T, 2)
            mu = mu_sig[..., 0][..., None, None]
            sig = mu_sig[..., 1][..., None, None]
            size = 2 ** (i + 2)
            base = _smoothed_noise(self.make_rng("noise"), (B, T), size)
            noise.append(mu + sig * base)
        return noise


class ConvNoiseUpsampler(nn.Module):
    """v1 Reactor 3-D-conv noise pyramid (ssar/models/latent_n_noise.py:80-108,
    113-119): GLU-expand the per-frame hidden state into a 2x2 spatial seed,
    then four [trilinear (1,2,2) upsample -> Conv3d -> GELU] stages, each
    tapped by a Conv3d(dim, 1) outsampler -> noise maps at 4x4..32x32.

    TPU-first layout: NDHWC (time as depth) so the 3-D convs lower to MXU
    convolutions; ``jax.image.resize`` half-pixel linear interpolation matches
    torch trilinear align_corners=False.  Fully deterministic (no "noise"
    rng) — the v1 design generates noise from content, unlike the v2 head's
    mu/sigma-scaled smoothed randn.
    """

    features: int  # = the reactor hidden dim
    n_outputs: int = 4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, T, C = x.shape
        D = self.features
        # GLU(dim, dim*4) -> Reshape(2, 2) (latent_n_noise.py:80)
        h = nn.Dense(D * 4 * 2)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        h = h.reshape(B, T, 2, 2, D)
        h = nn.gelu(nn.Conv(D, (3, 3, 3), padding="SAME")(h))
        noise = []
        for i in range(self.n_outputs):
            size = 2 ** (i + 2)
            h = jax.image.resize(h, (B, T, size, size, D), method="linear")
            h = nn.gelu(nn.Conv(D, (3, 3, 3), padding="SAME")(h))
            noise.append(nn.Conv(1, (3, 3, 3), padding="SAME")(h)[..., 0])
        return noise


class LayerwiseLinear(nn.Module):
    """Per-W+-layer-group output heads (ssar/models/audio2latent.py:71-103):
    n_outputs W+ rows produced by n_layerwise independent two-layer MLPs."""

    out_channels: int = 512
    n_outputs: int = 18
    n_layerwise: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert self.n_outputs % self.n_layerwise == 0
        per = self.n_outputs // self.n_layerwise
        outs = []
        for _ in range(self.n_layerwise):
            h = nn.Dense(self.out_channels)(x)
            h = nn.Dropout(self.dropout)(nn.gelu(h), deterministic=deterministic)
            h = nn.Dense(per * self.out_channels)(h)
            outs.append(h.reshape(x.shape[0], x.shape[1], per, self.out_channels))
        return jnp.concatenate(outs, axis=2)  # (B, T, n_outputs, 512)


class LearnedLatentNoiseDecoder(nn.Module):
    """(latent_n_noise2.py:115-131).

    ``noise_mode="conv3d"`` swaps the v2 mu/sigma NoiseHead for the v1
    Reactor's content-generated 3-D-conv pyramid (latent_n_noise.py:80-108).
    """

    n_ws: int = 18
    n_latent_split: int = 3
    n_noise: int = 4
    dropout: float = 0.0
    noise_mode: str = "musigma"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dropout(self.dropout)(nn.gelu(x), deterministic=deterministic)
        latents = LayerwiseLinear(512, self.n_ws, self.n_latent_split, self.dropout)(h, deterministic)
        if self.noise_mode == "conv3d":
            noise = ConvNoiseUpsampler(x.shape[-1], self.n_noise)(h, deterministic)
        else:
            noise = NoiseHead(self.n_noise, self.dropout)(h, deterministic)
        return latents, noise


class LatentNoiseReactor(nn.Module):
    """Full model (latent_n_noise2.py:181-226).

    __call__(features (B,T,59)) -> (latents (B,T,n_ws,512), [4 noise maps])
    Needs rngs={"noise": key} at apply time (and "dropout" when training).
    """

    input_mean: jnp.ndarray
    input_std: jnp.ndarray
    latents: jnp.ndarray | None = None  # palette for the fixed decoder
    env_guard_eps: float = 0.0  # opt-in fixed-decoder stability guard
    residual: bool = True
    num_layers: int = 2
    backbone: str = "sashimi"
    hidden_size: int = 64
    decoder: str = "fixed"
    n_latent_split: int = 3
    n_noise: int = 4
    dropout: float = 0.0
    n_ws: int = 18
    noise_mode: str = "musigma"  # "conv3d" = v1 pyramid (learned decoder only)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_envelopes: bool = False):
        if self.decoder == "fixed":
            n_envelopes = self.hidden_size * self.n_latent_split + 2 * self.n_noise
        else:
            n_envelopes = self.hidden_size

        envelopes = EnvelopeReactor(
            input_mean=self.input_mean, input_std=self.input_std,
            hidden_size=n_envelopes, num_layers=self.num_layers,
            backbone=self.backbone, dropout=self.dropout,
        )(x, deterministic=deterministic)

        if return_envelopes:
            return envelopes

        if self.decoder == "fixed":
            latents, noise = FixedLatentNoiseDecoder(
                self.latents, self.hidden_size, self.n_latent_split, self.n_noise,
                env_guard_eps=self.env_guard_eps,
            )(envelopes)
        else:
            latents, noise = LearnedLatentNoiseDecoder(
                self.n_ws, self.n_latent_split, self.n_noise, self.dropout,
                noise_mode=self.noise_mode,
            )(envelopes, deterministic)

        if self.residual:
            latents = latents - jnp.mean(latents, axis=1, keepdims=True)
        return latents, noise
