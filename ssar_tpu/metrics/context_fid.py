"""Frechet Context Distance (FCD) for latent-sequence quality.

Equivalent of ssar/supervised/context_fid.py + the USRLT causal-CNN encoder
(ssar/supervised/usrlt.py — "Unsupervised Scalable Representation Learning
for Time series", Franceschi et al. 2019): a dilated causal CNN embeds
windows of latent sequences; the Frechet distance between embedding
distributions of real vs generated sequences is the FCD.  Includes the
triplet (time-series negative sampling) training loss.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .ood import frechet_distance


class CausalConvBlock(nn.Module):
    features: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        k = 3
        pad = (k - 1) * self.dilation
        h = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        h = nn.Conv(self.features, (k,), kernel_dilation=(self.dilation,), padding="VALID")(h)
        h = nn.leaky_relu(h, 0.01)
        h = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
        h = nn.Conv(self.features, (k,), kernel_dilation=(self.dilation,), padding="VALID")(h)
        h = nn.leaky_relu(h, 0.01)
        if x.shape[-1] != self.features:
            x = nn.Dense(self.features)(x)
        return x + h


class CausalCNNEncoder(nn.Module):
    """(B, T, D) -> (B, embed_dim) via exponentially-dilated causal convs +
    max-over-time (usrlt.py:745-1094's encoder topology)."""

    features: int = 64
    depth: int = 4
    embed_dim: int = 80

    @nn.compact
    def __call__(self, x):
        for d in range(self.depth):
            x = CausalConvBlock(self.features, 2**d)(x)
        x = jnp.max(x, axis=1)
        return nn.Dense(self.embed_dim)(x)


def triplet_loss(encoder_apply, params, batch, key, n_neg: int = 4, min_len: int = 8):
    """USRLT time-series triplet loss: an anchor crop and a positive sub-crop
    of the same series vs random crops of other series."""
    B, T, D = batch.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    anchor_len = int(min(T, max(min_len * 2, T // 2)))
    pos_len = anchor_len // 2

    a_start = jax.random.randint(k1, (B,), 0, T - anchor_len + 1)
    idx = a_start[:, None] + jnp.arange(anchor_len)
    anchors = jnp.take_along_axis(batch, idx[..., None], axis=1)

    p_off = jax.random.randint(k2, (B,), 0, anchor_len - pos_len + 1)
    pidx = (a_start + p_off)[:, None] + jnp.arange(pos_len)
    positives = jnp.take_along_axis(batch, pidx[..., None], axis=1)

    za = encoder_apply(params, anchors)
    zp = encoder_apply(params, positives)
    loss = -jnp.mean(jax.nn.log_sigmoid(jnp.sum(za * zp, axis=1)))

    for i in range(n_neg):
        kn = jax.random.fold_in(k3, i)
        perm = jax.random.permutation(kn, B)
        n_start = jax.random.randint(jax.random.fold_in(k4, i), (B,), 0, T - pos_len + 1)
        nidx = n_start[:, None] + jnp.arange(pos_len)
        negatives = jnp.take_along_axis(batch[perm], nidx[..., None], axis=1)
        zn = encoder_apply(params, negatives)
        loss = loss - jnp.mean(jax.nn.log_sigmoid(-jnp.sum(za * zn, axis=1))) / n_neg
    return loss


def train_encoder(sequences: np.ndarray, n_steps: int = 200, lr: float = 1e-3, seed: int = 0,
                  features: int = 32, embed_dim: int = 80):
    """Fit the context encoder on real latent sequences; returns (encoder_fn)."""
    import optax

    enc = CausalCNNEncoder(features=features, embed_dim=embed_dim)
    seqs = jnp.asarray(sequences, jnp.float32)
    params = enc.init(jax.random.PRNGKey(seed), seqs[:1])
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s, key):
        loss, g = jax.value_and_grad(
            lambda pp: triplet_loss(lambda q, b: enc.apply(q, b), pp, seqs, key)
        )(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    key = jax.random.PRNGKey(seed + 1)
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, sub)

    def encode(x):
        return np.asarray(enc.apply(params, jnp.asarray(x, jnp.float32)))

    return encode


def context_fid(encode, real_sequences, fake_sequences) -> float:
    """FCD = Frechet distance between encoded sequence distributions
    (ssar/supervised/context_fid.py:16-69)."""
    return frechet_distance(encode(real_sequences), encode(fake_sequences))
