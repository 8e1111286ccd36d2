"""Self-supervised model family: StyleVideoGAN, LSTMReactor, patch contrastive.

Equivalents of ssar/models/stylevideogan.py (latent-trajectory GAN over
pre-extracted W+ sequences), ssar/models/reactor.py (layer-norm LSTM with
zoneout returning per-layer hidden-state sequences), and
ssar/models/patch_contrastive.py (PatchNCE-style contrastive loss between
sequence patches).  TPU: LSTMs are lax.scan; patch sampling uses static
patch counts with jax.random index draws.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------- StyleVideoGAN --
class PixelNorm(nn.Module):
    def __call__(self, x):
        return x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + 1e-8)


class StyleVideoGenerator(nn.Module):
    """Seed trajectory s (B, L, latent_dim) -> W+ sequences (B, L, n_styles, 512)
    (stylevideogan.py:17-101): an MLP maps the first frame to per-layer GRU
    initial states, a 4-layer GRU rolls the trajectory, a shared trunk +
    per-style heads emit W+ rows."""

    n_styles: int = 18
    latent_dim: int = 32

    @nn.compact
    def __call__(self, s):
        B, L, D = s.shape
        i = s[:, 0]

        h = i
        for width in (64, 64, 96, 96):
            h = nn.leaky_relu(nn.Dense(width)(h))
        h = nn.LayerNorm(use_bias=False, use_scale=False)(h)
        h0 = jnp.split(h, 3, axis=-1) + [i]  # 4 per-layer initial states

        x = s[:, 1:]
        outs = []
        for layer in range(4):
            cell = nn.GRUCell(D)
            x = nn.RNN(cell)(x, initial_carry=h0[layer][:, :D] if h0[layer].shape[-1] >= D
                             else jnp.pad(h0[layer], ((0, 0), (0, D - h0[layer].shape[-1]))))
        traj = jnp.concatenate([i[:, None], x], axis=1)  # (B, L, D)

        t = traj.reshape(B * L, D)
        t = PixelNorm()(nn.LayerNorm()(t))
        for width in (64, 128, 256, 512):
            t = nn.leaky_relu(nn.Dense(width)(t))
        t = nn.LayerNorm()(t)

        styles = [nn.LayerNorm()(nn.leaky_relu(nn.Dense(512)(t))) for _ in range(self.n_styles)]
        lw = jnp.stack(styles, axis=1).reshape(B, L, self.n_styles, 512)
        return lw


class StyleVideoDiscriminator(nn.Module):
    """(B, L, n_styles, 512) -> (B,) realness (stylevideogan.py:103-140)."""

    seq_len: int = 24
    n_styles: int = 18
    latent_dim: int = 32

    @nn.compact
    def __call__(self, lw):
        B, L = lw.shape[:2]
        e = lw.reshape(B * L, self.n_styles * 512)
        for width in (self.n_styles * 256, self.n_styles * 128, self.n_styles * 64,
                      self.n_styles * 32, self.n_styles * 16, self.latent_dim):
            e = nn.leaky_relu(nn.Dense(width)(e))
        e = e.reshape(B, L, self.latent_dim)
        h = nn.Conv(64, (5,), strides=(2,), padding="SAME")(e)
        h = nn.leaky_relu(h)
        h = nn.Conv(128, (5,), strides=(2,), padding="SAME")(h)
        h = nn.leaky_relu(h)
        return jnp.tanh(nn.Dense(1)(h.reshape(B, -1)))[:, 0]


# ------------------------------------------------------------ LSTMReactor --
class ZoneoutLSTMCell(nn.Module):
    """LayerNorm LSTM cell with zoneout regularisation (the reference uses
    haste's LayerNormLSTM, reactor.py:57-68)."""

    features: int
    zoneout: float = 0.0

    @nn.compact
    def __call__(self, carry, x, *, deterministic: bool = True):
        h, c = carry
        gates = nn.Dense(4 * self.features)(jnp.concatenate([x, h], axis=-1))
        gates = nn.LayerNorm()(gates)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        if self.zoneout > 0 and not deterministic:
            mask = jax.random.bernoulli(self.make_rng("zoneout"), self.zoneout, new_h.shape)
            new_h = jnp.where(mask, h, new_h)
            new_c = jnp.where(mask, c, new_c)
        return (new_h, new_c), new_h


class Hidden2Style(nn.Module):
    """Hidden states -> per-style W+ rows (reactor.py:10-48)."""

    n_styles: int = 18

    @nn.compact
    def __call__(self, h):
        styles = [nn.Dense(512)(nn.leaky_relu(nn.Dense(512)(h))) for _ in range(self.n_styles)]
        return jnp.stack(styles, axis=2)  # (B, T, n_styles, 512)


class LSTMReactor(nn.Module):
    """(B, T, F) features + music embedding m (B, D) -> (W+ sequences,
    per-layer output sequences, per-layer final cell states)
    (reactor.py:51-81)."""

    hidden_size: int = 32
    num_layers: int = 4
    n_styles: int = 18
    zoneout: float = 0.0

    @nn.compact
    def __call__(self, x, m, deterministic: bool = True):
        B = x.shape[0]
        inter_l, inter_h = [], []
        l = x
        for layer in range(self.num_layers):
            cell = ZoneoutLSTMCell(self.hidden_size, self.zoneout)
            m_state = jnp.broadcast_to(m[:, : self.hidden_size], (B, self.hidden_size))

            def scan_fn(cell_, carry, xt):
                return cell_(carry, xt, deterministic=deterministic)

            carry = (m_state, m_state)
            scan = nn.scan(scan_fn, variable_broadcast="params",
                           split_rngs={"params": False, "zoneout": True},
                           in_axes=1, out_axes=1)
            carry, l = scan(cell, carry, l)
            inter_l.append(l)
            inter_h.append(carry[1])
        return Hidden2Style(self.n_styles)(l), jnp.stack(inter_l), jnp.stack(inter_h)


# ------------------------------------------------------ patch contrastive --
def sample_patches_1d(key, seq: jax.Array, n_patches: int, patch_len: int):
    """(B, T, D) -> (B * n_patches, patch_len * D) random temporal crops
    (patch_contrastive.py:10-32)."""
    B, T, D = seq.shape
    starts = jax.random.randint(key, (B, n_patches), 0, T - patch_len + 1)
    idx = starts[..., None] + jnp.arange(patch_len)[None, None, :]
    patches = jnp.take_along_axis(seq[:, None], idx[..., None], axis=2)
    return patches.reshape(B * n_patches, patch_len * D)


class PatchContrastor(nn.Module):
    """PatchNCE loss between two patch sets (patch_contrastive.py:126-186):
    both are MLP-projected to an embedding, matching indices are positives,
    all others negatives, InfoNCE with temperature tau."""

    embed_dim: int = 128
    tau: float = 0.07

    @nn.compact
    def __call__(self, a, b):
        def proj(x, name):
            h = nn.leaky_relu(nn.Dense(256, name=f"{name}_1")(x))
            h = nn.Dense(self.embed_dim, name=f"{name}_2")(h)
            return h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-8)

        za = proj(a, "a")
        zb = proj(b, "b")
        logits = za @ zb.T / self.tau
        labels = jnp.arange(za.shape[0])
        return jnp.mean(
            optax_softmax_cross_entropy(logits, labels)
            + optax_softmax_cross_entropy(logits.T, labels)
        ) / 2


def optax_softmax_cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


# ----------------------------------------------------------- inference --
def sslstm_features(audio: jax.Array, sr: int) -> jax.Array:
    """The contrastive-LSTM input features: norm-normalised mfcc(19) +
    chroma CENS(12) + onset strength(1) = (T, 32)
    (ssar/selfsupervised/inference.py:37-46, train_sslstm.py input stack)."""
    from ..audio import features as AF
    from ..audio.beat import onset_strength

    audio = jnp.asarray(audio, jnp.float32)
    m = AF.mfcc(audio, sr, n_mfcc=19)
    c = AF.chromagram(audio, sr)
    o = onset_strength(AF.percussive(audio), sr)[:, None]
    T = min(m.shape[0], c.shape[0], o.shape[0])
    feats = [m[:T], c[:T], o[:T]]
    return jnp.concatenate([f / (jnp.linalg.norm(f) + 1e-12) for f in feats], axis=1)


def sslstm_inference(reactor, params, audio, sr: int, gan_params=None, gan_config=None,
                     out_file: str | None = None, fps: int = 24, batch_size: int = 8,
                     output_size=(256, 256), seed: int = 0):
    """Trained LSTMReactor -> W+ sequence [-> rendered mp4]
    (ssar/selfsupervised/inference.py:60-95).  Returns (w_seq, out_file)."""
    feats = sslstm_features(audio, int(sr))[None]
    motion_seed = jax.random.normal(jax.random.PRNGKey(seed), (1, reactor.hidden_size))
    w_seq, _, _ = reactor.apply(params, feats, motion_seed)
    w_seq = w_seq[0]

    if out_file is not None and gan_params is not None:
        from ..gan import stylegan2 as sg
        from ..gan.render import render_latents_to_video
        from ..gan.wrapper import StyleGAN2Synthesizer

        syn = StyleGAN2Synthesizer(config=gan_config or sg.StyleGAN2Config())
        syn.params = gan_params
        n_lat = syn.config.n_latent
        w = w_seq[:, :n_lat] if w_seq.shape[1] >= n_lat else jnp.concatenate(
            [w_seq, jnp.repeat(w_seq[:, -1:], n_lat - w_seq.shape[1], axis=1)], axis=1)
        render_latents_to_video(syn, w, None, out_file, fps=fps, batch_size=batch_size,
                                output_size=output_size, progress=False)
    return w_seq, out_file
