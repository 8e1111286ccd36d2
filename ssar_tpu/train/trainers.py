"""Additional trainers: Audio2Latent supervised, PSAGAN, StyleVideoGAN, SS-LSTM.

Equivalents of ssar/supervised/train_a2l.py, ssar/supervised/train_gan.py,
ssar/selfsupervised/train_stylevideogan.py and
ssar/selfsupervised/train_sslstm.py — each as a compact functional trainer
sharing the pjit/data infrastructure of ssar_tpu.train.train.  All steps
are single jitted programs; GAN trainers alternate jitted G/D steps.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ------------------------------------------------------------- a2l (v1) --
def train_audio2latent(dataset, n_steps: int = 200, lr: float = 1e-4, batch_size: int = 8,
                       backbone: str = "gru", hidden_size: int = 32, num_layers: int = 2,
                       seed: int = 0, eval_fcd: bool = False):
    """Supervised W+ regression with the v1 model (train_a2l.py:63-304);
    optionally reports FCD on validation latents."""
    from ..models.audio2latent import Audio2Latent
    from .data import compute_stats

    mean, std = compute_stats(dataset.features)
    model = Audio2Latent(jnp.asarray(mean), jnp.asarray(std), hidden_size=hidden_size,
                         num_layers=num_layers, backbone=backbone)
    x0 = jnp.asarray(dataset.features[:batch_size])
    params = model.init({"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1)}, x0)
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s, feats, lats, key):
        def loss_fn(pp):
            pred = model.apply(pp, feats, deterministic=False, rngs={"dropout": key})
            return jnp.mean((pred - lats) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    batches = dataset.batches(batch_size, seed=seed)
    key = jax.random.PRNGKey(seed)
    losses = []
    for i in range(n_steps):
        feats, lats, *_ = next(batches)
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, jnp.asarray(feats), jnp.asarray(lats), sub)
        losses.append(float(loss))

    metrics = {"final_loss": losses[-1], "losses": losses}
    if eval_fcd:
        from ..metrics.context_fid import context_fid, train_encoder

        real = dataset.latents[:16].reshape(16, dataset.latents.shape[1], -1)[..., :64]
        pred = np.asarray(model.apply(params, jnp.asarray(dataset.features[:16])))
        pred = pred.reshape(16, pred.shape[1], -1)[..., :64]
        enc = train_encoder(np.asarray(real), n_steps=50)
        metrics["fcd"] = context_fid(enc, np.asarray(real), pred)
    return model, params, metrics


# ------------------------------------------------------------------ GAN --
def train_psagan(dataset, n_steps: int = 100, lr: float = 2e-4, batch_size: int = 8,
                 features: int = 32, n_stages: int = 3, seed: int = 0):
    """Progressive latent-sequence GAN (train_gan.py): hinge losses,
    alternating jitted D/G steps, conditioned on audio features."""
    from ..models.psagan import ProgressiveDiscriminator, ProgressiveGenerator

    lat_dim = int(np.prod(dataset.latents.shape[2:]))
    proj = jax.random.normal(jax.random.PRNGKey(7), (lat_dim, 128)) / np.sqrt(lat_dim)

    G = ProgressiveGenerator(out_dim=128, features=features, n_stages=n_stages)
    D = ProgressiveDiscriminator(features=features, n_stages=n_stages)

    feats0 = jnp.asarray(dataset.features[:batch_size])
    gp = G.init(jax.random.PRNGKey(seed), feats0, jax.random.PRNGKey(1))
    fake0 = G.apply(gp, feats0, jax.random.PRNGKey(1))
    dp = D.init(jax.random.PRNGKey(seed + 1), fake0, feats0)

    g_opt, d_opt = optax.adam(lr, b1=0.0, b2=0.99), optax.adam(lr, b1=0.0, b2=0.99)
    g_state, d_state = g_opt.init(gp), d_opt.init(dp)

    @jax.jit
    def d_step(dp, ds, gp, feats, real, key):
        def loss_fn(dpp):
            fake = G.apply(gp, feats, key)
            d_real = D.apply(dpp, real, feats)
            d_fake = D.apply(dpp, fake, feats)
            return jnp.mean(jax.nn.relu(1.0 - d_real)) + jnp.mean(jax.nn.relu(1.0 + d_fake))

        loss, g = jax.value_and_grad(loss_fn)(dp)
        updates, ds = d_opt.update(g, ds, dp)
        return optax.apply_updates(dp, updates), ds, loss

    @jax.jit
    def g_step(gp, gs, dp, feats, key):
        def loss_fn(gpp):
            fake = G.apply(gpp, feats, key)
            return -jnp.mean(D.apply(dp, fake, feats))

        loss, g = jax.value_and_grad(loss_fn)(gp)
        updates, gs = g_opt.update(g, gs, gp)
        return optax.apply_updates(gp, updates), gs, loss

    batches = dataset.batches(batch_size, seed=seed)
    key = jax.random.PRNGKey(seed)
    d_losses, g_losses = [], []
    for i in range(n_steps):
        feats, lats, *_ = next(batches)
        feats = jnp.asarray(feats)
        real = jnp.einsum("btl,lf->btf", jnp.asarray(lats).reshape(*lats.shape[:2], -1), proj)
        key, k1, k2 = jax.random.split(key, 3)
        dp, d_state, dl = d_step(dp, d_state, gp, feats, real, k1)
        gp, g_state, gl = g_step(gp, g_state, dp, feats, k2)
        d_losses.append(float(dl))
        g_losses.append(float(gl))
    return (G, gp), (D, dp), {"d_losses": d_losses, "g_losses": g_losses}


def train_stylevideogan(wplus_sequences: np.ndarray, n_steps: int = 100, lr: float = 2e-4,
                        batch_size: int = 4, latent_dim: int = 32, seed: int = 0):
    """Latent-trajectory GAN over pre-extracted W+ sequences
    (train_stylevideogan.py): non-saturating logistic losses.

    The reference extracts the sequences by inverting video frames with a
    pretrained pSp encoder (train_stylevideogan.py:15,43); the native
    front-end is ``gan.psp.invert_frames`` on a converted checkpoint."""
    from ..models.selfsupervised import StyleVideoDiscriminator, StyleVideoGenerator

    N, L, n_styles, _ = wplus_sequences.shape
    G = StyleVideoGenerator(n_styles=n_styles, latent_dim=latent_dim)
    D = StyleVideoDiscriminator(seq_len=L, n_styles=n_styles, latent_dim=latent_dim)

    s0 = jax.random.normal(jax.random.PRNGKey(0), (batch_size, L, latent_dim))
    gp = G.init(jax.random.PRNGKey(seed), s0)
    dp = D.init(jax.random.PRNGKey(seed + 1), G.apply(gp, s0))
    g_opt, d_opt = optax.adam(lr), optax.adam(lr)
    g_state, d_state = g_opt.init(gp), d_opt.init(dp)

    data = jnp.asarray(wplus_sequences, jnp.float32)

    @jax.jit
    def d_step(dp, ds, gp, real, key):
        def loss_fn(dpp):
            s = jax.random.normal(key, (real.shape[0], L, latent_dim))
            fake = G.apply(gp, s)
            return (jnp.mean(jax.nn.softplus(-D.apply(dpp, real)))
                    + jnp.mean(jax.nn.softplus(D.apply(dpp, fake))))

        loss, g = jax.value_and_grad(loss_fn)(dp)
        updates, ds = d_opt.update(g, ds, dp)
        return optax.apply_updates(dp, updates), ds, loss

    @jax.jit
    def g_step(gp, gs, dp, key):
        def loss_fn(gpp):
            s = jax.random.normal(key, (batch_size, L, latent_dim))
            return jnp.mean(jax.nn.softplus(-D.apply(dp, G.apply(gpp, s))))

        loss, g = jax.value_and_grad(loss_fn)(gp)
        updates, gs = g_opt.update(g, gs, gp)
        return optax.apply_updates(gp, updates), gs, loss

    key = jax.random.PRNGKey(seed)
    rng = np.random.RandomState(seed)
    d_losses, g_losses = [], []
    for i in range(n_steps):
        sel = rng.randint(0, N, batch_size)
        key, k1, k2 = jax.random.split(key, 3)
        dp, d_state, dl = d_step(dp, d_state, gp, data[sel], k1)
        gp, g_state, gl = g_step(gp, g_state, dp, k2)
        d_losses.append(float(dl))
        g_losses.append(float(gl))
    return (G, gp), (D, dp), {"d_losses": d_losses, "g_losses": g_losses}


# ------------------------------------------------------ contrastive LSTM --
def train_sslstm(dataset, n_steps: int = 100, lr: float = 1e-4, batch_size: int = 4,
                 hidden_size: int = 16, num_layers: int = 2, n_patches: int = 8,
                 patch_len: int = 8, seed: int = 0, gan_params=None, gan_config=None,
                 video_patch_weight: float = 0.0):
    """Contrastive LSTM reactor: W+-sequence patches vs audio-feature patches
    (train_sslstm.py:80-200) with the PatchNCE objective.

    With `video_patch_weight > 0` and a frozen generator (gan_params,
    gan_config), intermediate synthesis activations of the predicted W+
    frames are contrasted against the audio patches as well — the
    reference's optional video-patch loss through the frozen G
    (train_sslstm.py:156-176, torchextractor replaced by
    synthesis(return_features=True))."""
    from ..models.selfsupervised import LSTMReactor, PatchContrastor, sample_patches_1d

    F = dataset.features.shape[-1]
    model = LSTMReactor(hidden_size=hidden_size, num_layers=num_layers)
    contrastor = PatchContrastor()

    x0 = jnp.asarray(dataset.features[:batch_size])
    m0 = jnp.zeros((batch_size, hidden_size))
    mp = model.init({"params": jax.random.PRNGKey(seed), "zoneout": jax.random.PRNGKey(1)}, x0, m0)
    w0, _, _ = model.apply(mp, x0, m0)
    pa0 = sample_patches_1d(jax.random.PRNGKey(0), w0.reshape(batch_size, w0.shape[1], -1),
                            n_patches, patch_len)
    pb0 = sample_patches_1d(jax.random.PRNGKey(0), x0, n_patches, patch_len)
    cp = contrastor.init(jax.random.PRNGKey(seed + 1), pa0, pb0)

    params = {"model": mp, "contrastor": cp}
    video_contrastor = None
    if video_patch_weight > 0 and gan_params is not None:
        from ..gan import stylegan2 as _sg

        _gcfg = gan_config or _sg.StyleGAN2Config(resolution=64)
        _, gfeats0 = _sg.synthesis(gan_params, w0[:, :2].reshape(-1, w0.shape[2], w0.shape[3]),
                                   None, _gcfg, return_features=True, output_size=32)
        pooled0 = jnp.concatenate([jnp.mean(f.astype(jnp.float32), axis=(1, 2)) for f in gfeats0], -1)
        pooled0 = pooled0.reshape(batch_size, -1)
        pv0 = jnp.repeat(pooled0, n_patches, axis=0)[: pb0.shape[0]]
        video_contrastor = PatchContrastor()
        params["video_contrastor"] = video_contrastor.init(jax.random.PRNGKey(seed + 2), pv0, pb0)
    opt = optax.adam(lr)
    state = opt.init(params)

    if video_patch_weight > 0:
        from ..gan import stylegan2 as sg

        gcfg = gan_config or sg.StyleGAN2Config(resolution=64)

    @jax.jit
    def step(p, s, feats, key):
        def loss_fn(pp):
            m = jnp.zeros((feats.shape[0], hidden_size))
            w, _, _ = model.apply(pp["model"], feats, m)
            k1, k2 = jax.random.split(key)
            pa = sample_patches_1d(k1, w.reshape(feats.shape[0], w.shape[1], -1),
                                   n_patches, patch_len)
            pb = sample_patches_1d(k1, feats, n_patches, patch_len)
            loss = contrastor.apply(pp["contrastor"], pa, pb)
            if video_contrastor is not None:
                # render a couple of predicted frames through the frozen G;
                # contrast pooled intermediate activations with audio patches
                frame_idx = jax.random.randint(k2, (2,), 0, w.shape[1])
                wf = w[:, frame_idx].reshape(-1, w.shape[2], w.shape[3])
                _, gfeats = sg.synthesis(jax.lax.stop_gradient(gan_params), wf, None, gcfg,
                                         return_features=True, output_size=32)
                pooled = jnp.concatenate(
                    [jnp.mean(f.astype(jnp.float32), axis=(1, 2)) for f in gfeats], axis=-1)
                pooled = pooled.reshape(feats.shape[0], -1)
                pv = jnp.repeat(pooled, n_patches, axis=0)[: pb.shape[0]]
                loss = loss + video_patch_weight * video_contrastor.apply(pp["video_contrastor"], pv, pb)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    batches = dataset.batches(batch_size, seed=seed)
    key = jax.random.PRNGKey(seed)
    losses = []
    for i in range(n_steps):
        feats, *_ = next(batches)
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, jnp.asarray(feats), sub)
        losses.append(float(loss))
    return model, params, {"losses": losses}
