"""Tests for the in-environment calibration G (train/palette_g.py) and the
ssopt amplitude prior (generate/optimize.py lambda_amplitude).

The calibration G exists to fix the study scorer's measured blindness to
palette-mixing reactivity under a random-weight G (docs/STUDY.md r4 §1);
the amplitude prior fixes ssopt's diagnosed 25x under-movement (§4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssar_tpu.gan.stylegan2 import StyleGAN2Config
from ssar_tpu.train.palette_g import (palette_identity_spread, palette_target_alignment,
                                      procedural_targets, target_basis,
                                      train_calibration_g)


def test_procedural_targets_shape_range_and_smoothness():
    P = target_basis()
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 512))
    t = procedural_targets(w, P, 32)
    assert t.shape == (4, 32, 32, 3)
    assert float(t.min()) >= -1.0 and float(t.max()) <= 1.0
    # smooth in W: a small latent perturbation moves pixels a little
    t2 = procedural_targets(w + 0.01 * jax.random.normal(jax.random.PRNGKey(1), w.shape), P, 32)
    assert float(jnp.abs(t - t2).mean()) < 0.05
    # distinct latents produce distinct palettes
    mean_col = t.mean(axis=(1, 2))
    d = jnp.linalg.norm(mean_col[:, None] - mean_col[None], axis=-1)
    assert float(d.sum() / (4 * 3)) > 0.1


def test_convex_w_mixture_renders_intermediate_palette():
    """The chroma recipe mixes palette latents convexly (metrics/generate.py
    high_chroma): the target construction must map the midpoint latent to a
    palette between the endpoints."""
    P = target_basis()
    w = jax.random.normal(jax.random.PRNGKey(2), (2, 512))
    mid = 0.5 * (w[0] + w[1])
    cols = procedural_targets(jnp.stack([w[0], mid, w[1]]), P, 16).mean(axis=(1, 2))
    d02 = float(jnp.linalg.norm(cols[0] - cols[2]))
    d01 = float(jnp.linalg.norm(cols[0] - cols[1]))
    d12 = float(jnp.linalg.norm(cols[1] - cols[2]))
    assert d01 < d02 and d12 < d02


def test_train_calibration_g_reduces_mse_and_aligns_palette():
    cfg = StyleGAN2Config(resolution=16, max_channels=32)
    params, _, losses = train_calibration_g(cfg, n_steps=60, batch_size=8, chunk=20,
                                            lambda_adv=0.0, r1_gamma=0.0, progress=False)
    assert losses["mse"][-1] < losses["mse"][0]
    # a random-init G renders varied but W-UNSTRUCTURED colors (alignment
    # ~0); training makes color identity a consistent function of W
    init = jax.jit(__import__("ssar_tpu.gan.stylegan2", fromlist=["init_generator"])
                   .init_generator, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    a_init = palette_target_alignment(init, cfg)
    a_trained = palette_target_alignment(params, cfg)
    # a_init is an arbitrary fixed overlap of two random rank-3-ish maps
    # (measured ~-0.7 for this (G, P) realization) — only the TRAINED value
    # is meaningful: a strongly positive, consistent color<-W map
    assert a_trained > 0.6
    assert a_trained > a_init + 0.3


def test_mapping_stays_frozen_during_calibration_training():
    cfg = StyleGAN2Config(resolution=16, max_channels=32)
    from ssar_tpu.gan.stylegan2 import init_generator

    init = jax.jit(init_generator, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    params, _, _ = train_calibration_g(cfg, n_steps=6, batch_size=4, chunk=3,
                                       lambda_adv=0.0, r1_gamma=0.0, progress=False)
    for a, b in zip(jax.tree.leaves(init["mapping"]), jax.tree.leaves(params["mapping"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_calibration_g_npz_roundtrip(tmp_path):
    from ssar_tpu.gan.convert import load_npz, save_npz
    from ssar_tpu.gan.stylegan2 import init_generator, synthesis, w_to_wplus, mapping

    cfg = StyleGAN2Config(resolution=16, max_channels=64)
    params = jax.jit(init_generator, static_argnums=1)(jax.random.PRNGKey(3), cfg)
    f16 = jax.tree.map(lambda a: np.asarray(a, np.float16), params)
    save_npz(str(tmp_path / "g.npz"), f16)
    loaded = load_npz(str(tmp_path / "g.npz"))
    # f16 storage promotes back to f32 on load
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(loaded))
    z = jax.random.normal(jax.random.PRNGKey(4), (2, 512))
    img_a = synthesis(params, w_to_wplus(mapping(params, z, cfg), cfg), None, cfg)
    img_b = synthesis(loaded, w_to_wplus(mapping(loaded, z, cfg), cfg), None, cfg)
    assert float(jnp.abs(img_a - img_b).max()) < 0.05  # f16 round-off only


def test_optimize_amplitude_prior_increases_latent_step():
    """lambda_amplitude pins mean |Δlatent| near target_latent_step while the
    objective still optimizes (VERDICT r4 item 2)."""
    from ssar_tpu.generate.optimize import optimize

    sr = 1024 * 6
    t = np.arange(sr * 2) / sr
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    audio[:: sr // 2] += 1.0
    cfg = StyleGAN2Config(resolution=32, max_channels=64)
    steps = {}
    for lam in (0.0, 100.0):
        _, latents, _, losses = optimize(
            audio=audio, sr=sr, fps=6, n_steps=16, n_params=64, log_steps=8,
            gan_config=cfg, objective="procrustes", norm_grads=False,
            n_latent_split=1, n_latent_groups=1, n_latent_per_group=3, n_noise=2,
            lambda_amplitude=lam, target_latent_step=0.048)
        lat = np.asarray(latents).reshape(latents.shape[0], -1)
        steps[lam] = float(np.mean(np.abs(np.diff(lat, axis=0))))
        assert losses[-1] < losses[0]
    assert steps[100.0] > 2 * steps[0.0]
    # 16 steps only partially closes on the 0.048 target (measured 0.016 at
    # this tiny config); direction and magnitude-vs-baseline are the test
    assert steps[100.0] > 0.012


def test_laplacian_segmentation_np_matches_jnp():
    """The host numpy segmentation (MIR path) agrees with the traced jnp
    version: identical shapes, labels agree on the overwhelming majority of
    frames (float-path differences only flip near-boundary beats)."""
    from ssar_tpu.audio.segment import laplacian_segmentation, laplacian_segmentation_np

    rng = np.random.RandomState(0)
    T, C = 240, 12
    env = np.repeat(rng.rand(6, C), 40, axis=0) + 0.05 * rng.rand(T, C)  # sectioned
    beats = list(range(7, T, 8))
    ks = (2, 4, 6)
    segs_np = laplacian_segmentation_np(env.astype(np.float32), beats, ks=ks)
    segs_j = laplacian_segmentation(jnp.asarray(env, jnp.float32), beats, ks=ks)
    from scipy.optimize import linear_sum_assignment

    for s_np, s_j, k in zip(segs_np, segs_j, ks):
        assert s_np.shape == (T, k) and s_j.shape == (T, k)
        a = np.argmax(s_np, 1)
        b = np.asarray(jnp.argmax(s_j, 1))
        # k-means labelings are defined up to permutation (different float
        # paths converge to relabeled clusterings); align by max-overlap
        conf = np.zeros((k, k))
        for i, j in zip(a, b):
            conf[i, j] += 1
        rows, cols = linear_sum_assignment(-conf)
        agree = conf[rows, cols].sum() / len(a)
        assert agree > 0.85, f"k={k}: only {agree:.2%} label agreement after alignment"


def test_discriminator_extractor_shapes_and_sensitivity():
    """metrics/ood.py discriminator_extractor: (N, H, W, 3) -> (N, 512)
    penultimate features, and distinct image distributions map to distinct
    feature statistics (mechanism test; the absolute run of record is
    docs/ood_absolute.json through the TRAINED calibration D)."""
    from ssar_tpu.gan.discriminator import Discriminator
    from ssar_tpu.metrics.ood import discriminator_extractor, frechet_distance

    D = Discriminator(resolution=32, channel_multiplier=1)
    dp = D.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    ex = discriminator_extractor(dp, resolution=32, batch_size=8)
    a = ex(jnp.clip(jax.random.uniform(jax.random.PRNGKey(1), (12, 32, 32, 3)), 0, 1))
    b = ex(jnp.zeros((12, 32, 32, 3)) + 0.9)
    assert a.shape == (12, 512) and b.shape == (12, 512)
    same = frechet_distance(a[:6], a[6:])
    diff = frechet_distance(a, b)
    assert diff > same


def test_env_guard_eps_bounds_decoder_output():
    """FixedLatentNoiseDecoder env_guard_eps (opt-in; 0 = reference-exact
    latent_n_noise2.py:151): near-zero envelope sums explode the unguarded
    decoder and stay bounded with the guard — the measured root cause of
    the h3 record cell's instability (docs/GRID.md r5)."""
    from ssar_tpu.models.reactor import FixedLatentNoiseDecoder

    pal = jnp.asarray(np.random.RandomState(0).randn(9, 18, 512), jnp.float32)
    x_tiny = jnp.full((1, 4, 3 * 3 + 4), 1e-6)  # envelope sums ~3e-6
    outs = {}
    for eps in (0.0, 1e-2):
        dec = FixedLatentNoiseDecoder(pal, 3, 3, 2, env_guard_eps=eps)
        (lat, _), _ = dec.init_with_output(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x_tiny)
        outs[eps] = float(jnp.abs(lat).max())
    assert outs[0.0] > 100 * outs[1e-2]  # unguarded explodes relative to guarded
    # away from the singularity the guard is a no-op (same outputs)
    x_ok = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (1, 4, 13))) + 0.5
    lats = {}
    for eps in (0.0, 1e-2):
        dec = FixedLatentNoiseDecoder(pal, 3, 3, 2, env_guard_eps=eps)
        (lat, _), _ = dec.init_with_output(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x_ok)
        lats[eps] = np.asarray(lat)
    np.testing.assert_allclose(lats[0.0], lats[1e-2], rtol=1e-6)
