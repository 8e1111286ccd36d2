"""Mesh-sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssar_tpu.parallel.mesh import data_sharding, get_mesh, make_mesh, replicate, shard_batch

SR, FPS = 24576, 24


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = get_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_places_on_devices(rng):
    mesh = get_mesh()
    x = jnp.asarray(rng.randn(16, 4).astype(np.float32))
    xs = shard_batch(x, mesh)
    assert xs.sharding.is_fully_replicated is False
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_replicate(rng):
    tree = {"a": jnp.ones(3), "b": [jnp.zeros((2, 2))]}
    rep = replicate(tree, get_mesh())
    assert rep["a"].sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_training_step_matches_single_device(rng):
    """The DP-sharded train step must produce the same loss as unsharded."""
    import optax

    from ssar_tpu.models.reactor import LatentNoiseReactor
    from ssar_tpu.train.train import make_train_step

    F, T, B = 59, 16, 8
    model = LatentNoiseReactor(jnp.zeros(F), jnp.ones(F), None, decoder="learned",
                               backbone="mlp", hidden_size=8, num_layers=1, residual=False)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    opt = optax.adam(1e-3)
    step, *_ = make_train_step(model, opt, "supervised")

    batch_np = (rng.randn(B, T, F).astype(np.float32),
                rng.randn(B, T, 18, 512).astype(np.float32),
                *[rng.randn(B, T, s, s).astype(np.float32) for s in (4, 8, 16, 32)])
    key = jax.random.PRNGKey(0)

    batch_single = tuple(jnp.asarray(b) for b in batch_np)
    _, _, loss_single, _ = step(params, opt.init(params), batch_single, key)

    mesh = get_mesh()
    batch_sharded = tuple(shard_batch(jnp.asarray(b), mesh) for b in batch_np)
    p_rep = replicate(params, mesh)
    _, _, loss_sharded, _ = step(p_rep, opt.init(p_rep), batch_sharded, key)

    np.testing.assert_allclose(float(loss_single), float(loss_sharded), rtol=1e-4)


@pytest.mark.slow
def test_sharded_synthesis_matches(rng):
    from ssar_tpu.gan import stylegan2 as sg

    cfg = sg.StyleGAN2Config(resolution=32)
    params = sg.init_generator(jax.random.PRNGKey(0), cfg)
    z = jnp.asarray(rng.randn(8, 512).astype(np.float32))
    img_single = sg.generate(params, z, cfg)

    mesh = get_mesh()
    img_sharded = sg.generate(replicate(params, mesh), shard_batch(z, mesh), cfg)
    np.testing.assert_allclose(np.asarray(img_single), np.asarray(img_sharded), atol=2e-3)


@pytest.mark.slow
def test_sequence_parallel_features_match_all_columns(rng):
    """SP feature extraction (two-pass): EVERY feature column — including
    pulse and drop-strength, whose whole-track context now runs globally in
    pass 2 — matches the unsharded pipeline, with full clamp+smooth
    postprocessing on."""
    from ssar_tpu.audio.features import audio2features
    from ssar_tpu.parallel.features_sp import audio2features_sharded

    # 16 s: long enough that the 2-device chunking is non-degenerate
    # (each chunk [fpc=192 + 2*64 halo] < T=384, with a real interior
    # boundary at frame 192 and both track edges chunk-aligned)
    L = SR * 16
    t = np.arange(L) / SR
    au = (0.4 * np.sin(2 * np.pi * 440 * t)
          + 0.05 * rng.randn(L)).astype(np.float32)
    au[:: SR // 2] += 1.0

    full = np.asarray(audio2features(jnp.asarray(au), SR, FPS, tuning=0.0))
    sp = np.asarray(audio2features_sharded(jnp.asarray(au), SR, FPS, mesh=get_mesh(2),
                                           tuning=0.0))
    assert sp.shape == full.shape
    blocks = {"mfcc": range(0, 20), "chroma": range(20, 32), "tonnetz": range(32, 38),
              "contrast": range(38, 45), "flatness": range(45, 46), "onsets": range(46, 50),
              "pulse": range(50, 51), "rms": range(51, 55), "drop_strength": range(55, 59)}
    for name, cols in blocks.items():
        cols = list(cols)
        scale = np.abs(full[:, cols]).max() + 1e-6
        err = np.abs(sp[:, cols] - full[:, cols]).max()
        assert err < 0.01 * scale, (name, err / scale)


@pytest.mark.slow
def test_multichip_dryrun_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_tensor_parallel_synthesis_matches_single_device():
    from jax.sharding import Mesh

    from ssar_tpu.gan import stylegan2 as sg
    from ssar_tpu.parallel.synthesis_tp import synthesize_tp

    cfg = sg.StyleGAN2Config(resolution=32)
    params = sg.init_generator(jax.random.PRNGKey(0), cfg)
    B = 4
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.n_latent, 512))
    noises = [jax.random.normal(jax.random.PRNGKey(i), (B, h, w, 1))
              for i, (h, w) in enumerate(cfg.noise_shapes())]

    ref = sg.synthesis(params, lat, noises, cfg)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), axis_names=("data", "tp"))
    out = synthesize_tp(params, lat, noises, cfg, mesh, dtype=jnp.float32)
    assert float(jnp.abs(ref - out).max()) < 1e-3


@pytest.mark.slow
def test_long_form_chunked_features_match(rng):
    """audio2features_long (host loop over fixed chunks, single chip)
    reproduces the unsharded stack exactly — the long-form production path
    (bench.py --longform)."""
    from ssar_tpu.audio.features import audio2features
    from ssar_tpu.parallel.features_sp import audio2features_long

    L = SR * 16
    t = np.arange(L) / SR
    au = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.randn(L)).astype(np.float32)
    au[:: SR // 2] += 1.0

    full = np.asarray(audio2features(jnp.asarray(au), SR, FPS, tuning=0.0))
    lng = np.asarray(audio2features_long(jnp.asarray(au), SR, FPS, chunk_frames=192, tuning=0.0))
    assert lng.shape == full.shape
    err = np.abs(lng - full).max()
    assert err < 0.01 * (np.abs(full).max() + 1e-6), err
