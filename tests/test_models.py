"""Model-layer tests: backbones, decoders, S4D, HiPPO, losses, training step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssar_tpu.models import HiPPOTimeseries, LatentNoiseReactor
from ssar_tpu.models.s4 import S4DLayer, s4d_conv, s4d_kernel, s4d_step
from ssar_tpu.train.losses import (
    audio_reactive_loss,
    normalize_gradients,
    orthogonal_procrustes_distance,
)

B, T, F = 2, 32, 59


@pytest.fixture
def palette(rng):
    return jnp.asarray(rng.randn(36, 18, 512).astype(np.float32))


@pytest.mark.parametrize("backbone", ["gru", "lstm", "conv", "mlp", "transformer",
                                      pytest.param("sashimi", marks=pytest.mark.slow)])
def test_reactor_backbones(rng, palette, backbone):
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    model = LatentNoiseReactor(jnp.zeros(F), jnp.ones(F), palette, backbone=backbone,
                               hidden_size=12, num_layers=2)
    params = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    lat, noise = model.apply(params, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert lat.shape == (B, T, 18, 512)
    assert [n.shape[-1] for n in noise] == [4, 8, 16, 32]
    assert np.isfinite(np.asarray(lat)).all()


@pytest.mark.slow
def test_reactor_learned_decoder_and_envelopes(rng):
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    model = LatentNoiseReactor(jnp.zeros(F), jnp.ones(F), None, decoder="learned",
                               backbone="gru", hidden_size=16, num_layers=2)
    params = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    lat, noise = model.apply(params, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert lat.shape == (B, T, 18, 512)
    env = model.apply(params, x, return_envelopes=True, rngs={"noise": jax.random.PRNGKey(2)})
    assert env.shape == (B, T, 16)


def test_reactor_conv3d_noise_pyramid(rng):
    """v1 Reactor noise mode (latent_n_noise.py:80-108): 3-D-conv upsampler
    pyramid produces the 4-level pyramid deterministically from content —
    same input, same noise; gradients flow into the Conv3d stack."""
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    model = LatentNoiseReactor(jnp.zeros(F), jnp.ones(F), None, decoder="learned",
                               backbone="transformer", hidden_size=16, num_layers=1,
                               noise_mode="conv3d", residual=False)
    params = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    lat, noise = model.apply(params, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert lat.shape == (B, T, 18, 512)
    assert [n.shape[-2:] for n in noise] == [(4, 4), (8, 8), (16, 16), (32, 32)]
    # deterministic: no "noise" rng collection involved
    lat2, noise2 = model.apply(params, x, rngs={"noise": jax.random.PRNGKey(99)})
    np.testing.assert_array_equal(np.asarray(noise[2]), np.asarray(noise2[2]))

    def loss(p):
        _, n = model.apply(p, x, rngs={"noise": jax.random.PRNGKey(2)})
        return sum(jnp.mean(jnp.abs(ni)) for ni in n)

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_residual_zero_mean(rng, palette):
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    model = LatentNoiseReactor(jnp.zeros(F), jnp.ones(F), palette, residual=True,
                               backbone="mlp", hidden_size=12, num_layers=1)
    params = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    lat, _ = model.apply(params, x, rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(jnp.mean(lat, axis=1)), 0, atol=1e-4)


@pytest.mark.slow
def test_s4d_conv_matches_step(rng):
    """FFT convolution mode and recurrent step mode must agree — the
    contract behind the reference's streaming generation (sashimi.py:374-434)."""
    H, N, L = 4, 16, 24
    layer = S4DLayer(H, N)
    u = jnp.asarray(rng.randn(1, L, H).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), u)
    y_conv = layer.apply(params, u)

    p = params["params"]
    A_re = -jnp.exp(jnp.log(-jnp.minimum(p["A_re"], -1e-4)))
    z = jnp.zeros((H, N // 2), jnp.float32)
    state = (z, z)  # (re, im) split state — no complex dtypes on device
    ys = []
    for t in range(L):
        state, y = s4d_step(state, u[0, t], p["log_dt"], A_re, p["A_im"], p["C_re"], p["C_im"], p["D"])
        ys.append(y)
    y_step = jnp.stack(ys)[None]
    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_step), rtol=1e-3, atol=1e-4)


def test_s4d_kernel_finite_and_decaying():
    H, N, L = 2, 8, 512
    log_dt = jnp.log(jnp.full((H,), 1e-2))
    A_re = -0.5 * jnp.ones((H, N // 2))
    A_im = jnp.broadcast_to(np.pi * jnp.arange(N // 2), (H, N // 2)).astype(jnp.float32)
    C_re = jnp.ones((H, N // 2)) * 0.1
    C_im = jnp.zeros((H, N // 2))
    K = s4d_kernel(log_dt, A_re, A_im, C_re, C_im, L)
    assert np.isfinite(np.asarray(K)).all()
    assert np.abs(np.asarray(K)[:, -1]).max() < np.abs(np.asarray(K)[:, 0]).max()


def test_hippo_reconstruction(rng):
    T = 96
    t = np.linspace(0, 1, T)
    f = np.stack([np.sin(2 * np.pi * 3 * t), t], 1).astype(np.float32)
    h = HiPPOTimeseries(T, 2, N=128, padding=32)
    params = h.init_params(jnp.asarray(f))
    rec = np.asarray(h.decode(params))
    assert rec.shape == (T, 2)
    assert np.abs(rec - f)[8:-8].mean() < 0.15


def test_hippo_parallel_unroll_matches_scan(rng):
    """The blocked parallel LegS encode (MXU counterpart of the reference's
    parallel variable_unroll, ssar/models/hippo/unroll.py:236-453) is exact:
    it matches the sequential lax.scan encode, including the ragged final
    chunk, and HiPPOTimeseries auto-selects it for long tracks."""
    from ssar_tpu.models.hippo import (encode_leg_s, encode_leg_s_parallel,
                                       init_leg_s)

    T, C, N = 203, 3, 48  # T deliberately not a multiple of the block size
    A, B, _ = init_leg_s(N, max_length=T)
    f = jnp.asarray(rng.randn(T, C).astype(np.float32))
    seq = np.asarray(encode_leg_s(f, A, B))
    par = np.asarray(encode_leg_s_parallel(f, A, B, block=64))
    assert np.allclose(par, seq, atol=1e-4), np.abs(par - seq).max()

    h = HiPPOTimeseries(2100, 1, N=48, padding=16)  # T_pad > 2048, N <= 64 -> parallel
    t = np.linspace(0, 1, 2100)
    f = np.sin(2 * np.pi * 5 * t)[:, None].astype(np.float32)
    rec = np.asarray(h.decode(h.init_params(jnp.asarray(f))))
    assert np.abs(rec - f)[64:-64].mean() < 0.15


def test_hippo_optimizable(rng):
    """Gradients flow through decode to the coefficients."""
    T = 48
    target = jnp.asarray(np.sin(np.linspace(0, 6, T))[:, None].astype(np.float32))
    h = HiPPOTimeseries(T, 1, N=64, padding=16)
    params = h.init_params(jnp.zeros((T, 1)))

    def loss(p):
        return jnp.mean((h.decode(p) - target) ** 2)

    import optax

    opt = optax.adam(0.1)
    state = opt.init(params)
    l0 = float(loss(params))
    for _ in range(20):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss(params)) < l0 * 0.5


def test_procrustes_properties(rng):
    x = jnp.asarray(rng.randn(T, 8).astype(np.float32))
    # identical (up to rotation) -> distance ~ 0
    Q, _ = np.linalg.qr(rng.randn(8, 8))
    d_same = float(orthogonal_procrustes_distance(x, x @ jnp.asarray(Q.astype(np.float32))))
    d_rand = float(orthogonal_procrustes_distance(x, jnp.asarray(rng.randn(T, 8).astype(np.float32))))
    assert d_same < 0.05
    assert d_rand > d_same + 0.1


def test_audio_reactive_loss_shape(rng):
    lat = jnp.asarray(rng.randn(B, T, 18, 512).astype(np.float32))
    noise = [jnp.asarray(rng.randn(B, T, s, s).astype(np.float32)) for s in (4, 8)]
    feats = jnp.asarray(rng.randn(B, T, 59).astype(np.float32))
    loss = audio_reactive_loss([lat] + noise, [feats])
    assert loss.shape == (B,)


def test_normalize_gradients():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    g = jax.grad(lambda a: jnp.sum(normalize_gradients(a, 2.0) * 100.0))(x)
    np.testing.assert_allclose(float(jnp.linalg.norm(g)), 2.0, rtol=1e-5)


@pytest.mark.slow
def test_training_step_decreases_loss(rng):
    """A few supervised steps on the learnable synthetic task reduce loss."""
    import optax

    from ssar_tpu.train.data import compute_stats, synthetic_dataset
    from ssar_tpu.train.train import make_train_step

    ds = synthetic_dataset(n_windows=16, n_frames=24)
    mean, std = compute_stats(ds.features)
    model = LatentNoiseReactor(jnp.asarray(mean), jnp.asarray(std), None, decoder="learned",
                               backbone="mlp", hidden_size=16, num_layers=1, residual=False)
    x = jnp.asarray(ds.features[:4])
    params = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)
    train_step, *_ = make_train_step(model, opt, "supervised")

    batch = tuple(jnp.asarray(b) for b in next(ds.batches(4, seed=0)))
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(10):
        params, opt_state, loss, key = train_step(params, opt_state, batch, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_scan_steps_match_individual_steps(rng):
    """K fused lax.scan steps (train_step_scan) produce the same params,
    opt state, key, and per-step losses as K individual gather steps."""
    import optax

    from ssar_tpu.train.data import compute_stats, synthetic_dataset
    from ssar_tpu.train.train import make_train_step

    ds = synthetic_dataset(n_windows=12, n_frames=24)
    mean, std = compute_stats(ds.features)
    model = LatentNoiseReactor(jnp.asarray(mean), jnp.asarray(std), None, decoder="learned",
                               backbone="mlp", hidden_size=16, num_layers=1, residual=False)
    x = jnp.asarray(ds.features[:4])
    params = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    opt = optax.adam(2e-3)
    _, step_gather, _, step_scan = make_train_step(model, opt, "supervised")

    data = tuple(jnp.asarray(a) for a in (ds.features, ds.latents, *ds.noises))
    K, B = 4, 3
    sels = jnp.asarray(rng.randint(0, data[0].shape[0], size=(K, B)), jnp.int32)
    key0 = jax.random.PRNGKey(7)

    pa, oa, ka = params, opt.init(params), key0
    losses_a = []
    for i in range(K):
        pa, oa, loss, ka = step_gather(pa, oa, data, sels[i], ka)
        losses_a.append(float(loss))

    pb, ob, losses_b, kb = step_scan(params, opt.init(params), data, sels, key0)
    np.testing.assert_allclose(np.asarray(losses_b), losses_a, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_selfsupervised_and_ssabsdiff_steps(rng):
    import optax

    from ssar_tpu.train.data import compute_stats, synthetic_dataset
    from ssar_tpu.train.train import make_train_step

    ds = synthetic_dataset(n_windows=8, n_frames=24)
    mean, std = compute_stats(ds.features)
    palette = jnp.asarray(rng.randn(36, 18, 512).astype(np.float32))
    model = LatentNoiseReactor(jnp.asarray(mean), jnp.asarray(std), palette, decoder="fixed",
                               backbone="mlp", hidden_size=12, num_layers=1)
    x = jnp.asarray(ds.features[:4])
    params = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    opt = optax.adam(1e-3)
    batch = tuple(jnp.asarray(b) for b in next(ds.batches(4, seed=0)))
    for mode in ["selfsupervised", "ssabsdiff"]:
        step, *_ = make_train_step(model, opt, mode)
        p2, _, loss, _ = step(params, opt.init(params), batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss)), mode


@pytest.mark.slow
def test_sashimi_streaming_matches_conv(rng):
    from ssar_tpu.models.sashimi import Sashimi, SashimiStreamer

    B, T, H = 2, 32, 8
    model = Sashimi(features=H, n_layers_per_tier=1, n_tiers=2, pool=2, state_dim=8)
    x = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(params, x)
    streamer = SashimiStreamer(model, params, batch_size=B)
    ys = jnp.stack([streamer.step(x[:, t]) for t in range(T)], axis=1)
    assert float(jnp.abs(ref - ys).max()) < 1e-4
