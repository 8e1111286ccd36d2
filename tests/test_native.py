"""C++ native kernels vs numpy / jnp parity (the dual-implementation oracle
pattern the reference used between its CUDA/Triton kernels and references)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ssar_tpu.utils import native


def test_cpp_quantile_matches_numpy(rng):
    x = rng.randn(10001).astype(np.float32)
    for q in [0.0, 0.025, 0.25, 0.5, 0.75, 0.975, 1.0]:
        np.testing.assert_allclose(native.quantile(x, q), np.quantile(x, q), rtol=1e-6)


def test_cpp_quantile_matches_jnp(rng):
    from ssar_tpu.ops.quantile import quantile as jq

    x = rng.randn(4097).astype(np.float32)
    for q in [0.1, 0.5, 0.9]:
        np.testing.assert_allclose(native.quantile(x, q), float(jq(jnp.asarray(x), q)), rtol=1e-5)


def test_cpp_quantile_cols(rng):
    x = rng.randn(500, 7).astype(np.float32)
    out = native.quantile_cols(x, 0.3)
    np.testing.assert_allclose(out, np.quantile(x, 0.3, axis=0), rtol=1e-6)


def test_cpp_standardize(rng):
    x = rng.randn(2048).astype(np.float32)
    out = native.standardize(x)
    lo, hi = np.quantile(x, 0.25), np.quantile(x, 0.75) + 1e-10
    ref = np.clip(x, lo, hi)
    ref = (ref - ref.min()) / (ref.max() - ref.min() + 1e-8)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_cpp_quantile_small_inputs():
    assert native.quantile(np.array([3.0], np.float32), 0.7) == pytest.approx(3.0)
    np.testing.assert_allclose(native.quantile(np.array([1.0, 2.0], np.float32), 0.5), 1.5)


def test_mmap_window_loader_matches_numpy(tmp_path):
    from ssar_tpu.utils.native import MmapWindows

    rng = np.random.RandomState(0)
    arr = rng.randn(200, 3, 5).astype(np.float32)
    p = tmp_path / "x.npy"
    np.save(p, arr)
    mw = MmapWindows(p, window=16)
    starts = np.array([0, 7, 100, 184])
    assert np.array_equal(mw.gather(starts), np.stack([arr[s : s + 16] for s in starts]))
    with pytest.raises(IndexError):
        mw.gather(np.array([185]))
    mw.close()


def test_raw_streaming_cache_roundtrip(tmp_path):
    from ssar_tpu.train.data import load_cached, write_raw_cache

    rng = np.random.RandomState(1)
    L = 8
    track_lengths = [40, 25]
    T = sum(track_lengths)
    feats = rng.randn(T, 59).astype(np.float32)
    lats = rng.randn(T, 18, 512).astype(np.float32)
    noises = [rng.randn(T, s, s).astype(np.float32) for s in (4, 8, 16, 32)]
    write_raw_cache(tmp_path, "train", feats, lats, noises, L, track_lengths)

    ds = load_cached(tmp_path, "train")
    # no window crosses the 40/25 track boundary
    assert all(s + L <= 40 or s >= 40 for s in ds.starts)
    f, l, n4, n8, n16, n32 = next(ds.batches(4, seed=0))
    assert f.shape == (4, L, 59) and l.shape == (4, L, 18, 512) and n32.shape == (4, L, 32, 32)
    # deterministic: same seed -> same batch, and content matches the source
    f2, *_ = next(ds.batches(4, seed=0))
    assert np.array_equal(f, f2)
    s0 = ds.starts[np.random.RandomState(0).permutation(len(ds))[0]]
    assert np.array_equal(f[0], feats[s0 : s0 + L])
