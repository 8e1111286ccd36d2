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
