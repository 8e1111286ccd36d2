"""Preliminary-study module: covariance-geometry distances, the
aligned-vs-misaligned driver, and the native time-series featurizers
(GAF / JRP / MiniRocket) rebuilt from ssar/analysis/preliminary.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssar_tpu.metrics.preliminary import (
    bures_distance_batched,
    compare_av_feats,
    condition_distance,
    gramian_angular_field,
    joint_recurrence_plot,
    kullback_distance,
    minirocket_fit,
    minirocket_transform,
    pca_eig,
    pca_svd,
    preliminary_study,
    standardize,
    time_gram,
    trace_correlation_distance,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _psd_batch(rng, m=3, d=6):
    A = rng.randn(m, d, d).astype(np.float32)
    return jnp.asarray(A @ A.transpose(0, 2, 1) + 0.1 * np.eye(d))


def test_matrix_distances_identity_zero(rng):
    """Every distance vanishes (or hits its floor) at A == B and is
    positive for distinct PSD matrices."""
    A = _psd_batch(rng)
    B = _psd_batch(np.random.RandomState(1))
    assert np.allclose(trace_correlation_distance(A, A), 0.0, atol=1e-5)
    assert np.all(np.asarray(trace_correlation_distance(A, B)) > 0)
    assert np.allclose(bures_distance_batched(A, A), 0.0, atol=1e-2)
    assert np.all(np.asarray(bures_distance_batched(A, B)) > 0.1)
    assert np.allclose(kullback_distance(A, A), 0.0, atol=1e-2)
    assert np.all(np.asarray(kullback_distance(A, B)) > 0.01)
    assert np.allclose(condition_distance(A, A), 0.0, atol=1e-2)
    assert np.all(np.asarray(condition_distance(A, B)) > 0.01)


def test_bures_matches_closed_form_1d():
    """For 1x1 'matrices' the Bures distance is |sqrt(a) - sqrt(b)|."""
    a, b = 4.0, 9.0
    A = jnp.full((1, 1, 1), a)
    B = jnp.full((1, 1, 1), b)
    assert np.allclose(bures_distance_batched(A, B), abs(a ** 0.5 - b ** 0.5), atol=1e-5)


def test_time_gram_and_pca_shapes(rng):
    X = jnp.asarray(rng.randn(4, 10, 7).astype(np.float32))
    G = time_gram(X)
    assert G.shape == (4, 10, 10)
    assert np.allclose(np.asarray(G), np.asarray(G).transpose(0, 2, 1), atol=1e-4)
    assert pca_svd(X, 3).shape == (4, 10, 3)
    assert pca_eig(X, 3).shape == (4, 10, 3)
    # svd flavour keeps the top-variance axes: component 0 var >= component 2 var
    P = np.asarray(pca_svd(X, 3)).reshape(-1, 3)
    assert P[:, 0].var() >= P[:, 2].var()


def test_standardize_range(rng):
    x = jnp.asarray(rng.randn(200).astype(np.float32) * 10 + 3)
    s = np.asarray(standardize(x))
    assert s.min() == pytest.approx(0.0, abs=1e-6) and s.max() == pytest.approx(1.0, abs=1e-6)


@pytest.mark.slow
def test_preliminary_study_separates_aligned_from_misaligned(tmp_path):
    """Construction from the reference study: video features that ARE the
    audio features (plus noise) must score better aligned than against the
    permutation null — lower sgw/pca distances, lower onset DTW."""
    rng = np.random.RandomState(0)
    m, t, p = 12, 24, 5
    aud = rng.randn(m, t, p).astype(np.float32)
    vid = (aud + 0.05 * rng.randn(m, t, p)).astype(np.float32)
    onsets = np.abs(rng.randn(m, t)).astype(np.float32)
    groups = {
        "toy": {
            "video_feat": vid, "audio_feat": aud,
            "video_onsets": onsets + 0.01 * rng.randn(m, t).astype(np.float32),
            "audio_onsets": onsets,
            "video_tempogram": aud[..., :2], "audio_tempogram": aud[..., :2],
        }
    }
    aligned, mis = preliminary_study(groups, ["video_feat"], ["audio_feat"],
                                     n_samples=m, out_dir=str(tmp_path))
    (a,), (w,) = aligned, mis
    assert a["group"] == "toy"
    # sgw is pairing-INVARIANT (Gromov-Wasserstein compares point clouds, so
    # permuting clips cannot move it — true of the reference's too); the
    # pairing-sensitive scores must separate:
    assert np.isfinite(a["acav_sgw"]) and np.isfinite(w["acav_sgw"])
    assert a["acav_pca_corr"] < w["acav_pca_corr"]
    assert a["acav_pca_wass"] < w["acav_pca_wass"]
    assert a["dtw_mean"] < w["dtw_mean"]
    assert a["avmi"] > w["avmi"]
    assert (tmp_path / "aligned.csv").exists() and (tmp_path / "misaligned.csv").exists()


def test_compare_av_feats_handles_2d_columns():
    """Envelope (m, t) columns are promoted to (m, t, 1) like the
    reference's unsqueeze (preliminary.py:423-426)."""
    rng = np.random.RandomState(0)
    out = compare_av_feats({"v": rng.randn(4, 16)}, {"a": rng.randn(4, 16)},
                           jax.random.PRNGKey(0))
    assert set(out) == {"sgw", "pca_corr", "pca_wass"}
    assert all(np.isfinite(v) for v in out.values())


def test_gaf_matches_direct_trig(rng):
    """GASF/GADF equal the explicit cos(phi_i +/- phi_j) construction."""
    x = rng.rand(10, 1).astype(np.float32)
    G = np.asarray(gramian_angular_field(x, "summation"))[0]
    D = np.asarray(gramian_angular_field(x, "difference"))[0]
    xs = 2 * (x[:, 0] - x[:, 0].min()) / (x[:, 0].max() - x[:, 0].min()) - 1
    phi = np.arccos(np.clip(xs, -1, 1))
    assert np.allclose(G, np.cos(phi[:, None] + phi[None, :]), atol=1e-5)
    assert np.allclose(D, np.sin(phi[:, None] - phi[None, :]), atol=1e-5)


def test_jrp_point_threshold(rng):
    """threshold='point', percentage=50 keeps ~half of each channel's
    distances; the joint plot is the AND across channels with unit
    diagonal."""
    X = rng.randn(20, 3).astype(np.float32)
    J = np.asarray(joint_recurrence_plot(X, 50.0))
    assert J.shape == (20, 20)
    assert set(np.unique(J)) <= {0.0, 1.0}
    assert np.all(np.diag(J) == 1.0)
    single = np.asarray(joint_recurrence_plot(X[:, :1], 50.0))
    frac = single.mean()
    assert 0.4 < frac < 0.6


def test_minirocket_features(rng):
    """Fit/transform: deterministic given the fit, PPV in [0, 1], and the
    features separate an easy two-class problem linearly."""
    t = 64
    pos = np.sin(np.linspace(0, 8 * np.pi, t))[None] + 0.1 * rng.randn(20, t)
    neg = 0.1 * rng.randn(20, t)
    X = np.concatenate([pos, neg]).astype(np.float32)[..., None]
    params = minirocket_fit(X)
    F = np.asarray(minirocket_transform(X, params))
    assert F.shape[0] == 40 and F.shape[1] >= 84
    assert F.min() >= 0.0 and F.max() <= 1.0
    assert np.allclose(F, np.asarray(minirocket_transform(X, params)))
    # nearest-centroid in feature space classifies the toy problem
    mu_p, mu_n = F[:20].mean(0), F[20:].mean(0)
    pred = (np.linalg.norm(F - mu_p, axis=1) < np.linalg.norm(F - mu_n, axis=1))
    truth = np.arange(40) < 20
    assert (pred == truth).mean() >= 0.95
