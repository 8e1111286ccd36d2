"""Metric + video-feature tests: discrimination power and oracle parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssar_tpu.metrics import correlation as C
from ssar_tpu.video import features as VF


@pytest.fixture
def corr_pair(rng):
    T = 80
    base = rng.randn(T, 3)
    x = np.hstack([base, rng.randn(T, 2) * 0.1]).astype(np.float32)
    y = np.hstack([base @ rng.randn(3, 3), rng.randn(T, 1) * 0.1]).astype(np.float32)
    r = rng.randn(T, 4).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(r)


@pytest.mark.slow
def test_correlation_zoo_discriminates(corr_pair):
    x, y, r = corr_pair
    for name, fn in C.CORRELATION_FNS.items():
        assert float(fn(x, y)) > float(fn(x, r)), name


@pytest.mark.slow
def test_correlation_sanity_constructed_pairs():
    """The reference's constructed-pairs harness (correlation.py:405-426):
    X vs a rank-reduced copy Y1, random Y2, and mixes in between — every
    measure must order correlated > mixes > random monotonically."""
    rng = np.random.RandomState(0)
    X = rng.randn(200, 32)
    X = X - X.mean()
    U, s, V = np.linalg.svd(X, full_matrices=False)
    Y1 = np.delete(U, 2, 1) @ np.diag(np.delete(s, 2)) @ np.delete(V, 2, 0)
    Y2 = rng.randn(200, 32)
    Xj = jnp.asarray(X, jnp.float32)
    mixes = [Y1, 0.75 * Y1 + 0.25 * Y2, 0.5 * Y1 + 0.5 * Y2, 0.25 * Y1 + 0.75 * Y2, Y2]

    fns = dict(C.CORRELATION_FNS)
    fns.update(C.CORRELATION_FNS_EQUAL_WIDTH)  # equal widths here
    for name, fn in fns.items():
        vals = [float(fn(Xj, jnp.asarray(m, jnp.float32))) for m in mixes]
        if name in ("rG", "coxhead", "r2", "r4"):
            # Not in the reference's own sanity list (correlation.py:420):
            # rG at full static rank compares near-identity projector Grams,
            # coxhead's pinv grams saturate when T >> D, and r2/r4 are
            # SVD-sign-ambiguous (identical behaviour in torch) — assert
            # finiteness only
            assert all(np.isfinite(v) for v in vals), (name, vals)
            continue
        assert all(vals[i] >= vals[i + 1] - 1e-3 for i in range(4)), (name, vals)
        assert vals[0] > vals[-1] + 1e-3, (name, vals)


def test_rG_with_components_discriminates():
    rng = np.random.RandomState(0)
    X = rng.randn(200, 32).astype(np.float32)
    U, s, V = np.linalg.svd(X - X.mean(), full_matrices=False)
    Y1 = (np.delete(U, 2, 1) @ np.diag(np.delete(s, 2)) @ np.delete(V, 2, 0)).astype(np.float32)
    Y2 = rng.randn(200, 32).astype(np.float32)
    a = float(C.rG(jnp.asarray(X), jnp.asarray(Y1), n_components=8))
    b = float(C.rG(jnp.asarray(X), jnp.asarray(Y2), n_components=8))
    assert np.isfinite(a) and np.isfinite(b)


def test_rv2_bounded(corr_pair):
    x, y, _ = corr_pair
    assert -1.0 <= float(C.rv2(x, y)) <= 1.0
    assert float(C.rv2(x, x)) == pytest.approx(1.0, abs=1e-4)


def test_xi_detects_nonlinear(rng):
    a = jnp.asarray(rng.randn(200).astype(np.float32))
    assert float(C.xi(a, a**2)) > 0.7  # nonlinear but deterministic
    assert abs(float(C.xi(a, jnp.asarray(rng.randn(200).astype(np.float32))))) < 0.25


def test_sgw_separates(rng):
    x = jnp.asarray(rng.randn(60, 5).astype(np.float32))
    assert float(C.sgw(x, x)) < float(C.sgw(x, jnp.asarray(5 * rng.randn(60, 5).astype(np.float32))))


def test_foci(rng):
    n = 150
    x = rng.randn(n, 2).astype(np.float32)
    y = (x[:, 0] ** 2 + 0.05 * rng.randn(n)).astype(np.float32)
    dep = float(C.foci_codependence(jnp.asarray(y), jnp.asarray(x)))
    indep = float(C.foci_codependence(jnp.asarray(rng.randn(n).astype(np.float32)), jnp.asarray(x)))
    assert dep > indep + 0.2


# ----------------------------------------------------------------- video --
@pytest.fixture
def video(rng):
    T, H, W = 12, 32, 32
    vid = np.zeros((T, 3, H, W), np.float32)
    for t in range(T):
        vid[t] = np.roll(np.linspace(0, 1, W, dtype=np.float32)[None, None, :], 3 * t, axis=-1)
    vid += 0.02 * rng.rand(T, 3, H, W).astype(np.float32)
    return jnp.asarray(np.clip(vid, 0, 1))


def test_histograms_shapes_and_norm(video):
    h = np.asarray(VF.rgb_hist(video))
    assert h.shape == (12, 96)
    assert np.allclose(h.max(1), 1.0)
    assert np.asarray(VF.hsv_hist(video)).shape == (12, 96)


def test_histc_matches_torch_semantics(rng):
    import torch

    x = rng.rand(500).astype(np.float32)
    ours = np.asarray(VF._histc(jnp.asarray(x), 32))
    ref = torch.histc(torch.from_numpy(x), bins=32).numpy()
    np.testing.assert_allclose(ours, ref)


def test_rgb_to_hsv_matches_colorsys(rng):
    import colorsys

    px = rng.rand(10, 3).astype(np.float32)
    vid = jnp.asarray(px.T[None, :, :, None])  # (1, 3, 10, 1)
    hsv = np.asarray(VF.rgb_to_hsv(vid))[0, :, :, 0]
    for i in range(10):
        h, s, v = colorsys.rgb_to_hsv(*px[i])
        np.testing.assert_allclose(hsv[0, i], h * 2 * np.pi, atol=1e-4)
        np.testing.assert_allclose(hsv[1, i], s, atol=1e-4)
        np.testing.assert_allclose(hsv[2, i], v, atol=1e-5)


def test_video_spectrogram_and_rms(video):
    spec = VF.video_spectrogram(video)
    assert spec.shape[0] == 12 and np.isfinite(np.asarray(spec)).all()
    for fn in [VF.low_freq_rms, VF.mid_freq_rms, VF.high_freq_rms, VF.adaptive_freq_rms]:
        assert fn(video).shape == (12, 1)


def test_flow_recovers_translation(rng):
    import scipy.ndimage as ndi

    from ssar_tpu.video.flow import farneback_flow

    base = ndi.gaussian_filter(rng.rand(64, 64), 3).astype(np.float32)
    frames = [np.roll(np.roll(base, 2 * t, axis=1), t, axis=0) for t in range(4)]
    flow = np.asarray(farneback_flow(jnp.asarray(np.stack(frames)), levels=3, iterations=5))
    interior = flow[:, :, 16:-16, 16:-16]
    np.testing.assert_allclose(interior[:, 0].mean(), 2.0, atol=0.1)
    np.testing.assert_allclose(interior[:, 1].mean(), 1.0, atol=0.1)


def test_parametrized_farneback_models(rng):
    """Certainty-weighted Farneback (ssar/analysis/flow.py:260-452): every
    warp parametrization recovers a global translation, the
    uniform-certainty polynomial expansion matches the global-Gram fast
    path on the interior, and mu-regularization pulls the field toward the
    global warp (lower spatial variance)."""
    import scipy.ndimage as ndi

    from ssar_tpu.video.flow import (farneback_parametrized, poly_expansion,
                                     poly_expansion_certainty)

    base = ndi.gaussian_filter(rng.rand(64, 64), 3).astype(np.float32)
    A1, b1, _ = poly_expansion(jnp.asarray(base[None]), n=7, sigma=1.5)
    A2, b2, _ = poly_expansion_certainty(jnp.asarray(base[None]),
                                         jnp.ones((1, 64, 64), jnp.float32), sigma=1.5)
    sl = np.s_[:, 10:-10, 10:-10]
    assert np.abs(np.asarray(A1)[sl] - np.asarray(A2)[sl]).max() < 5e-3
    assert np.abs(np.asarray(b1)[sl] - np.asarray(b2)[sl]).max() < 5e-3

    g = jnp.asarray(np.stack([base, np.roll(np.roll(base, 2, axis=1), 1, axis=0)]))
    flows = {}
    for model in ("constant", "affine", "eight_param"):
        fl = np.asarray(farneback_parametrized(g, model=model, num_iter=3))
        interior = fl[0][:, 20:-20, 20:-20]
        assert abs(np.median(interior[0]) - 2.0) < 0.75, model
        assert abs(np.median(interior[1]) - 1.0) < 0.75, model
        flows[model] = fl
    reg = np.asarray(farneback_parametrized(g, model="constant", mu=-1.0, num_iter=3))
    assert reg[0][0].std() < flows["constant"][0][0].std() + 1e-6


def test_directogram_and_onsets(video):
    flow = VF.optical_flow(video)
    dg = VF.directogram(flow)
    assert dg.shape == (12, 8)
    assert VF.video_flow_onsets(video).shape == (12, 1)
    assert VF.video_spectral_onsets(video).shape == (12, 1)


@pytest.mark.slow
def test_reactivity_metrics_discriminate(rng):
    """Reactive video (flashes on onsets) scores higher than static video."""
    from ssar_tpu.metrics.rhythmic import rhythmic_reactivity

    sr, fps = 24576, 24
    T = 48
    audio = 0.05 * rng.randn(sr * 2).astype(np.float32)
    audio[:: sr // 4] += 1.5  # onsets every 6 frames
    reactive = np.zeros((T, 3, 16, 16), np.float32)
    reactive[::6] = 1.0  # flash on each onset
    static = np.full((T, 3, 16, 16), 0.5, np.float32) + 0.01 * rng.rand(T, 3, 16, 16).astype(np.float32)
    r_reactive = float(rhythmic_reactivity(jnp.asarray(audio), sr, jnp.asarray(reactive), fps))
    r_static = float(rhythmic_reactivity(jnp.asarray(audio), sr, jnp.asarray(static), fps))
    assert r_reactive > r_static


@pytest.mark.slow
def test_lucid_baseline_and_from_video_dir(tmp_path, rng):
    from ssar_tpu.gan import stylegan2 as sg
    from ssar_tpu.gan.wrapper import StyleGAN2
    from ssar_tpu.metrics.comparison import LucidSonicBaseline, from_video_dir

    cfg = sg.StyleGAN2Config(resolution=32)
    G = StyleGAN2(config=cfg)
    sr = 1024 * 24
    audio = (0.2 * rng.randn(2 * sr)).astype(np.float32)
    audio[:: sr // 2] += 1.0

    lats, noise = LucidSonicBaseline(G, fps=24).predict(audio, sr)
    assert lats.shape == (48, cfg.n_latent, 512) and noise is None
    assert np.isfinite(np.asarray(lats)).all()

    video = rng.rand(48, 3, 32, 32).astype(np.float32)
    recs = from_video_dir([("clipA", video, audio, sr)], "fvd", out_dir=str(tmp_path))
    assert len(recs) == 1 and np.isfinite(recs[0]["correlation"])
    # resume: second call reads the cached json
    assert from_video_dir([("clipA", video, audio, sr)], "fvd", out_dir=str(tmp_path)) == recs


@pytest.mark.slow
def test_evaluate_trained_checkpoint_dirs(tmp_path, rng):
    from ssar_tpu.gan import stylegan2 as sg
    from ssar_tpu.gan.wrapper import StyleGAN2
    from ssar_tpu.metrics.comparison import evaluate_trained_checkpoint_dirs
    from ssar_tpu.train.train import main as train_main

    d1, _ = train_main(["--smoke", "--backbone", "mlp", "--num_layers", "1",
                        "--n_examples", "64", "--eval_every", "32", "--ckpt_every", "32",
                        "--out_dir", str(tmp_path)])
    G = StyleGAN2(config=sg.StyleGAN2Config(resolution=32))
    sr = 1024 * 24
    audio = (0.2 * rng.randn(2 * sr)).astype(np.float32)
    recs = evaluate_trained_checkpoint_dirs([str(d1)], "sweep", [("clipA", audio, sr)], G,
                                            n_ckpts=2, out_dir=str(tmp_path))
    assert len(recs) == 2
    assert {r["steps"] for r in recs} == {0, 64}
    assert all(np.isfinite(r["correlation"]) for r in recs)
    assert recs[0]["backbone"] == "mlp"


def test_lucas_kanade_pyramid_recovers_shift(rng):
    from scipy.ndimage import gaussian_filter as gf
    from scipy.ndimage import shift as ndshift

    from ssar_tpu.video.flow import lucas_kanade_pyramid

    img = gf(rng.rand(80, 96).astype(np.float32), 4)
    im2 = ndshift(img, (0, -3), order=3, mode="reflect")
    f = np.asarray(lucas_kanade_pyramid(jnp.asarray(img), jnp.asarray(im2), levels=2))
    assert np.isfinite(f).all()
    inner = f[12:-12, 12:-12]
    assert abs(inner[..., 0].mean() + 3.0) < 0.5  # x displacement ~ -3
    assert abs(inner[..., 1].mean()) < 0.3


@pytest.mark.slow
def test_av_feature_study(tmp_path, rng):
    from ssar_tpu.metrics.study import av_feature_study

    sr = 1024 * 24
    audio = (0.2 * rng.randn(2 * sr)).astype(np.float32)
    audio[:: sr // 2] += 1.0
    video = rng.rand(48, 3, 32, 32).astype(np.float32)
    recs = av_feature_study([("c", audio, sr, video)], measures=("rv2", "procrustes"),
                            out_dir=str(tmp_path), cache_dir=str(tmp_path))
    # 9x12 quadratic + 1 concat row per measure
    assert len(recs) == (9 * 12 + 1) * 2
    assert np.isfinite([r["value"] for r in recs]).all()
    assert (tmp_path / "av_study.csv").exists()
    assert (tmp_path / "av_study_rv2.png").stat().st_size > 0
    assert (tmp_path / "barplot_concat_corr.png").stat().st_size > 0
    assert (tmp_path / "group_corr_hists_quadratic.png").stat().st_size > 0
    assert (tmp_path / "extrema.txt").read_text().startswith("# all")
    # feature npz cache round-trips: second call must reuse it
    assert (tmp_path / "c_afeats.npz").exists()
    recs2 = av_feature_study([("c", audio, sr, video)], measures=("rv2",),
                             cache_dir=str(tmp_path))
    r1 = {(r["audio_feature"], r["video_feature"]): r["value"]
          for r in recs if r["measure"] == "rv2"}
    for r in recs2:
        assert abs(r1[(r["audio_feature"], r["video_feature"])] - r["value"]) < 1e-5


@pytest.mark.slow
def test_feature_visualizations(tmp_path, rng):
    from ssar_tpu.metrics.study import feature_visualizations

    sr = 1024 * 24
    audio = (0.2 * rng.randn(2 * sr)).astype(np.float32)
    video = rng.rand(48, 3, 32, 32).astype(np.float32)
    names = feature_visualizations(audio, sr, video, str(tmp_path))
    assert "chromagram.png" in names and "absdiff.png" in names
    assert len(names) == 9 + 12


def test_audiovisual_correlation_modes(rng):
    from ssar_tpu.metrics.correlation import rv2
    from ssar_tpu.metrics.study import audiovisual_correlation, extrema, group_stats

    afeats = {"a1": jnp.asarray(rng.randn(32, 4).astype(np.float32)),
              "a2": jnp.asarray(rng.randn(32, 2).astype(np.float32))}
    vfeats = {"v1": jnp.asarray(rng.randn(32, 3).astype(np.float32))}
    quad = audiovisual_correlation(afeats, vfeats, "rv2", rv2, quadratic=True)
    assert set(quad) == {("a1", "v1", "rv2"), ("a2", "v1", "rv2")}
    flat = audiovisual_correlation(afeats, vfeats, "rv2", rv2)
    assert np.isfinite(flat)
    # normalizers scale, never NaN
    qn = audiovisual_correlation(afeats, vfeats, "rv2", rv2, quadratic=True,
                                 variation_normalized=True, mean_diff_normalized=True)
    assert np.isfinite(list(qn.values())).all()

    recs = [{"group": g, "clip": f"{g}{i}", "measure": "procrustes",
             "audio_feature": "concat", "video_feature": "concat", "value": float(i) + (g == "x")}
            for g in ("x", "y") for i in range(6)]
    ex = extrema(recs, n=2)
    assert ex["x"]["best"][0][0] == 6.0 and ex["y"]["worst"][0][0] == 0.0
    st = group_stats(recs)
    med = {s["group"]: s["median"] for s in st}
    assert med["x"] == 3.5 and med["y"] == 2.5


@pytest.mark.slow
def test_metric_sensitivity_study(rng, tmp_path):
    from ssar_tpu.metrics.rhythmic import dtw_distance, metric_sensitivity_study

    T = 96
    ons = np.clip(rng.rand(T) ** 3, 0, 1)
    env_sets = {"matched": np.stack([ons + 0.05 * rng.randn(T) for _ in range(3)]),
                "random": rng.rand(3, T)}
    recs = metric_sensitivity_study(ons, env_sets, strengths=4, out_dir=str(tmp_path))
    assert np.isfinite([r["mean"] for r in recs]).all()
    assert (tmp_path / "metric_sensitivity.csv").exists()
    cos_m = np.mean([r["mean"] for r in recs
                     if r["metric"] == "cos" and r["transform"] == "power"
                     and r["envelope_set"] == "matched"])
    cos_r = np.mean([r["mean"] for r in recs
                     if r["metric"] == "cos" and r["transform"] == "power"
                     and r["envelope_set"] == "random"])
    assert cos_m > cos_r
    # dtw: identical sequences -> 0; different -> positive
    assert dtw_distance(ons, ons) == 0.0
    assert dtw_distance(ons, ons[::-1]) > 0.0


def test_plot_surfaces(rng, tmp_path):
    """Reporting plots: grouped bars, feature-group autocorrelation sums,
    aggregated grids, training-curve panels (ssar/plot.py:43-79,215-283,
    368-394,414-421)."""
    from ssar_tpu.utils import plot as P

    # feature_group_autocorrelation_sum == sum of per-section Grams
    x = rng.rand(20, 59)
    acs = P.feature_group_autocorrelation_sum(x)
    manual = np.zeros((20, 20))
    for lo, hi in [(0, 20), (20, 32), (32, 38), (38, 45), (45, 59)]:
        manual += x[:, lo:hi] @ x[:, lo:hi].T
    assert np.allclose(acs, manual)
    # short feature axis stops at the array edge instead of erroring
    small = P.feature_group_autocorrelation_sum(x[:, :25])
    assert np.allclose(small, x[:, :20] @ x[:, :20].T + x[:, 20:25] @ x[:, 20:25].T)

    plt = P._plt()
    fig, ax = plt.subplots()
    handles = P.grouped_bar_plot(ax, {"a": [1, 2, 3], "b": [3, 2, 1]},
                                 xlabels=["x", "y", "z"])
    assert len(handles) == 2 and len(ax.patches) == 6
    plt.close(fig)

    facs, iacs = P.aggregated_autocorrelations(
        [rng.rand(16, 59) for _ in range(3)], str(tmp_path / "agg.png"))
    assert facs.shape == (3, 16, 16) and iacs.shape == (3, 16, 16)
    assert (tmp_path / "agg_full.png").stat().st_size > 0
    assert (tmp_path / "agg_grouped.png").stat().st_size > 0

    recs = [{"config": c, "iterations": it,
             "train_latent_rv2": rng.rand(), "train_latent_rv2_std": 0.1,
             "val_latent_rv2": rng.rand()}
            for c in ("gru,fixed", "sashimi,learned") for it in (100, 200)]
    out = P.training_curves_plot(recs, str(tmp_path / "curves.png"),
                                 outputs=("latent",), splits=("train", "val"))
    assert (tmp_path / "curves.png").stat().st_size > 0
