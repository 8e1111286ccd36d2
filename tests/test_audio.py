"""Audio DSP parity tests vs independent numpy/scipy oracles.

The reference's own verification pattern is a librosa-parity harness
(ssar/features/audio.py:136-210); librosa isn't in this image, so the
oracles here are independent numpy implementations of the same published
formulas (double-implementation catches transcription bugs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssar_tpu.audio import beat, convert, features, pitch, spectral

SR = 24576  # 1024 * 24 fps


def _synth(seconds=2.0, seed=0):
    L = int(SR * seconds)
    t = np.arange(L) / SR
    au = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * np.random.RandomState(seed).randn(L)
    au[:: SR // 2] += 1.5  # clicks at 2 Hz
    return au.astype(np.float32)


def _stft_oracle(au, n_fft=2048, hop=1024, window=True):
    ap = np.pad(au, (n_fft // 2, n_fft // 2), mode="reflect")
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft)) if window else np.ones(n_fft)
    nf = (len(ap) - n_fft) // hop + 1
    fr = np.stack([ap[i * hop : i * hop + n_fft] * win for i in range(nf)])
    return np.fft.rfft(fr, axis=1).T


def test_stft_matches_oracle():
    au = _synth()
    S = np.asarray(spectral.stft(jnp.asarray(au)))
    ref = _stft_oracle(au)
    assert S.shape == ref.shape == (1025, len(au) // 1024 + 1)
    np.testing.assert_allclose(np.abs(S - ref).max(), 0, atol=2e-3)


def test_istft_roundtrip():
    au = _synth()
    S = spectral.stft(jnp.asarray(au))
    y = np.asarray(spectral.istft(S, length=len(au)))
    np.testing.assert_allclose(y, au, atol=1e-4)


def test_spectrogram_framecount():
    au = _synth()
    S = spectral.spectrogram(jnp.asarray(au))
    # one hop == one frame invariant (SURVEY.md §0)
    assert S.shape == (1025, len(au) // 1024)


def test_mel_basis_shape_and_energy():
    basis = spectral.mel_basis(SR, 2048)
    assert basis.shape == (128, 1025)
    assert (basis >= 0).all()
    # every mel band except possibly extremes has some support
    assert (basis.sum(1) > 0).sum() >= 126


def test_power_to_db():
    x = jnp.asarray(np.array([1e-12, 1e-3, 1.0, 10.0], dtype=np.float32))
    db = np.asarray(convert.power_to_db(x))
    assert db.max() == pytest.approx(10.0)
    assert db.min() >= db.max() - 80.0


def test_hz_mel_roundtrip():
    f = jnp.asarray(np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 11025.0], dtype=np.float32))
    f2 = np.asarray(convert.mel_to_hz(convert.hz_to_mel(f)))
    np.testing.assert_allclose(f2, np.asarray(f), rtol=1e-4, atol=1e-2)
    # numpy host versions agree with jnp versions
    np.testing.assert_allclose(convert.hz_to_mel_np(np.asarray(f)), np.asarray(convert.hz_to_mel(f)), rtol=1e-5)


def test_hpss_masks_sum_to_one():
    au = _synth()
    S = spectral.stft(jnp.asarray(au))
    H, P = spectral.hpss(S, margin=1.0)
    # with margin 1 the two soft masks sum to ~1 wherever energy exists
    tot = jnp.abs(H) + jnp.abs(P)
    mag = jnp.abs(S)
    err = np.asarray(jnp.abs(tot - mag))[np.asarray(mag) > 1e-3]
    assert err.max() < 1e-2


def test_harmonic_percussive_separation():
    # pure tone should live in harmonic; clicks in percussive
    L = SR * 2
    t = np.arange(L) / SR
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    clicks = np.zeros(L, np.float32)
    clicks[:: SR // 4] = 1.0
    mix = jnp.asarray(tone + clicks)
    h = np.asarray(features.harmonic(mix))
    p = np.asarray(features.percussive(mix))
    # harmonic part correlates with tone, percussive with clicks
    assert np.corrcoef(h, tone)[0, 1] > 0.9
    assert (np.abs(p[clicks > 0])).mean() > 5 * np.abs(p).mean()


def test_rms_matches_oracle():
    au = _synth()
    r = np.asarray(features.rms(jnp.asarray(au), SR))
    ap = np.pad(au, (1024, 1024), mode="reflect")
    nf = (len(ap) - 2048) // 1024 + 1
    ref = np.stack([np.sqrt(np.mean(ap[i * 1024 : i * 1024 + 2048] ** 2)) for i in range(nf - 1)])
    assert r.shape == (len(au) // 1024, 1)
    np.testing.assert_allclose(r[:, 0], ref, rtol=1e-4)


def test_spectral_flatness_range():
    noise = np.random.RandomState(0).randn(SR).astype(np.float32)
    tone = np.sin(2 * np.pi * 440 * np.arange(SR) / SR).astype(np.float32)
    fn = np.asarray(features.spectral_flatness(jnp.asarray(noise), SR))
    ft = np.asarray(features.spectral_flatness(jnp.asarray(tone), SR))
    assert fn.shape == (24, 1)
    assert fn.mean() > 0.1  # noise is flat
    assert ft.mean() < 0.01  # tone is peaky


def test_spectral_contrast_shape_and_tone():
    au = _synth()
    c = np.asarray(features.spectral_contrast(jnp.asarray(au), SR))
    assert c.shape == (len(au) // 1024, 7)
    assert np.isfinite(c).all()
    # tonal band (containing 440 Hz -> band 2: 400-800) has high contrast
    assert c[:, 2].mean() > c[:, 6].mean()


def test_onset_strength_peaks_on_clicks():
    au = _synth(2.0)
    env = np.asarray(beat.onset_strength(jnp.asarray(au), SR))
    T = len(au) // 1024
    assert env.shape == (T,)
    # clicks at frames 0, 12, 24, 36 (2 Hz at 24 fps); flux peak lands one
    # frame after the click under the reference's framing-lag shift
    click_frames = np.array([12, 24, 36]) + 1
    on = env[click_frames].mean()
    off = np.delete(env, np.concatenate([click_frames + d for d in (-1, 0, 1, 2)])).mean()
    assert on > 2 * off


def test_plp_shape_and_range():
    au = _synth(4.0)
    p = np.asarray(beat.plp(jnp.asarray(au), SR))
    assert p.shape == (len(au) // 1024,)
    assert p.min() >= 0 and p.max() <= 1.0 + 1e-5


def test_mfcc_shape():
    au = _synth()
    m = np.asarray(features.mfcc(jnp.asarray(au), SR))
    assert m.shape == (len(au) // 1024, 20)
    assert np.isfinite(m).all()


def test_estimate_tuning_detects_detune():
    # 440 Hz -> tuning 0; quarter-tone sharp -> ~ +0.5 bins (bpo=12)
    t = np.arange(SR * 2) / SR
    for f0, expect in [(440.0, 0.0), (440.0 * 2 ** (0.25 / 12), 0.25)]:
        au = jnp.asarray((0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32))
        tu = pitch.estimate_tuning(au, SR, bins_per_octave=12)
        assert abs(tu - expect) < 0.06, (f0, tu)


@pytest.mark.slow
def test_audio2features_shape_and_stats():
    au = _synth(2.0)
    F = np.asarray(features.audio2features(jnp.asarray(au), SR, 24))
    T = len(au) // 1024
    assert F.shape == (T, 59)
    assert len(features.FEATURE_NAMES) == 59
    assert np.isfinite(F).all()
    # chroma block peaks at A (bin 9) for a 440 Hz tone
    assert np.bincount(np.argmax(F[:, 20:32], axis=1)).argmax() == 9


def test_sync_agg():
    from ssar_tpu.audio.processing import sync_agg

    x = jnp.arange(24.0).reshape(2, 12)
    out = sync_agg(x, [slice(0, 4), slice(4, 8), slice(8, 12)], jnp.mean, axis=1)
    assert out.shape == (2, 3)
    assert np.allclose(np.asarray(out[0]), [1.5, 5.5, 9.5])
    out2 = sync_agg(x, [slice(0, 6)], jnp.max, axis=1, pad_slice=True)
    assert out2.shape == (2, 2) and float(out2[0, 1]) == 11.0


@pytest.mark.slow
def test_audio2features_velocity_channels():
    F = np.asarray(features.audio2features(jnp.asarray(_synth(2.0)), SR, 24, velocity=True))
    assert F.shape[1] == 118
    assert np.isfinite(F).all()
