"""Golden-vector parity: the JAX DSP stack vs the independent numpy oracle.

The contract of the reference's librosa-parity harness
(/root/reference/ssar/features/audio.py:162-190) — per-feature abs-diff
statistics over real tracks — reproduced against tests/oracle_dsp.py (a
pure numpy/scipy port of the reference torch semantics, written without
importing anything from ssar_tpu).

Tracks are synthetic but designed to exercise every feature: a 12-semitone
arpeggio with percussive clicks, a detuned chord stack with tremolo and
lows, and broadband noise bursts.  All contain a small dither floor —
features of digitally-silent spectral regions are precision-chaotic in
*any* float32 implementation (including the torch reference) and carry no
information.

Run ``python -m tests.gen_parity_table`` to regenerate docs/PARITY.md.
"""
from __future__ import annotations

import numpy as np
import pytest
from scipy.signal import lfilter

import jax.numpy as jnp

import tests.oracle_dsp as O

SR = 1024 * 24
SECONDS = 4.0

FEATURE_GROUPS = {
    "mfcc": (0, 20),
    "chroma": (20, 32),
    "tonnetz": (32, 38),
    "contrast": (38, 45),
    "flatness": (45, 46),
    "onsets": (46, 50),
    "pulse": (50, 51),
    "rms": (51, 55),
    "drop_strength": (55, 59),
}

# ~10x headroom over the worst observed deviation per group; all well under
# the 1e-2 frame-level-parity budget (BASELINE.md).  mfcc/contrast are in dB.
GROUP_TOL = {
    "mfcc": 1e-2,
    "chroma": 1e-3,
    "tonnetz": 1e-3,
    "contrast": 1e-2,
    "flatness": 1e-4,
    "onsets": 1e-2,
    "pulse": 1e-3,
    "rms": 1e-4,
    "drop_strength": 1e-3,
}


def golden_tracks(seconds: float = SECONDS) -> list[tuple[str, np.ndarray]]:
    L = int(SR * seconds)
    t = np.arange(L) / SR
    rng = np.random.RandomState(0)

    # 1: 12-semitone arpeggio + decaying percussive clicks + dither
    semis = np.floor(t * 3).astype(int) % 12
    freq = 220.0 * 2.0 ** (semis / 12.0)
    phase = np.cumsum(2 * np.pi * freq / SR)
    clicks = np.zeros(L)
    clicks[:: SR // 3] = 1.0
    arp = (0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase)
           + lfilter([1], [1, -0.95], clicks * rng.randn(L).clip(0, None)) * 0.3
           + 0.005 * rng.randn(L))

    # 2: chord stack with tremolo + gated lows
    chord = sum(0.15 * np.sin(2 * np.pi * f * t + i)
                for i, f in enumerate([110, 138.6, 164.8, 220, 277.2, 329.6]))
    trem = 0.6 + 0.4 * np.sin(2 * np.pi * 2 * t)
    kick = 0.5 * np.sin(2 * np.pi * 55 * t) * (np.sin(2 * np.pi * 1.5 * t) > 0.9)
    stack = chord * trem + kick + 0.01 * rng.randn(L)

    # 3: broadband noise bursts
    bursts = rng.randn(L) * ((np.sin(2 * np.pi * 1.7 * t) ** 2) * 0.8 + 0.1) * 0.3

    return [("arpeggio", arp.astype(np.float32)),
            ("chords", stack.astype(np.float32)),
            ("noise", bursts.astype(np.float32))]


TRACKS = golden_tracks()


def absdiff_stats(a, b):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, f"shape {a.shape} vs {b.shape}"
    d = np.abs(a - b)
    return float(d.min()), float(d.mean()), float(d.max())


# ------------------------------------------------------------ components --
@pytest.mark.parametrize("name,au", TRACKS[:1])
def test_spectral_core_parity(name, au):
    from ssar_tpu.audio import spectral as SP

    aj, an = jnp.asarray(au), au.astype(np.float64)
    assert absdiff_stats(SP.stft(aj), O.stft_np(an))[2] < 1e-3
    assert absdiff_stats(SP.istft(SP.stft(aj), length=len(au)),
                         O.istft_np(O.stft_np(an), length=len(an)))[2] < 1e-5
    assert absdiff_stats(SP.melspectrogram(aj, SR), O.melspectrogram_np(an, SR))[2] < 1e-2
    H1, P1 = SP.hpss(SP.stft(aj), margin=8.0)
    H2, P2 = O.hpss_np(O.stft_np(an), margin=8.0)
    assert absdiff_stats(jnp.abs(H1), np.abs(H2))[2] < 1e-3
    assert absdiff_stats(jnp.abs(P1), np.abs(P2))[2] < 1e-3


@pytest.mark.parametrize("name,au", TRACKS[:1])
@pytest.mark.slow
def test_cqt_recursive_matches_reference_exactly(name, au):
    """The recursive CQT (the parity-mode default for chroma) reproduces the
    reference's octave-halving chain to float32 round-off — including the
    basis sparsification (constantq.py:147-164) and the kaiser-window
    resampler (constantq.py:86)."""
    from ssar_tpu.audio import constantq as CQ

    aj, an = jnp.asarray(au), au.astype(np.float64)
    ours = jnp.abs(CQ.cqt(aj, SR, n_bins=252, bins_per_octave=36, tuning=0.0,
                          method="recursive"))
    ref = np.abs(O.cqt_np(an, SR, n_bins=252, bins_per_octave=36, tuning=0.0))
    _, mean, mx = absdiff_stats(ours, ref)
    assert mx < 1e-4, (mean, mx)


@pytest.mark.parametrize("name,au", TRACKS[:1])
def test_chroma_cens_parity(name, au):
    from ssar_tpu.audio import spectral as SP

    aj, an = jnp.asarray(au), au.astype(np.float64)
    assert absdiff_stats(SP.chroma_cens(aj, SR, tuning=0.0),
                         O.chroma_cens_np(an, SR, tuning=0.0))[2] < 1e-4


@pytest.mark.parametrize("name,au", TRACKS[:1])
def test_beat_and_processing_parity(name, au):
    from ssar_tpu.audio import beat as BT
    from ssar_tpu.audio import processing as PR

    aj, an = jnp.asarray(au), au.astype(np.float64)
    assert absdiff_stats(BT.onset_strength(aj, SR), O.onset_strength_np(an, SR))[2] < 1e-3
    assert absdiff_stats(BT.plp(aj, SR), O.plp_np(an, SR))[2] < 1e-4
    assert absdiff_stats(PR.low_pass(aj, SR), O.low_pass_np(an, SR))[2] < 1e-5
    assert absdiff_stats(PR.mid_pass(aj, SR), O.mid_pass_np(an, SR))[2] < 1e-5
    assert absdiff_stats(PR.high_pass(aj, SR), O.high_pass_np(an, SR))[2] < 1e-5


def test_dct_ortho_matches_scipy():
    """MFCC front-end: DCT-II with ortho norm (caught by the oracle in r2 —
    the un-normalised variant is 16-22x off)."""
    from ssar_tpu.ops.dct import dct

    x = np.random.RandomState(1).randn(5, 128).astype(np.float32)
    import scipy.fft

    ref = scipy.fft.dct(x.astype(np.float64), type=2, norm="ortho", axis=-1)
    assert np.abs(np.asarray(dct(jnp.asarray(x), norm="ortho")) - ref).max() < 1e-4


def test_tuning_estimation_parity():
    rng = np.random.RandomState(0)
    L = int(SR * SECONDS)
    t = np.arange(L) / SR
    detune = 2.0 ** (0.23 / 36)
    semis = np.floor(t * 3).astype(int) % 12
    freq = 220.0 * detune * 2.0 ** (semis / 12.0)
    phase = np.cumsum(2 * np.pi * freq / SR)
    au = (0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase) + 0.005 * rng.randn(L)).astype(np.float32)

    from ssar_tpu.audio.pitch import estimate_tuning

    for bpo in (12, 36):
        ours = estimate_tuning(jnp.asarray(au), SR, bins_per_octave=bpo)
        ref = O.estimate_tuning_np(au.astype(np.float64), SR, bins_per_octave=bpo)
        assert abs(ours - ref) < 1e-6, (bpo, ours, ref)


# ------------------------------------------------------ the 59-dim stack --
@pytest.mark.parametrize("name,au", TRACKS, ids=[n for n, _ in TRACKS])
def test_audio2features_frame_level_parity(name, au):
    """Frame-level parity of the full 59-dim stack vs the oracle, per
    feature group (BASELINE.md target: 'frame-level output parity')."""
    from ssar_tpu.audio.features import audio2features

    F = np.asarray(audio2features(jnp.asarray(au), SR, 24, tuning=0.0))
    Fo = O.audio2features_np(au.astype(np.float64), SR, 24, tuning=0.0)
    assert F.shape == Fo.shape == (int(SECONDS * 24), 59)
    report = []
    for g, (a, b) in FEATURE_GROUPS.items():
        _, mean, mx = absdiff_stats(F[:, a:b], Fo[:, a:b])
        report.append((g, mean, mx, GROUP_TOL[g]))
    bad = [(g, mean, mx, tol) for g, mean, mx, tol in report if mx > tol]
    assert not bad, f"parity failures on {name}: {bad}"
