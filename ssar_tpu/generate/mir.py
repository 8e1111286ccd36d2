"""Music information retrieval for the random-patch system.

Equivalent of ssar/random/mir.py: the 8 named audio features, lognorm-prior
tempo + beat tracking (host numpy), per-(feature, k) Laplacian
segmentations, and salience weighting of the envelopes.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..audio import features as FT
from ..audio.beat_host import beat_track, estimate_tempo
from ..audio.processing import gaussian_filter, normalize
from ..audio.segment import laplacian_segmentation, laplacian_segmentation_rosa

AFEATFNS = [FT.chromagram, FT.tonnetz, FT.mfcc, FT.spectral_contrast, FT.spectral_flatness,
            FT.rms, FT.drop_strength, FT.onsets]
UNITFEATS = ["rms", "drop_strength", "onsets", "spectral_flatness"]
ALLFEATS = ["chromagram", "tonnetz", "mfcc", "spectral_contrast"] + UNITFEATS


def salience_weighted(envelope, short_sigma: float = 5, long_sigma: float = 80):
    """(short-term / long-term)^2-weighted envelope (mir.py:14-22)."""
    squeeze = envelope.ndim > 1 and envelope.shape[1] == 1
    if squeeze:
        envelope = envelope[:, 0]
    short = gaussian_filter(envelope, short_sigma, mode="reflect")
    long = gaussian_filter(envelope, long_sigma, mode="reflect")
    weighted = (short / long) ** 2 * envelope
    if weighted.ndim < 2:
        weighted = weighted[:, None]
    return weighted


def retrieve_music_information(audio, sr: int, ks=(2, 4, 6, 8, 12, 16), include_rosa: bool = True):
    """-> (features dict name->(T, D), segmentations dict (name, k)->(T,),
    tempo bpm) — ssar/random/mir.py:25-46."""
    audio = jnp.asarray(audio, jnp.float32)
    features = {fn.__name__: fn(audio, sr) for fn in AFEATFNS}

    onset_env = np.asarray(FT.onsets(audio, sr))[:, 0]
    tempo = estimate_tempo(onset_env, sr=sr, hop_length=1024, max_tempo=240,
                           prior_scale=400.0, prior_s=1.0)
    _, beats = beat_track(onset_env, sr=sr, hop_length=1024, bpm=tempo, trim=False)
    beats = [int(b) for b in beats if b > 0]

    # Segmentation runs HOST-SIDE in numpy (audio/segment.py
    # laplacian_segmentation_np): the matrices are tiny (n_beats^2 ~ 50x50)
    # but every clip has a different beat count, so any jnp formulation
    # pays fresh per-shape compiles on EVERY clip — measured 269 s cold /
    # 1.8 s warm per feature on the tunneled TPU, ~15 s per fresh shape on
    # XLA:CPU, vs milliseconds in numpy.  This was the dominant term in the
    # study's 48 s/clip patch+MIR cost (VERDICT r4 item 6).  The
    # differentiable jnp version remains the in-graph path (optimize.py).
    from ..audio.segment import laplacian_segmentation_np

    segmentations = {}
    for name, feature in features.items():
        segs = laplacian_segmentation_np(np.asarray(feature), beats, ks=ks)
        for k, s in zip(ks, segs):
            segmentations[(name, k)] = jnp.asarray(np.argmax(s, axis=1))
    if include_rosa:
        n_frames = features[AFEATFNS[0].__name__].shape[0]
        rosa_ks = [k for k in ks]
        rosa_seg = laplacian_segmentation_rosa(np.asarray(audio), sr, n_frames, ks=rosa_ks)
        for j, k in enumerate(rosa_ks):
            segmentations[("rosa", k)] = jnp.asarray(rosa_seg[:, j])

    features = {k: normalize(salience_weighted(gaussian_filter(af, sigma=2)))
                for k, af in features.items()}
    return features, segmentations, tempo
