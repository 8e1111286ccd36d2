"""Visual beats: onset envelopes and beat times from video motion.

Equivalent of ssar/analysis/visual_beats.py:46-231 — the directogram /
spectral-flux / onset-envelope chain over optical flow, plus visual beat
*times* via the same DP tracker used for audio beats (a capability the
reference derives from its video onsets).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.beat_host import beat_track
from ..audio.processing import onset_envelope, spectral_flux
from .features import directogram, optical_flow, video_spectrogram


def video_onsets(video: jax.Array, backend: str = "jax") -> jax.Array:
    """(T, C, H, W) -> (T,) motion onset envelope (visual_beats.py:105-143)."""
    flow = optical_flow(video, backend=backend)
    spec = directogram(flow)
    return onset_envelope(spectral_flux(spec))


def video_spectral_beat_envelope(video: jax.Array) -> jax.Array:
    spec = video_spectrogram(video)
    return onset_envelope(spectral_flux(spec))


def visual_beats(video: jax.Array, fps: float = 24.0, backend: str = "jax"):
    """-> (bpm, beat frame indices) from the motion onset envelope."""
    env = np.asarray(video_onsets(video, backend=backend))
    return beat_track(env, sr=fps * 1024, hop_length=1024)
