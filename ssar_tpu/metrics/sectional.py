"""Per-file reactivity evaluation runner.

Equivalent of ssar/metrics/sectional.py: load an audio+video pair and
compute both reactivity metrics.  Video decode uses cv2 (no decord in this
image); audio must live alongside as wav or be passed directly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def load_video(path: str, downsample: int = 4):
    """mp4 -> (T, C, H, W) float [0,1] + fps (cv2 decode, host)."""
    import cv2

    cap = cv2.VideoCapture(str(path))
    fps = cap.get(cv2.CAP_PROP_FPS) or 24
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if downsample > 1:
            frame = cv2.resize(frame, (frame.shape[1] // downsample, frame.shape[0] // downsample),
                               interpolation=cv2.INTER_AREA)
        frames.append(frame)
    cap.release()
    video = np.stack(frames).astype(np.float32) / 255.0
    return video.transpose(0, 3, 1, 2), float(fps)


def evaluate_reactivity(audio, sr: int, video, fps: int) -> dict:
    """-> {"rhythmic": float, "chromatic": float} (sectional.py:15-45)."""
    from .chroma import chromatic_reactivity
    from .rhythmic import rhythmic_reactivity

    audio = jnp.asarray(audio)
    video = jnp.asarray(video)
    return {
        "rhythmic": float(rhythmic_reactivity(audio, sr, video, fps)),
        "chromatic": float(chromatic_reactivity(audio, sr, video, fps)),
    }


def evaluate_file(video_path: str, audio, sr: int, downsample: int = 4) -> dict:
    video, fps = load_video(video_path, downsample)
    return evaluate_reactivity(audio, sr, video, int(round(fps)))
