"""AV embedding extractors: VGGish (audio) and a SlowFast-style video net.

Equivalents of ssar/models/vggish.py (VGGish with a torch log-mel port) and
ssar/models/slowfast.py (SlowFast via detectron2/pytorchvideo) used by the
synchro-saliency analysis (ssar/analysis/synchro_saliency.py).

This image is zero-egress, so the reference's pretrained-zoo downloads are
unavailable; the architectures are implemented natively and accept weights
via `params` (convert torch checkpoints offline with the same tree layout).
Randomly-initialised instances still yield usable *relative* embeddings for
synchrony analysis (deterministic random features).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..audio.spectral import hann_window, mel_basis


def vggish_log_mel(audio: jax.Array, sr: int = 16000) -> jax.Array:
    """AudioSet VGGish front-end: 64-band log-mel patches of 96 frames
    (vggish.py:158-311's torch port, natively in jnp).

    25 ms windows, 10 ms hop, mel 125-7500 Hz. -> (n_examples, 96, 64).
    """
    win = int(round(sr * 0.025))
    hop = int(round(sr * 0.010))
    n_fft = int(2 ** np.ceil(np.log2(win)))
    from ..audio.spectral import frame_signal

    frames = frame_signal(audio, win, hop, center=False) * jnp.asarray(hann_window(win))
    spec = jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=1))
    basis = jnp.asarray(mel_basis(sr, n_fft, n_mels=64, fmin=125.0, fmax=7500.0))
    mel = jnp.log(spec @ basis.T + 0.01)
    n_ex = mel.shape[0] // 96
    return mel[: n_ex * 96].reshape(n_ex, 96, 64)


class VGGish(nn.Module):
    """(N, 96, 64) log-mel patches -> (N, 128) embeddings."""

    @nn.compact
    def __call__(self, x):
        h = x[..., None]
        for widths in ((64,), (128,), (256, 256), (512, 512)):
            for w in widths:
                h = nn.relu(nn.Conv(w, (3, 3), padding="SAME")(h))
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(4096)(h))
        h = nn.relu(nn.Dense(4096)(h))
        return nn.Dense(128)(h)


class VggishExtractor:
    """Audio -> sequence of 128-d embeddings (vggish.py's surface)."""

    def __init__(self, params=None, seed: int = 0):
        self.model = VGGish()
        ex = jnp.zeros((1, 96, 64))
        self.params = params if params is not None else self.model.init(jax.random.PRNGKey(seed), ex)
        self._fwd = jax.jit(lambda p, x: self.model.apply(p, x))

    def __call__(self, audio, sr: int):
        from ..ops.resample import resample

        audio = jnp.asarray(audio, jnp.float32)
        if sr != 16000:
            audio = resample(audio, int(sr), 16000, lowpass_filter_width=6)
        patches = vggish_log_mel(audio)
        return self._fwd(self.params, patches)


class SlowFastVideo(nn.Module):
    """Lightweight two-pathway 3-D conv video net (slowfast.py's
    architecture family): a slow pathway over strided frames and a fast
    low-channel pathway over all frames, laterally fused.
    (B, T, H, W, 3) -> (B, D).

    For the FAITHFUL SLOWFAST_8x8_R50 (pretrained-checkpoint compatible,
    per-layer LayerSlowFast features) use models.slowfast_r50."""

    features: int = 32
    alpha: int = 4

    @nn.compact
    def __call__(self, video):
        slow = video[:, :: self.alpha]
        fast = video

        def pathway(x, width, name):
            h = nn.Conv(width, (1, 7, 7), strides=(1, 2, 2), padding="SAME", name=f"{name}_stem")(x)
            h = nn.relu(h)
            for i in range(3):
                h = nn.Conv(width * 2 ** (i + 1), (3, 3, 3), strides=(1, 2, 2), padding="SAME",
                            name=f"{name}_b{i}")(h)
                h = nn.relu(h)
            return h

        hs = pathway(slow, self.features, "slow")
        hf = pathway(fast, self.features // 4, "fast")
        # lateral fusion: time-pool fast to slow rate
        hf_pooled = nn.avg_pool(hf, (self.alpha, 1, 1), strides=(self.alpha, 1, 1))
        hf_pooled = hf_pooled[:, : hs.shape[1]]
        h = jnp.concatenate([hs, hf_pooled], axis=-1)
        h = jnp.mean(h, axis=(1, 2, 3))
        return nn.Dense(256)(h)


class SlowFastExtractor:
    """Video (T, C, H, W) [0,1] -> clip embeddings (slowfast.py's surface)."""

    def __init__(self, params=None, seed: int = 0, clip_len: int = 16):
        self.model = SlowFastVideo()
        self.clip_len = clip_len
        ex = jnp.zeros((1, clip_len, 32, 32, 3))
        self.params = params if params is not None else self.model.init(jax.random.PRNGKey(seed), ex)
        self._fwd = jax.jit(lambda p, x: self.model.apply(p, x))

    def __call__(self, video):
        video = jnp.asarray(video, jnp.float32)
        if video.shape[1] == 3 and video.ndim == 4:
            video = jnp.transpose(video, (0, 2, 3, 1))
        T = video.shape[0]
        n = T // self.clip_len
        clips = video[: n * self.clip_len].reshape(n, self.clip_len, *video.shape[1:])
        return self._fwd(self.params, clips)


def synchro_saliency(audio, sr: int, video, fps: int, seed: int = 0):
    """AV synchrony curve: cosine similarity between time-aligned audio and
    video embeddings (ssar/analysis/synchro_saliency.py's core measurement)."""
    a = VggishExtractor(seed=seed)(audio, sr)  # ~1 embedding / 0.96 s
    v = SlowFastExtractor(seed=seed)(video)    # 1 embedding / clip_len frames
    n = min(a.shape[0], v.shape[0])
    a, v = a[:n], v[:n]
    d = min(a.shape[1], v.shape[1])
    a = a[:, :d] / (jnp.linalg.norm(a[:, :d], axis=1, keepdims=True) + 1e-8)
    v = v[:, :d] / (jnp.linalg.norm(v[:, :d], axis=1, keepdims=True) + 1e-8)
    return jnp.sum(a * v, axis=1)
