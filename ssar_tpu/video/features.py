"""Video features: histograms, spectrograms, band RMS, absdiff, directograms.

Equivalent of ssar/features/video.py (+ the duplicate paths in
ssar/analysis/visual_beats.py).  Videos are (T, C, H, W) float [0, 1]
(the reference layout).  TPU adaptations:

- per-frame histograms are vectorised one-hot scatter sums (torch.histc's
  data-min/max range semantics preserved),
- the log-polar warp (cv2.linearPolar) becomes a precomputed bilinear
  gather baked per (H, W) signature — no OpenCV on the device path,
- optical flow: ssar_tpu.video.flow provides a pure-jnp Farneback
  (conv-only, TPU-friendly) with the cv2 CPU path kept as test oracle.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.processing import normalize, onset_envelope, spectral_flux, standardize
from ..ops.absdiff import absdiff_ref
from ..ops.median import median_filter


# ------------------------------------------------------------ histograms --
def _histc(x: jax.Array, bins: int) -> jax.Array:
    """torch.histc semantics: range = [x.min(), x.max()], values on the upper
    edge land in the last bin.  x (...,) -> (bins,)."""
    lo, hi = jnp.min(x), jnp.max(x)
    scaled = (x - lo) / jnp.maximum(hi - lo, 1e-12) * bins
    idx = jnp.clip(jnp.floor(scaled), 0, bins - 1).astype(jnp.int32)
    return jnp.zeros(bins).at[idx.reshape(-1)].add(1.0)


def _channel_histogram(frames: jax.Array, bins: int) -> jax.Array:
    """(T, H, W) -> (T, bins), each row max-normalised."""
    hist = jax.vmap(lambda f: _histc(f, bins))(frames)
    return hist / jnp.max(hist, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("bins",))
def redogram(video, bins: int = 32):
    return _channel_histogram(video[:, 0], bins)


@partial(jax.jit, static_argnames=("bins",))
def greenogram(video, bins: int = 32):
    return _channel_histogram(video[:, 1], bins)


@partial(jax.jit, static_argnames=("bins",))
def blueogram(video, bins: int = 32):
    return _channel_histogram(video[:, 2], bins)


@partial(jax.jit, static_argnames=("bins",))
def rgb_hist(video, bins: int = 96):
    b = bins // 3
    return jnp.concatenate([redogram(video, b), greenogram(video, b), blueogram(video, b)], -1)


def rgb_to_hsv(video: jax.Array) -> jax.Array:
    """(T, 3, H, W) RGB [0,1] -> HSV with hue in [0, 2*pi] (kornia convention)."""
    r, g, b = video[:, 0], video[:, 1], video[:, 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    hr = ((g - b) / safe) % 6.0
    hg = (b - r) / safe + 2.0
    hb = (r - g) / safe + 4.0
    h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb))
    h = jnp.where(delta == 0, 0.0, h) * (jnp.pi / 3)
    return jnp.stack([h, s, v], axis=1)


@partial(jax.jit, static_argnames=("bins",))
def huestogram(video, bins: int = 32):
    return _channel_histogram(rgb_to_hsv(video)[:, 0], bins)


@partial(jax.jit, static_argnames=("bins",))
def saturogram(video, bins: int = 32):
    return _channel_histogram(rgb_to_hsv(video)[:, 1], bins)


@partial(jax.jit, static_argnames=("bins",))
def valueogram(video, bins: int = 32):
    return _channel_histogram(rgb_to_hsv(video)[:, 2], bins)


@partial(jax.jit, static_argnames=("bins",))
def hsv_hist(video, bins: int = 96):
    b = bins // 3
    return jnp.concatenate([huestogram(video, b), saturogram(video, b), valueogram(video, b)], -1)


# ----------------------------------------------------- variance / motion --
@jax.jit
def visual_variance(video):
    return jnp.var(video, axis=(1, 2, 3))[:, None]


@partial(jax.jit, static_argnames=("stride",))
def absdiff(video, stride: int = 64):
    """(T, ...) -> (T, 1) framewise sum |diff| (video.py:65-74)."""
    return absdiff_ref(video)[:, None]


# -------------------------------------------------- spatial spectrogram --
@lru_cache(maxsize=8)
def _linear_polar_gather(h: int, w: int):
    """cv2.linearPolar(center=(0,0), maxRadius=max(h,w)//4 within the cropped
    (h//2, w//2) plane): dest (y, x) samples src at
    (rho*cos(phi), rho*sin(phi)) with rho = x/W * maxRadius, phi = y/H * 2pi.
    Returns bilinear gather indices/weights (host numpy, static)."""
    hh, ww = h, w
    radius = max(hh * 2, ww * 2) // 4  # max(h, w) // 4 of the FULL frame
    ys, xs = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
    phi = ys * 2 * np.pi / hh
    rho = xs * radius / ww
    sx = rho * np.cos(phi)
    sy = rho * np.sin(phi)
    x0, y0 = np.floor(sx).astype(int), np.floor(sy).astype(int)
    fx, fy = sx - x0, sy - y0
    valid = (x0 >= 0) & (x0 < ww - 1) & (y0 >= 0) & (y0 < hh - 1)
    x0c, y0c = np.clip(x0, 0, ww - 2), np.clip(y0, 0, hh - 2)
    idx = y0c * ww + x0c
    weights = np.stack([(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy], -1)
    offsets = np.array([0, 1, ww, ww + 1])
    return (idx[..., None] + offsets).reshape(-1, 4), (weights * valid[..., None]).reshape(-1, 4)


def fft(video, norm: str = "forward"):
    _, _, h, w = video.shape
    return jnp.fft.rfft2(video, norm=norm)[..., : h // 2, : w // 2]


@jax.jit
def video_spectrogram(video):
    """(T, C, H, W) -> (T, F) log-polar-averaged spatial spectrum
    (video.py:88-97)."""
    freqs = jnp.abs(fft(video))
    lo = jnp.quantile(freqs, 0.0015)
    hi = jnp.quantile(freqs, 0.9985)
    freqs = jnp.clip(freqs, lo, hi)
    T, C, hh, ww = freqs.shape
    idx, wts = _linear_polar_gather(hh, ww)
    flat = freqs.reshape(T, C, hh * ww)
    warped = jnp.sum(flat[:, :, idx] * jnp.asarray(wts)[None, None], axis=-1)
    warped = warped.reshape(T, C, hh, ww)
    return jnp.mean(warped, axis=(1, 2))[:, 2:]


@jax.jit
def low_freq_rms(video):
    spec = video_spectrogram(video)
    f = spec.shape[1]
    return jnp.mean(spec[:, : f // 3] ** 2, axis=1, keepdims=True)


@jax.jit
def mid_freq_rms(video):
    spec = video_spectrogram(video)
    f = spec.shape[1]
    return jnp.mean(spec[:, f // 3 : 2 * f // 3] ** 2, axis=1, keepdims=True)


@jax.jit
def high_freq_rms(video):
    spec = video_spectrogram(video)
    f = spec.shape[1]
    return jnp.mean(spec[:, 2 * f // 3 :] ** 2, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("k",))
def adaptive_freq_rms(video, k: int = 10):
    spec = video_spectrogram(video)
    top = jax.lax.top_k(jnp.std(spec, axis=0), k)[1]
    return jnp.mean(spec[:, top] ** 2, axis=1, keepdims=True)


# ----------------------------------------------------------- optical flow --
def optical_flow(video, backend: str = "jax"):
    """(T, C, H, W) -> (T, 2, H, W) [standardised magnitude, normalised angle].

    backend "jax": pure-jnp Farneback (ssar_tpu/video/flow.py, TPU path);
    backend "cv2": the reference's CPU worker pool path (test oracle).
    """
    if backend == "cv2":
        flow = _optical_flow_cv2(np.asarray(video))
        return _flow_postprocess(flow)
    return _optical_flow_jax(video)


@jax.jit
def _flow_postprocess(flow: jax.Array) -> jax.Array:
    mag = standardize(flow[:, 0])
    ang = normalize(flow[:, 1])
    return jnp.stack([mag, ang], axis=1)


@jax.jit
def _optical_flow_jax(video: jax.Array) -> jax.Array:
    from .flow import farneback_flow

    gray = jnp.mean(video, axis=1)
    uv = farneback_flow(gray)  # (T-1, 2, H, W)
    flow = jnp.concatenate([uv[:1], uv], axis=0)
    mag = jnp.sqrt(flow[:, 0] ** 2 + flow[:, 1] ** 2)
    ang = jnp.arctan2(flow[:, 1], flow[:, 0])
    return _flow_postprocess(jnp.stack([mag, ang], axis=1))


def _optical_flow_cv2(video: np.ndarray) -> jnp.ndarray:
    import cv2

    frames = (np.transpose(video, (0, 2, 3, 1)) * 255).astype(np.uint8)
    grays = [cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames]
    flows = []
    for prev, nxt in zip(grays[:-1], grays[1:]):
        f = cv2.calcOpticalFlowFarneback(prev, nxt, None, pyr_scale=0.5, levels=6, winsize=25,
                                         iterations=10, poly_n=25, poly_sigma=3.0,
                                         flags=cv2.OPTFLOW_FARNEBACK_GAUSSIAN)
        mag = np.sqrt(f[..., 0] ** 2 + f[..., 1] ** 2)
        ang = np.arctan2(f[..., 1], f[..., 0])
        flows.append(np.stack([mag, ang]))
    flows = np.stack([flows[0]] + flows)
    return jnp.asarray(flows)


@partial(jax.jit, static_argnames=("bins",))
def directogram(flow, bins: int = 8):
    """Angle-binned flow-magnitude histogram (video.py:159-175). (T, bins)."""
    bin_width = 256 // bins
    angle_bins = jnp.linspace(0, 255, bins)
    f255 = jnp.floor(flow * 255).astype(jnp.int32).astype(jnp.float32)
    ang = f255[:, 1]  # (T, H, W)
    within = jnp.abs(angle_bins[None, None, None, :] - ang[..., None]) <= bin_width
    bin_idx = jnp.argmax(within, axis=-1)  # first matching bin
    onehot = jax.nn.one_hot(bin_idx, bins)  # (T, H, W, bins)
    dg = jnp.einsum("thw,thwb->tb", f255[:, 0], onehot) / 255.0
    return median_filter(median_filter(dg, 3, axis=0), 3, axis=1)


def video_flow_onsets(video, backend: str = "jax"):
    flow = optical_flow(video, backend=backend)
    spec = directogram(flow)
    return onset_envelope(spectral_flux(spec))[:, None]


@jax.jit
def video_spectral_onsets(video):
    spec = video_spectrogram(video)
    return onset_envelope(spectral_flux(spec))[:, None]


VIDEO_FEATURES = {
    "rgb_hist": rgb_hist,
    "hsv_hist": hsv_hist,
    "visual_variance": visual_variance,
    "absdiff": absdiff,
    "video_spectrogram": video_spectrogram,
    "low_freq_rms": low_freq_rms,
    "mid_freq_rms": mid_freq_rms,
    "high_freq_rms": high_freq_rms,
    "adaptive_freq_rms": adaptive_freq_rms,
    "video_flow_onsets": video_flow_onsets,
    "video_spectral_onsets": video_spectral_onsets,
    "directogram": lambda v: directogram(optical_flow(v)),
}
