"""Frame-parallel render pipeline: device synthesis overlapped with host encode.

Replaces the reference's synchronous render loop
(ssar/supervised/test.py:565-584, ssar/random/sample.py:84-104) with the
TPU-native choreography from SURVEY.md §7:

- frames are batched on the device mesh's data axis (``pjit``-sharded batch;
  on a multi-chip mesh each chip synthesises a slice of the batch),
- device->host transfer is double-buffered: batch N+1 is synthesised while
  batch N is fetched and encoded by cv2/ffmpeg on the host.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import get_mesh, shard_batch
from .video_io import VideoWriter


def rgb_to_i420(frames: jax.Array) -> jax.Array:
    """(B, H, W, 3) float RGB in [0, 1] -> (B, H*3//2, W) uint8 I420.

    Studio-range BT.601 with 2x2-mean chroma subsampling — the layout and
    matrix cv2's COLOR_YUV2BGR_I420 decodes (the host writer feeds the
    encoder YUV it would have produced itself from RGB frames).  Packing
    on device cuts the device->host transfer to 1.5 bytes/pixel from 3
    (uint8 RGB); on the tunneled runtime (~10 MB/s D2H) that halves
    long-form render wall time, and on PCIe hosts it halves transfer all
    the same.  Requires H % 4 == 0 and W % 2 == 0.
    """
    B, H, W, _ = frames.shape
    x = jnp.clip(frames, 0.0, 1.0) * 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 16.0 + 0.256788 * r + 0.504129 * g + 0.097906 * b
    r2 = r.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    g2 = g.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    b2 = b.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    u = 128.0 - 0.148223 * r2 - 0.290993 * g2 + 0.439216 * b2
    v = 128.0 + 0.439216 * r2 - 0.367788 * g2 - 0.071427 * b2
    yq = (y + 0.5).astype(jnp.uint8)
    u_rows = (u + 0.5).astype(jnp.uint8).reshape(B, H // 4, W)
    v_rows = (v + 0.5).astype(jnp.uint8).reshape(B, H // 4, W)
    return jnp.concatenate([yq, u_rows, v_rows], axis=1)


def render_latents_to_video(
    synthesizer,
    latents,
    noises: Sequence | None,
    out_file: str,
    fps: float = 24,
    output_size: tuple[int, int] | None = None,
    batch_size: int = 8,
    audio_file: str | None = None,
    audio_offset: float = 0,
    audio_duration: float | None = None,
    postprocess_fn: Callable | None = None,
    progress: bool = True,
    transfer: str = "auto",
) -> str:
    """Render a (T, n_ws, 512) latent sequence (+ optional per-layer noise
    sequences, NCHW (T, 1, H, W)) to an mp4, double-buffering the
    device->host boundary.

    ``transfer``: "i420" packs frames to YUV420 on device (1.5 B/px over
    the device->host link instead of 3), "rgb" fetches uint8 RGB, "auto"
    picks i420 whenever the synthesis size equals the output size and is
    divisible (H % 4, W % 2) — the lossless-to-the-encoder fast path."""
    latents = jnp.asarray(latents, jnp.float32)
    T = latents.shape[0]
    if output_size is None:
        output_size = (synthesizer.config.resolution, synthesizer.config.resolution)
    if transfer == "auto":
        w_, h_ = int(output_size[0]), int(output_size[1])
        transfer = "i420" if (h_ % 4 == 0 and w_ % 2 == 0) else "rgb"

    mesh = get_mesh()

    def synth(i):
        L = latents[i : i + batch_size]
        if L.shape[0] < batch_size:  # static-shape pad, trimmed after fetch
            L = jnp.concatenate([L, jnp.repeat(L[-1:], batch_size - L.shape[0], axis=0)])
        L = shard_batch(L, mesh)
        kw = {}
        if noises is not None:
            ns = []
            for n in noises:
                if n is None:
                    # patch declined this scale (reference patches return None
                    # for unwanted scales, e.g. patches/examples/01_intro.py):
                    # fall through to the synthesizer's stored noise
                    ns.append(None)
                    continue
                if callable(n) and not isinstance(n, (np.ndarray, jax.Array)):
                    # lazy noise-module algebra (generate/noise.py): only the
                    # [i, i+b) window is ever materialised — a full-track
                    # 1024px noise video never exists in memory
                    nn = jnp.asarray(n(i, min(batch_size, T - i)), jnp.float32)[:, :, :, None]
                else:
                    nn = jnp.asarray(n[i : i + batch_size], jnp.float32)
                    nn = jnp.transpose(nn, (0, 2, 3, 1))  # NCHW -> NHWC
                if nn.shape[0] < batch_size:
                    nn = jnp.concatenate([nn, jnp.repeat(nn[-1:], batch_size - nn.shape[0], axis=0)])
                ns.append(nn)
            kw["noises"] = ns
        if getattr(synthesizer, "bend_mods", None):
            # animated bends need absolute frame numbers for their
            # modulation slices (clamped for the final padded batch)
            kw["frame_idx"] = jnp.minimum(jnp.arange(i, i + batch_size), T - 1)
        frames = (synthesizer(L, **kw) + 1.0) / 2.0
        if postprocess_fn is not None:
            frames = postprocess_fn(frames)
        # quantise on device: the writer re-encodes to uint8 anyway, and u8
        # frames are 4x smaller both in HBM (two batches are alive under
        # double-buffering) and across the device->host fetch; clip AFTER
        # postprocess_fn so out-of-range postprocess outputs saturate instead
        # of wrapping around in the uint8 cast
        if (transfer == "i420"
                and frames.shape[1] == output_size[1] and frames.shape[2] == output_size[0]):
            return rgb_to_i420(frames)  # 1.5 B/px across the link
        return (jnp.clip(frames, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    starts = list(range(0, T, batch_size))
    it = range(len(starts))
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(it, unit_scale=batch_size, desc="render")
        except ImportError:
            pass

    with VideoWriter(out_file, output_size, fps=fps, audio_file=audio_file,
                     audio_offset=audio_offset, audio_duration=audio_duration) as video:
        pending = synth(starts[0]) if starts else None  # double buffer: one batch in flight
        for j in it:
            nxt = synth(starts[j + 1]) if j + 1 < len(starts) else None
            host_frames = np.asarray(pending)  # blocks on batch j only
            n_valid = min(batch_size, T - starts[j])
            for f in host_frames[:n_valid]:
                video.write_i420(f) if f.ndim == 2 else video.write(f)
            pending = nxt
    return out_file
