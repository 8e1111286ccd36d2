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
) -> str:
    """Render a (T, n_ws, 512) latent sequence (+ optional per-layer noise
    sequences, NCHW (T, 1, H, W)) to an mp4, double-buffering the
    device->host boundary."""
    latents = jnp.asarray(latents, jnp.float32)
    T = latents.shape[0]
    if output_size is None:
        output_size = (synthesizer.config.resolution, synthesizer.config.resolution)

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
                video.write(f)
            pending = nxt
    return out_file
