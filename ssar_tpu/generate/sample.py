"""CLI: random-patch audio-reactive music video (`python -m ssar_tpu.generate.sample`).

Equivalent of ssar/random/sample.py:40-110: load audio -> MIR -> seeded
Patch -> StyleGAN2 palette -> chunked render with lazy noise evaluation ->
mp4.  Frames batch across the device mesh; noise chunks are evaluated
lazily per batch (the reference's memory strategy) and the device->host
boundary is double-buffered by gan/render.py.

``--smoke`` renders a tiny clip from synthetic audio with a random 64px
generator so the full path runs without any assets.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.features import audio2features  # noqa: F401  (re-exported convenience)
from ..gan.stylegan2 import StyleGAN2Config
from ..gan.video_io import VideoWriter
from ..gan.wrapper import StyleGAN2
from ..ops.resample import resample
from ..train.data import load_audio as load_audio_file
from .mir import retrieve_music_information
from .patch import Patch


def load_audio(audio_file: str, offset: float, duration: float | None, fps: float):
    """Mono waveform resampled to 1024*fps (ssar/random/sample.py:20-36)."""
    audio, sr = load_audio_file(audio_file)
    audio = audio[int(offset * sr):]
    if duration is not None:
        audio = audio[: int(duration * sr)]
    new_sr = int(1024 * fps)
    audio = np.asarray(resample(jnp.asarray(audio), int(sr), new_sr, lowpass_filter_width=6))
    return audio, new_sr


def generate(audio_file: str | None = None, patch_file: str | None = None, seed: int | None = None,
             latent_seeds: str | None = None, fps: float = 24, audio_offset: float = 0,
             audio_duration: float | None = None, downscale_factor: float = 4,
             aspect_ratio: float = 1, batch_size: int = 16, model_file: str | None = None,
             out_dir: str = "output", config: StyleGAN2Config | None = None,
             audio: np.ndarray | None = None, sr: int | None = None):
    if seed is None:
        seed = int(np.random.randint(0, 2**31))
    config = config or StyleGAN2Config()

    out_size = (round(aspect_ratio * config.resolution / downscale_factor),
                round(config.resolution / downscale_factor))
    stem = Path(audio_file).stem if audio_file else "synthetic"
    out_file = f"{out_dir}/{stem}_RandomPatches_seed{seed}_{out_size[0]}x{out_size[1]}.mp4"

    if audio is None:
        audio, sr = load_audio(audio_file, audio_offset, audio_duration, fps)

    print("extracting information from audio...")
    features, segmentations, tempo = retrieve_music_information(jnp.asarray(audio), sr)

    if patch_file is None:
        patch = Patch(features=features, segmentations=segmentations, tempo=tempo,
                      seed=seed, fps=fps)
    else:
        patch = Patch.load(patch_file, features=features, segmentations=segmentations,
                           tempo=tempo, fps=fps)
    print(patch)

    G = StyleGAN2(model_file=model_file, output_size=out_size, config=config, seed=seed)

    if latent_seeds is None:
        z = jax.random.normal(jax.random.PRNGKey(seed), (180, 512))
        latent_palette = G.mapper(z)
    else:
        latent_palette = G.get_w_latents(latent_seeds)

    print("preparing latent and noise sequences...")
    # The synthesizer renders at the nearest power of two >= the output size
    # (early exit) and bilinearly resizes; the patch's noise modules are
    # therefore generated on the SYNTH grid (square, pow2 downscale) and
    # aligned by spatial scale: when rendering 256px from a 1024px patch the
    # 4..256 layers take the noise banks whose downscaled size matches —
    # entries offset by 2*log2(d) — so the noise texture keeps the same
    # spatial frequency relative to the output pixels as the reference's
    # full-depth downscaled render (ssar/random/sample.py noise semantics).
    # The user's downscale_factor / aspect_ratio shape only the final resize.
    n_used = G.synthesizer.n_noises_used
    d_synth = max(config.resolution // G.synthesizer.synth_res, 1)
    latents, noise = patch.forward(latent_palette, downscale_factor=d_synth,
                                   aspect_ratio=1)
    offset = 2 * int(round(np.log2(d_synth)))
    noise = noise[offset : offset + n_used]

    print("rendering...")
    T = latents.shape[0]
    bs = min(batch_size, T)

    # ONE jitted program per chunk: the lazy noise tree, synthesis, and the
    # uint8 quantisation all trace together.  Eagerly evaluating the noise
    # modules costs dozens of dispatches per chunk (~25 ms each on the
    # tunneled runtime — measured 2-4 fps end-to-end vs 200+ fps raw
    # synthesis); fused, the per-chunk overhead is one dispatch.  The chunk
    # start is a traced scalar so every chunk shares one compiled shape.
    # the noise trees ride along as a pytree ARGUMENT (see generate/noise.py
    # _register) so their banks are referenced, not embedded as constants
    @jax.jit
    def render_chunk(L, i, mods, params, prep):
        N = {f"noise{j}": nm.forward(i, bs)[:, None] for j, nm in enumerate(mods)}
        frames = jnp.clip((G.synthesizer(latents=L, params=params, prep=prep, **N) + 1) / 2, 0, 1)
        # device-side I420 (gan/render.py:rgb_to_i420): 1.5 B/px over the
        # device->host link (vs 12 for f32 RGB), and the encoder consumes
        # YUV anyway; fall back to uint8 RGB at odd sizes
        if (frames.shape[1] == out_size[1] and frames.shape[2] == out_size[0]
                and out_size[1] % 4 == 0 and out_size[0] % 2 == 0):
            from ..gan.render import rgb_to_i420

            return rgb_to_i420(frames)
        return (frames * 255.0 + 0.5).astype(jnp.uint8)

    starts = list(range(0, T - bs + 1, bs))
    if starts and starts[-1] != T - bs:
        starts.append(T - bs)  # final chunk overlaps instead of going ragged
    # T == 0 (zero-length audio slice): no chunks, writer produces an empty file

    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    patch.save(out_file.replace(".mp4", ".json"))
    with VideoWriter(output_file=out_file, output_size=out_size, fps=fps,
                     audio_file=audio_file, audio_offset=audio_offset,
                     audio_duration=audio_duration) as video:
        pending, pending_start = None, 0
        for s in starts + [None]:  # double buffer: one chunk in flight
            nxt = None if s is None else render_chunk(latents[s : s + bs],
                                                      jnp.asarray(s, jnp.int32), noise,
                                                      G.synthesizer.params,
                                                      G.synthesizer._prep)
            if pending is not None:
                host = np.asarray(pending)
                skip = video.frames_written - pending_start  # overlap already written
                for f in host[skip:]:
                    video.write_i420(f) if f.ndim == 2 else video.write(f)
            pending, pending_start = nxt, (s or 0)
    print(f"wrote {out_file}")
    return out_file


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--audio_file", type=str, default=None)
    p.add_argument("--patch_file", type=str, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--latent_seeds", type=str, default=None)
    p.add_argument("--fps", type=float, default=24)
    p.add_argument("--audio_offset", type=float, default=0)
    p.add_argument("--audio_duration", type=float, default=None)
    p.add_argument("--downscale_factor", type=float, default=4)
    p.add_argument("--aspect_ratio", type=float, default=1)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--model_file", type=str, default=None)
    p.add_argument("--out_dir", type=str, default="output")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--config", type=str, default=None,
                   help="JSON config file; explicit CLI flags override it")
    args = p.parse_args(argv)
    if args.config:
        from ..utils.config import apply_config_file

        args = apply_config_file(p, args, args.config, argv)


    if args.smoke:
        fps, secs = 12, 4
        sr = int(1024 * fps)
        t = np.arange(sr * secs) / sr
        audio = (0.4 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 330 * t)
                 + 0.05 * np.random.RandomState(0).randn(len(t))).astype(np.float32)
        audio[:: sr // 2] += 1.0
        cfg = StyleGAN2Config(resolution=64)
        return generate(seed=args.seed or 42, fps=fps, downscale_factor=1, batch_size=8,
                        config=cfg, audio=audio, sr=sr, out_dir=args.out_dir)
    return generate(audio_file=args.audio_file, patch_file=args.patch_file, seed=args.seed,
                    latent_seeds=args.latent_seeds, fps=args.fps, audio_offset=args.audio_offset,
                    audio_duration=args.audio_duration, downscale_factor=args.downscale_factor,
                    aspect_ratio=args.aspect_ratio, batch_size=args.batch_size,
                    model_file=args.model_file, out_dir=args.out_dir)


if __name__ == "__main__":
    main()
