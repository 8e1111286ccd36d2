"""Example patch: chroma-weighted latent mixing (the classic recipe).

The hand-written equivalent of the reference's maua-era example patches
(ssar/patches/*): each chroma bin drives one palette latent, onsets
modulate the noise amplitude.  Run:

    python examples/chroma_weighted_latents.py --audio_file song.wav
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ssar_tpu.audio.features import chromagram, onsets
from ssar_tpu.gan.render import render_latents_to_video
from ssar_tpu.gan.stylegan2 import StyleGAN2Config
from ssar_tpu.gan.wrapper import StyleGAN2, make_noise_pyramid
from ssar_tpu.ops.gaussian import gaussian_filter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--audio_file", default=None)
    p.add_argument("--model_file", default=None)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--out", default="output/chroma_latents.mp4")
    args = p.parse_args()

    fps = args.fps
    sr = 1024 * fps
    if args.audio_file:
        from ssar_tpu.train.data import load_audio

        audio, in_sr = load_audio(args.audio_file)
        from ssar_tpu.ops.resample import resample

        audio = np.asarray(resample(jnp.asarray(audio), int(in_sr), sr, lowpass_filter_width=6))
    else:  # synthetic demo
        t = np.arange(sr * 6) / sr
        audio = (0.5 * np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 0.25 * t))).astype(np.float32)
        audio[:: sr // 2] += 1.0

    cfg = StyleGAN2Config(resolution=args.resolution)
    G = StyleGAN2(model_file=args.model_file, config=cfg)

    audio_j = jnp.asarray(audio)
    chroma = chromagram(audio_j, sr)          # (T, 12)
    chroma = chroma / (jnp.sum(chroma, axis=1, keepdims=True) + 1e-8)
    ons = onsets(audio_j, sr)[:, 0]           # (T,)

    palette = G.mapper(jax.random.normal(jax.random.PRNGKey(0), (12, 512)))
    latents = jnp.einsum("TC,CNL->TNL", chroma, palette)
    latents = gaussian_filter(latents, fps / 24)

    T = latents.shape[0]
    base_noise = jax.random.normal(jax.random.PRNGKey(1), (T, 1, 64, 64))
    base_noise = gaussian_filter(base_noise, 3.0) * ons[:, None, None, None]
    pyramid = make_noise_pyramid(base_noise, config=cfg)

    render_latents_to_video(G.synthesizer, latents,
                            [np.asarray(n) for n in pyramid[: G.synthesizer.n_noises_used]],
                            args.out, fps=fps, output_size=(args.resolution, args.resolution),
                            audio_file=args.audio_file)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
