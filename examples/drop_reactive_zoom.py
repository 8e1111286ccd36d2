"""Example patch: drop-strength section morphs + onset-reactive noise.

Second maua-era-style example (ssar/patches/*): long-term RMS ("drop
strength") interpolates between two palette regions (calm vs drop), while
band-split onsets drive three noise bands at different scales.
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ssar_tpu.audio.features import drop_strength, onsets, percussive
from ssar_tpu.audio.beat import onset_strength
from ssar_tpu.audio.processing import high_pass, low_pass, normalize
from ssar_tpu.gan.render import render_latents_to_video
from ssar_tpu.gan.stylegan2 import StyleGAN2Config
from ssar_tpu.gan.wrapper import StyleGAN2, make_noise_pyramid
from ssar_tpu.generate.latent import spline_loop_latents
from ssar_tpu.ops.gaussian import gaussian_filter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--audio_file", default=None)
    p.add_argument("--model_file", default=None)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--out", default="output/drop_reactive.mp4")
    args = p.parse_args()

    fps = args.fps
    sr = 1024 * fps
    if args.audio_file:
        from ssar_tpu.ops.resample import resample
        from ssar_tpu.train.data import load_audio

        audio, in_sr = load_audio(args.audio_file)
        audio = np.asarray(resample(jnp.asarray(audio), int(in_sr), sr, lowpass_filter_width=6))
    else:
        t = np.arange(sr * 6) / sr
        audio = (0.3 * np.sin(2 * np.pi * 110 * t) * (t / t.max())).astype(np.float32)
        audio[:: sr // 3] += 1.2

    cfg = StyleGAN2Config(resolution=args.resolution)
    G = StyleGAN2(model_file=args.model_file, config=cfg)
    audio_j = jnp.asarray(audio)

    drop = normalize(drop_strength(audio_j, sr)[:, 0])  # (T,)
    T = drop.shape[0]

    calm = spline_loop_latents(G.mapper(jax.random.normal(jax.random.PRNGKey(0), (6, 512))), T)
    wild = spline_loop_latents(G.mapper(jax.random.normal(jax.random.PRNGKey(1), (6, 512))), T, n_loops=4)
    latents = calm * (1 - drop[:, None, None]) + wild * drop[:, None, None]

    perc = percussive(audio_j)
    ons_low = normalize(onset_strength(low_pass(perc, sr), sr))
    ons_high = normalize(onset_strength(high_pass(perc, sr), sr))

    base = jax.random.normal(jax.random.PRNGKey(2), (T, 1, 64, 64))
    base = gaussian_filter(base, 2.0)
    noise = base * (0.5 + ons_low[:, None, None, None] + 0.5 * ons_high[:, None, None, None])
    pyramid = make_noise_pyramid(noise, config=cfg)

    render_latents_to_video(G.synthesizer, latents,
                            [np.asarray(n) for n in pyramid[: G.synthesizer.n_noises_used]],
                            args.out, fps=fps, output_size=(args.resolution, args.resolution),
                            audio_file=args.audio_file)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
