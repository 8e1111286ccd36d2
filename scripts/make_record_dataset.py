"""Build the config-of-record training corpus for the paper grid.

The reference's training data is (track.wav, track.npy W+ targets,
track_noise{4,8,16,32}.npy) per track, where the targets came from the
author's maua-era random-patch renders (ssar/supervised/data.py:165-192).
This script reproduces that data-generation story end to end with no
external assets: synthesize structured music (drums + bass + chord
sections), run the random-patch system on its MIR features to produce the
latent/noise target sequences, write the reference's corpus layout, then
preprocess into the windowed training cache.

    python scripts/make_record_dataset.py --out data/record --n_tracks 8

All tracks share one duration so every device program compiles once.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FPS = 24
SR = 1024 * FPS


def synth_track(seed: int, seconds: int = 48) -> np.ndarray:
    """Structured synthetic music: 4 sections x (kick/snare/hat pattern +
    bass line + chord pad), per-seed bpm/key/progression so MIR has real
    tempo, chroma, and section structure to find."""
    rng = np.random.RandomState(seed)
    n = SR * seconds
    t = np.arange(n) / SR
    out = np.zeros(n, np.float32)

    bpm = rng.choice([96, 112, 124, 140])
    beat = 60.0 / bpm
    root = rng.choice([110.0, 123.47, 130.81, 146.83])  # A2, B2, C3, D3

    # four sections with different chord degrees and hat density
    section_len = seconds / 4
    degrees = rng.choice([0, 3, 5, 7, 8, 10], size=(4, 3))
    for s in range(4):
        sl = slice(int(s * section_len * SR), int((s + 1) * section_len * SR))
        ts = t[sl] - s * section_len
        # chord pad: three detuned partials per degree
        pad = np.zeros_like(ts)
        for d in degrees[s]:
            f = root * 2 ** (d / 12.0) * 2
            pad += np.sin(2 * np.pi * f * ts) + 0.5 * np.sin(2 * np.pi * f * 2.003 * ts)
        out[sl] += 0.08 * pad.astype(np.float32)
        # bass: eighth-note arpeggio over the section's degrees
        step = beat / 2
        idx = (ts / step).astype(int)
        f_b = root * 2 ** (degrees[s][idx % 3] / 12.0)
        env = np.exp(-4 * ((ts % step) / step))
        out[sl] += (0.25 * env * np.sin(2 * np.pi * f_b * ts)).astype(np.float32)

    # drums, whole track
    phase = t % beat
    kick_env = np.exp(-30 * phase) * (np.sin(2 * np.pi * (55 + 120 * np.exp(-40 * phase)) * phase))
    out += 0.6 * kick_env.astype(np.float32)
    snare_phase = (t - beat) % (2 * beat)
    snare = np.exp(-25 * snare_phase) * rng.randn(n) * 0.5
    out += 0.3 * snare.astype(np.float32)
    hat_phase = t % (beat / 2)
    hats = np.exp(-90 * hat_phase) * rng.randn(n)
    out += 0.12 * hats.astype(np.float32)

    out += 0.01 * rng.randn(n).astype(np.float32)
    return (0.8 * out / np.abs(out).max()).astype(np.float32)


def make_targets(audio: np.ndarray, seed: int, palette) -> tuple:
    """Random-patch targets for one track: latents (T, 18, 512) +
    materialized noise pyramids at 4/8/16/32 (the levels the reactor
    predicts; NOISE_SIZES indices 0, 1, 3, 5)."""
    import jax.numpy as jnp

    from ssar_tpu.generate.mir import retrieve_music_information
    from ssar_tpu.generate.patch import Patch

    features, segmentations, tempo = retrieve_music_information(jnp.asarray(audio), SR)
    patch = Patch(features=features, segmentations=segmentations, tempo=tempo,
                  seed=seed, fps=FPS)
    latents, noise_modules = patch.forward(palette)
    T = latents.shape[0]
    noises = [np.asarray(noise_modules[i].forward(0, T), np.float32)
              for i in (0, 1, 3, 5)]
    return np.asarray(latents, np.float32), noises


def main():
    import faulthandler

    # the tunneled device RPC can stall; dump stacks periodically so a
    # silent log is diagnosable
    faulthandler.dump_traceback_later(300, repeat=True)

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/record")
    ap.add_argument("--n_tracks", type=int, default=8)
    ap.add_argument("--seconds", type=int, default=48)
    args = ap.parse_args()

    import jax
    from scipy.io import wavfile

    from ssar_tpu.gan.wrapper import StyleGAN2Mapper
    from ssar_tpu.train.data import preprocess_directory

    corpus = Path(args.out) / "corpus"
    cache = Path(args.out) / "cache"
    corpus.mkdir(parents=True, exist_ok=True)

    mapper = StyleGAN2Mapper(seed=0)
    palette = mapper(jax.random.normal(jax.random.PRNGKey(42), (180, 512)))

    for i in range(args.n_tracks):
        stem = corpus / f"track{i:02d}"
        if (stem.with_suffix(".npy")).exists():
            print(f"{stem.name}: exists, skipping")
            continue
        audio = synth_track(seed=1000 + i, seconds=args.seconds)
        latents, noises = make_targets(audio, seed=1000 + i, palette=palette)
        wavfile.write(stem.with_suffix(".wav"), SR, audio)
        np.save(stem.with_suffix(".npy"), latents)
        for s, nz in zip((4, 8, 16, 32), noises):
            np.save(f"{stem}_noise{s}.npy", nz)
        print(f"{stem.name}: T={latents.shape[0]} latents {latents.shape} ok", flush=True)

    meta = preprocess_directory(str(corpus), str(cache), dur=8, fps=FPS)
    n_train = np.load(cache / "train_features.npy", mmap_mode="r").shape[0]
    n_val = np.load(cache / "val_features.npy", mmap_mode="r").shape[0]
    print(f"cache ready: {n_train} train / {n_val} val windows "
          f"(split {meta['train']} | {meta['val']})")


if __name__ == "__main__":
    main()
