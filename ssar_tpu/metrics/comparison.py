"""Evaluation harness comparing the three generation paradigms.

Equivalent of ssar/comparison.py (`compare_big_three`, :443-555): for each
test clip, each model family (random patches / trained sequence model /
test-time optimization) predicts a latent+noise sequence, a low-res video
is rendered, 12 video-feature and 9 audio-feature matrices are extracted,
and the audio-reactivity correlation (1 - procrustes loss) is recorded —
overall and for every audio-feature x video-feature pair.

Resume semantics mirror the reference's incremental dumps: one json per
(clip, model) under `out_dir`, skipped when present (comparison.py:453-479).
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import features as AF
from ..train.losses import audio_reactive_loss
from ..video import features as VF

AFNS = [AF.chromagram, AF.tonnetz, AF.mfcc, AF.spectral_contrast, AF.rms, AF.drop_strength,
        AF.onsets, AF.spectral_flatness, AF.pulse]
VFNS = [VF.rgb_hist, VF.hsv_hist, VF.video_spectrogram,
        lambda v: VF.directogram(VF.optical_flow(v)),
        VF.low_freq_rms, VF.mid_freq_rms, VF.high_freq_rms, VF.adaptive_freq_rms,
        VF.absdiff, VF.visual_variance, VF.video_flow_onsets, VF.video_spectral_onsets]
VFN_NAMES = ["rgb_hist", "hsv_hist", "video_spectrogram", "directogram", "low_freq_rms",
             "mid_freq_rms", "high_freq_rms", "adaptive_freq_rms", "absdiff",
             "visual_variance", "video_flow_onsets", "video_spectral_onsets"]


class RandomGenerator:
    """Random-patch predictor (comparison.py:58-74)."""

    def __init__(self, G, fps: int = 24, seed: int | None = None):
        self.G, self.fps, self.seed = G, fps, seed

    def predict(self, audio, sr, palette=None):
        from ..generate.mir import retrieve_music_information
        from ..generate.patch import Patch

        features, segmentations, tempo = retrieve_music_information(audio, sr)
        seed = self.seed if self.seed is not None else int(np.random.randint(0, 2**31))
        patch = Patch(features=features, segmentations=segmentations, tempo=tempo,
                      seed=seed, fps=self.fps)
        if palette is None:
            palette = self.G.mapper(jax.random.normal(jax.random.PRNGKey(seed), (180, 512)))
        return patch.forward(palette)


class SupervisedSequenceModel:
    """Checkpointed reactor predictor (comparison.py:77-95)."""

    def __init__(self, model, params, fps: int = 24, residual: bool = False, G=None):
        self.model, self.params, self.fps, self.residual, self.G = model, params, fps, residual, G

    def predict(self, audio, sr, palette=None):
        from ..audio.features import audio2features

        feats = audio2features(jnp.asarray(audio), int(sr), self.fps)
        latents, noise = self.model.apply(self.params, feats[None],
                                          rngs={"noise": jax.random.PRNGKey(0)})
        latents = latents[0]
        if self.residual and self.G is not None:
            z = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
            latents = latents + self.G.mapper(z)[0]
        return latents, [n[0] for n in noise]


class SelfSupervisedOptimization:
    """Per-track test-time optimization predictor (comparison.py:98-211)."""

    def __init__(self, fps: int = 24, n_steps: int = 128, gan_config=None, model_file=None):
        self.fps, self.n_steps = fps, n_steps
        self.gan_config, self.model_file = gan_config, model_file

    def predict(self, audio, sr, palette=None):
        from ..generate.optimize import optimize

        _, latents, noise, _ = optimize(audio=np.asarray(audio), sr=int(sr), fps=self.fps,
                                        n_steps=self.n_steps, gan_config=self.gan_config,
                                        model_file=self.model_file, render=False)
        return latents, noise


def _render_lowres(G, latents, noise, batch_size: int = 16, size: int = 128):
    """Render + resize to (T, C, size, size) for feature extraction."""
    from ..gan.wrapper import make_noise_pyramid

    T = latents.shape[0]
    noise_modules = noise is not None and hasattr(noise[0], "__call__") and not isinstance(noise[0], jnp.ndarray)
    pyramid = None
    if noise is not None and not noise_modules:
        noise_nchw = [np.asarray(n)[:, None] if np.asarray(n).ndim == 3 else np.asarray(n) for n in noise]
        pyramid = [noise_nchw[0]] + [n for nn in noise_nchw[1:] for n in (nn, nn)]
    n_used = G.synthesizer.n_noises_used
    frames = []
    for i in range(0, T, batch_size):
        L = latents[i : i + batch_size]
        b = L.shape[0]
        kw = {}
        if noise_modules:
            kw = {f"noise{j}": nm.forward(i, b)[:, None] for j, nm in enumerate(noise[:n_used])}
        elif pyramid is not None:
            kw = {f"noise{j}": p[i : i + b] for j, p in enumerate(pyramid[:n_used])}
        f = jnp.clip((G.synthesizer(L, **kw) + 1) / 2, 0, 1)
        f = jax.image.resize(f, (f.shape[0], size, size, 3), method="bilinear")
        frames.append(np.asarray(f))
    return jnp.asarray(np.concatenate(frames).transpose(0, 3, 1, 2))


def evaluate_clip(G, model, audio, sr) -> dict:
    """One (model, clip) evaluation -> correlation record."""
    latents, noise = model.predict(audio, sr)
    video = _render_lowres(G, latents, noise)

    vfeats = {name: fn(video)[None] for name, fn in zip(VFN_NAMES, VFNS)}
    afeats = {fn.__name__: fn(jnp.asarray(audio), int(sr))[None] for fn in AFNS}

    record = {"correlation": float(1 - audio_reactive_loss(afeats, vfeats)[0])}
    for an, af in afeats.items():
        for vn, vf in vfeats.items():
            record[f"{an}|{vn}"] = float(1 - audio_reactive_loss([af], [vf])[0])
    return record


def compare_models(name: str, models: dict, clips: list, G, out_dir: str = "output",
                   forward_only: bool = False):
    """models: {model_name: predictor}; clips: [(clip_name, audio, sr), ...].

    Incremental per-(clip, model) json resume; returns list of records and
    writes a csv via pandas (comparison.py:553-555).  `forward_only=True`
    records only model-forward wall time per clip — the reference's
    inference-speed benchmark mode (comparison.py:505-510).
    """
    import time

    out = Path(out_dir) / name
    out.mkdir(parents=True, exist_ok=True)
    records = []
    for clip_name, audio, sr in clips:
        for model_name, model in models.items():
            item = out / f"{clip_name}_{model_name}.json"
            if item.exists():
                records.append(json.loads(item.read_text()))
                continue
            try:
                if forward_only:
                    t0 = time.time()
                    latents, noise = model.predict(audio, sr)
                    jax.block_until_ready(latents)
                    rec = {"n": int(np.asarray(audio).shape[-1] // 1024),
                           "time": time.time() - t0}
                else:
                    rec = evaluate_clip(G, model, audio, sr)
            except Exception as e:  # keep long sweeps alive (comparison.py:350-351)
                print(f"ERROR {clip_name}/{model_name}: {e}")
                continue
            rec.update({"clip": clip_name, "model_name": model_name})
            item.write_text(json.dumps(rec))
            records.append(rec)
            tag = (f"{rec['n'] / max(rec['time'], 1e-9):.1f} frames/s" if forward_only
                   else f"correlation {rec['correlation']:.4f}")
            print(f"{clip_name}/{model_name}: {tag}")

    try:
        import pandas as pd

        pd.DataFrame(records).to_csv(out.with_suffix(".csv"))
    except ImportError:
        pass
    return records
