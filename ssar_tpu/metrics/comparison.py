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
    """Random-patch predictor (comparison.py:58-74).

    MIR retrieval (feature stack + host beat tracking + host scipy
    laplacian segmentation) costs minutes per clip on a 1-core host and is
    a pure function of the audio, so it is memoized per clip: the study's
    forward-only runtime pass re-predicts the same clips right after the
    battery (comparison.py:505-510) and must not pay MIR twice.  Per-clip
    MIR wall time is logged in ``mir_seconds`` so the runtime table can
    report it separately from ``patch.forward``.
    """

    def __init__(self, G, fps: int = 24, seed: int | None = None):
        self.G, self.fps, self.seed = G, fps, seed
        self._mir_cache: dict = {}
        self.mir_seconds: list = []

    def _mir(self, audio, sr):
        import hashlib
        import time

        a = np.asarray(audio)
        # full-content digest: milliseconds vs the minutes-long MIR pass, and
        # immune to distinct clips agreeing on a 64-sample subsample (advisor r4)
        key = (a.shape, int(sr), hashlib.sha1(np.ascontiguousarray(a).tobytes()).hexdigest())
        if key not in self._mir_cache:
            from ..generate.mir import retrieve_music_information

            t0 = time.time()
            self._mir_cache[key] = retrieve_music_information(audio, sr)
            self.mir_seconds.append(round(time.time() - t0, 1))
        return self._mir_cache[key]

    def predict(self, audio, sr, palette=None, interp=None):
        from ..generate.patch import Patch

        features, segmentations, tempo = self._mir(audio, sr)
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

    def predict(self, audio, sr, palette=None, interp=None):
        from ..audio.features import audio2features

        feats = audio2features(jnp.asarray(audio), int(sr), self.fps)
        latents, noise = self.model.apply(self.params, feats[None],
                                          rngs={"noise": jax.random.PRNGKey(0)})
        latents = latents[0]
        if self.residual:
            if interp is not None:  # provided base walk (comparison.py:92-94)
                latents = latents + jnp.asarray(interp)[: latents.shape[0]]
            elif self.G is not None:
                z = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
                latents = latents + self.G.mapper(z)[0]
        return latents, [n[0] for n in noise]


class SelfSupervisedOptimization:
    """Per-track test-time optimization predictor (comparison.py:98-211).

    Faithful to the COMPARISON variant of the optimizer, not the standalone
    ``ssar/optimize.py`` one: 512 steps, per-feature orthogonal procrustes
    objective (the same measure the study scores), no gradient
    normalization, a 3x3x3 winner-takes-all latent split and 5 noise
    envelopes (comparison.py:100-117,176-199)."""

    # the comparison harness's per-feature weight boosts (comparison.py:138-141)
    WEIGHT_BOOSTS = {"onsets": 3.0, "rms": 10.0, "rosa_segmentation": 2.0, "drop_strength": 10.0}

    def __init__(self, fps: int = 24, n_steps: int = 512, gan_config=None, model_file=None,
                 objective: str = "procrustes", lambda_amplitude: float = 0.0,
                 target_latent_step: float = 0.048):
        self.fps, self.n_steps = fps, n_steps
        self.gan_config, self.model_file = gan_config, model_file
        self.objective = objective
        # opt-in amplitude prior (generate/optimize.py docstring): the
        # procrustes objective is scale-invariant, so without it ssopt
        # under-moves by ~25x vs the patch system (docs/STUDY.md r4 §4)
        self.lambda_amplitude = lambda_amplitude
        self.target_latent_step = target_latent_step
        self.log_steps = 16  # optimize()'s loss-sample stride (for curve axes)
        self.loss_curves: list = []  # one loss curve per predict() call

    def predict(self, audio, sr, palette=None, interp=None, n_params: int = 128,
                emphasize_feature: str | None = None,
                use_audio_segmentation_features: bool = True):
        from ..generate.optimize import optimize

        _, latents, noise, losses = optimize(
            audio=np.asarray(audio), sr=int(sr), fps=self.fps,
            n_steps=self.n_steps, n_params=n_params, gan_config=self.gan_config,
            n_latent_split=3, n_latent_groups=3, n_latent_per_group=3, n_noise=5,
            objective=self.objective, norm_grads=False,
            model_file=self.model_file, render=False, palette=palette, interp=interp,
            emphasize_feature=emphasize_feature,
            use_audio_segmentation_features=use_audio_segmentation_features,
            feature_weight_boosts=self.WEIGHT_BOOSTS, log_steps=self.log_steps,
            lambda_amplitude=self.lambda_amplitude,
            target_latent_step=self.target_latent_step)
        self.loss_curves.append(losses)
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
    """One (model, clip) evaluation -> correlation record.

    Besides the video-feature correlation the reference scores
    (comparison.py:538-548), each record carries render-gap diagnostics:
    the same procrustes correlation computed directly on the predicted
    LATENT/NOISE sequences (what ssopt optimizes), and the mean latent /
    pixel frame-to-frame step sizes (is a model's score explained by how
    much its video moves at all?).
    """
    latents, noise = model.predict(audio, sr)
    video = _render_lowres(G, latents, noise)

    vfeats = {name: fn(video)[None] for name, fn in zip(VFN_NAMES, VFNS)}
    afeats = {fn.__name__: fn(jnp.asarray(audio), int(sr))[None] for fn in AFNS}

    record = {"correlation": float(1 - audio_reactive_loss(afeats, vfeats)[0])}
    for an, af in afeats.items():
        for vn, vf in vfeats.items():
            record[f"{an}|{vn}"] = float(1 - audio_reactive_loss([af], [vf])[0])

    T = int(latents.shape[0])
    lat = jnp.reshape(latents, (T, -1))
    lfeats = {"latents": lat[None]}
    for j, n in enumerate(_materialized_noise(noise, T)):
        lfeats[f"noise{j}"] = jnp.reshape(n, (T, -1))[None]
    record["latent_correlation"] = float(1 - audio_reactive_loss(afeats, lfeats)[0])
    record["mean_latent_step"] = float(jnp.mean(jnp.abs(jnp.diff(lat, axis=0))))
    record["mean_pixel_step"] = float(jnp.mean(jnp.abs(jnp.diff(video, axis=0))))
    return record


def _materialized_noise(noise, T: int, max_size: int = 64) -> list:
    """Noise predictions as (T, ...) arrays for latent-space scoring; lazy
    patch noise modules are materialized up to ``max_size`` pixels wide."""
    if noise is None:
        return []
    out = []
    for n in noise:
        if hasattr(n, "forward") and not isinstance(n, jnp.ndarray):
            n = n.forward(0, T)
            if n.shape[-1] > max_size:
                continue
        out.append(jnp.asarray(n))
    return out


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
                t0 = time.time()
                if forward_only:
                    latents, noise = model.predict(audio, sr)
                    jax.block_until_ready(latents)
                    rec = {"n": int(np.asarray(audio).shape[-1] // 1024),
                           "time": time.time() - t0}
                else:
                    rec = evaluate_clip(G, model, audio, sr)
            except Exception as e:  # keep long sweeps alive (comparison.py:350-351)
                print(f"ERROR {clip_name}/{model_name}: {e}")
                continue
            rec.update({"clip": clip_name, "model_name": model_name,
                        "wall_s": round(time.time() - t0, 1)})
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


class LucidSonicBaseline:
    """JAX-native stand-in for the LucidSonicDreams baseline
    (comparison.py:358-439,491-499 'lucid').

    The reference times the external lucidsonicdreams package's vector
    generation (speed_fpm latent walk + percussive pulse + harmonic motion)
    via a monkeypatched ``hallucinate``; here the same recipe is a small
    on-device program: palette keyframes interpolated at ``speed_fpm``,
    an onset-scaled pulse perturbation, and a harmonic-energy-modulated
    random walk, all gaussian-smoothed.
    """

    def __init__(self, G, fps: int = 24, speed_fpm: int = 12, pulse_react: float = 0.5,
                 motion_react: float = 0.5, seed: int = 0):
        self.G, self.fps, self.speed_fpm = G, fps, speed_fpm
        self.pulse_react, self.motion_react, self.seed = pulse_react, motion_react, seed

    def predict(self, audio, sr, palette=None, interp=None):
        from ..audio import features as AF
        from ..ops.gaussian import gaussian_filter

        audio = jnp.asarray(audio)
        T = int(audio.shape[-1] // 1024)
        key = jax.random.PRNGKey(self.seed)
        k_base, k_pulse, k_motion = jax.random.split(key, 3)

        # base walk: speed_fpm keyframes per minute, smooth-interpolated
        n_key = max(2, int(round(self.speed_fpm * T / (self.fps * 60))) + 1)
        zs = jax.random.normal(k_base, (n_key, 512))
        pos = jnp.linspace(0, n_key - 1, T)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_key - 2)
        frac = (pos - i0)[:, None]
        z = zs[i0] * (1 - frac) + zs[i0 + 1] * frac
        z = gaussian_filter(z, self.fps / 4)

        # pulse: percussive onset envelope kicks a fixed direction in and out
        onset = AF.onsets(audio, int(sr))[:T, 0]
        pulse_dir = jax.random.normal(k_pulse, (512,))
        z = z + self.pulse_react * onset[:, None] * pulse_dir[None]

        # motion: harmonic RMS modulates the step size of a smoothed walk
        harm_env = AF.rms(AF.harmonic(audio), int(sr))[:T, 0]
        steps = gaussian_filter(jax.random.normal(k_motion, (T, 512)), 4)
        z = z + self.motion_react * jnp.cumsum(harm_env[:, None] * steps, axis=0) / jnp.sqrt(T)

        if self.G is not None:
            latents = self.G.mapper(z)
        else:
            latents = jnp.repeat(z[:, None, :], 18, axis=1)
        return latents, None


def evaluate_trained_checkpoint_dirs(run_dirs, name: str, clips, G, n_ckpts: int = 1,
                                     out_dir: str = "output"):
    """Correlation sweep over training runs x checkpoint steps x clips
    (comparison.py:266-355).

    ``run_dirs`` are our train.py run directories (config.json + Orbax
    ckpt/); hyperparameters come from the stored config instead of parsing
    run-dir name strings.  ``n_ckpts`` evenly-spaced checkpoint steps are
    evaluated per run (always including the last).  Incremental per-job
    json resume; returns records and writes ``<out_dir>/<name>.csv``.
    """
    import orbax.checkpoint as ocp

    from ..train.evaluate import load_checkpoint

    out = Path(out_dir) / name
    out.mkdir(parents=True, exist_ok=True)
    records = []
    for run_dir in run_dirs:
        run_dir = Path(run_dir)
        cfg = json.loads((run_dir / "config.json").read_text())
        mgr = ocp.CheckpointManager(run_dir.resolve() / "ckpt")
        steps = sorted(mgr.all_steps())
        if n_ckpts > 1:
            sel = np.linspace(0, len(steps) - 1, min(n_ckpts, len(steps))).round().astype(int)
            steps = [steps[i] for i in sorted(set(sel.tolist()))]
        else:
            steps = steps[-1:]
        for step in steps:
            model, params, _ = load_checkpoint(str(run_dir), step=step)
            predictor = SupervisedSequenceModel(model, params, residual=cfg.get("residual", False), G=G)
            for clip_name, audio, sr in clips:
                item = out / f"{run_dir.name}_step{step}_{clip_name}.json"
                if item.exists():
                    records.append(json.loads(item.read_text()))
                    continue
                try:
                    rec = evaluate_clip(G, predictor, audio, sr)
                except Exception as e:  # keep sweeps alive (comparison.py:350-351)
                    print(f"ERROR {run_dir.name}/step{step}/{clip_name}: {e}")
                    continue
                rec.update({"run": run_dir.name, "clip": clip_name, "steps": int(step),
                            **{k: cfg[k] for k in ("backbone", "loss", "decoder", "residual",
                                                   "n_latent_split", "hidden_size", "num_layers",
                                                   "dropout", "lr") if k in cfg}})
                item.write_text(json.dumps(rec))
                records.append(rec)
                print(f"{run_dir.name}/step{step}/{clip_name}: {rec['correlation']:.4f}")
    _write_csv(records, Path(out_dir) / f"{name}.csv")
    return records


def from_video_dir(videos, name: str, out_dir: str = "output", downsample: int = 4):
    """Audio-reactivity correlation of EXISTING videos (comparison.py:558-607).

    ``videos``: list of (clip_name, video, audio, sr) where ``video`` is a
    path to an .mp4 (cv2 decode) or a (T, C, H, W) float array in [0, 1].
    Video features are linearly resampled on the time axis to the audio
    feature frame count before correlating.  Incremental json resume + CSV.
    """
    from .sectional import load_video

    out = Path(out_dir) / name
    out.mkdir(parents=True, exist_ok=True)
    records = []
    for clip_name, video, audio, sr in videos:
        item = out / f"{clip_name}.json"
        if item.exists():
            records.append(json.loads(item.read_text()))
            continue
        if isinstance(video, (str, Path)):
            video, _fps = load_video(str(video), downsample=downsample)
        video = jnp.asarray(video)

        vfeats = {n: fn(video)[None] for n, fn in zip(VFN_NAMES, VFNS)}
        afeats = {fn.__name__: fn(jnp.asarray(audio), int(sr))[None] for fn in AFNS}

        length = next(iter(afeats.values())).shape[1]
        vfeats = {k: jax.image.resize(v, (1, length, v.shape[2]), method="linear")
                  for k, v in vfeats.items()}

        rec = {"clip": clip_name,
               "correlation": float(1 - audio_reactive_loss(afeats, vfeats)[0])}
        for an, af in afeats.items():
            for vn, vf in vfeats.items():
                rec[f"{an}|{vn}"] = float(1 - audio_reactive_loss([af], [vf])[0])
        item.write_text(json.dumps(rec))
        records.append(rec)
        print(f"{clip_name}: correlation {rec['correlation']:.4f}")
    _write_csv(records, Path(out_dir) / f"{name}.csv")
    return records


def supplementary_material(G, clips, models: dict | None = None, out_dir: str = "output/suppmat",
                           duration: float | None = 90.0, fps: int = 24, size: int = 256,
                           batch_size: int = 16):
    """Render showcase videos for every model on every clip
    (comparison.py:627-703): all models share a seeded 30-latent palette and
    a gaussian-smoothed random w-walk ``interp`` per clip, rendered at
    ``size`` px and muxed with the audio.  Existing files are skipped.
    """
    from ..gan.render import render_latents_to_video
    from ..gan.wrapper import make_noise_pyramid

    if models is None:
        models = {"Randomizer": RandomGenerator(G, fps=fps, seed=42),
                  "HiPPO": SelfSupervisedOptimization(fps=fps),
                  "LucidSonicDreams": LucidSonicBaseline(G, fps=fps)}
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    from ..ops.gaussian import gaussian_filter

    outputs = []
    for f, (clip_name, audio, sr) in enumerate(clips):
        audio = np.asarray(audio)
        if duration is not None:
            audio = audio[: int(duration * sr)]
        T = int(audio.shape[-1] // 1024)
        for i, (model_name, model) in enumerate(models.items()):
            outfile = out / f"{model_name}_{clip_name}_{i}.mp4"
            if outfile.exists():
                outputs.append(str(outfile))
                continue
            key = jax.random.PRNGKey(42 + f * len(models) + i)
            k1, k2 = jax.random.split(key)
            palette = G.mapper(jax.random.normal(k1, (30, 512)))
            interp = G.mapper(gaussian_filter(jax.random.normal(k2, (T, 512)), 40))

            latents, noise = model.predict(audio, sr, palette=palette, interp=interp)
            if noise is not None and len(noise) and not hasattr(noise[0], "forward"):
                noise_nchw = [np.asarray(n)[:, None] if np.asarray(n).ndim == 3 else np.asarray(n)
                              for n in noise]
                noise = [noise_nchw[0]] + [n for nn in noise_nchw[1:] for n in (nn, nn)]
            elif noise is not None and len(noise) and hasattr(noise[0], "forward"):
                noise = [nm.forward(0, latents.shape[0])[:, None] for nm in noise]
            render_latents_to_video(G.synthesizer, latents,
                                    noise[: G.synthesizer.n_noises_used] if noise else None,
                                    str(outfile), fps=fps, batch_size=batch_size,
                                    output_size=(size, size), progress=False)
            outputs.append(str(outfile))
            print(f"wrote {outfile}")
    return outputs


def _write_csv(records: list, path: Path) -> None:
    try:
        import pandas as pd

        pd.DataFrame(records).to_csv(path)
    except ImportError:
        pass
