"""The compare-big-three study on TPU (VERDICT r2 item 1, the config-5
north-star artifact).

Reproduces the reference's end product (ssar/comparison.py:443-555): for a
test set of clips, run every generation paradigm — random patch, trained
GRU reactors (one per loss mode, from the committed record grid), per-track
self-supervised optimization, and the LucidSonicDreams-recipe baseline —
render each prediction, extract the full 9-audio x 12-video feature
battery, and score audio-reactivity correlation (1 - procrustes distance).
A second forward_only pass records per-model inference runtimes
(comparison.py:505-510).

Round-4 additions (VERDICT r3 item 1): the run is self-diagnosing.
 - scorer CALIBRATION: the known-correlation recipe videos
   (metrics/generate.py, the reference's own metric-validation trick at
   ssar/metrics/generate.py:60-174) are scored with the same battery; the
   study is only credible if low < high_* ordering holds.
 - render-gap diagnostics: every record carries latent-space correlation
   and mean latent/pixel step sizes (ssar_tpu/metrics/comparison.py
   evaluate_clip).
 - lucid amplitude sensitivity: a second lucid entry at 1/5 the default
   pulse/motion amplitudes.
 - ssopt loss curves are captured per clip (does its own objective
   plateau?).
 - grid checkpoints are sanity-bounded: a run whose final val loss
   exceeds --max_val_loss (a collapsed model) is refused.

    python scripts/run_study.py --out output/study

Writes output/study/{study.csv, runtimes.csv, calibration.json,
ssopt_curves.json, summary.json, heatmap_<model>.png}; commit via
scripts/collect_study.py -> docs/STUDY.md.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from make_record_dataset import FPS, SR, synth_track  # noqa: E402

N_CLIPS = 6
CLIP_SECONDS = 16


def build_models(G, grid_dir: Path, max_val_loss: float, model_file: str | None = None):
    from ssar_tpu.metrics.comparison import (LucidSonicBaseline, RandomGenerator,
                                             SelfSupervisedOptimization,
                                             SupervisedSequenceModel)
    from ssar_tpu.train.evaluate import load_checkpoint

    models = {
        "random_patch": RandomGenerator(G, fps=FPS, seed=0),
        "lucid_baseline": LucidSonicBaseline(G, fps=FPS),
        # amplitude-sensitivity control: same recipe, 1/5 the kick sizes
        "lucid_low_amp": LucidSonicBaseline(G, fps=FPS, pulse_react=0.1, motion_react=0.1),
        # model_file: ssopt maps its own palette internally, so it must see
        # the same checkpoint as the study G (not a fresh random mapper)
        "ssopt": SelfSupervisedOptimization(fps=FPS, gan_config=G.config,
                                            model_file=model_file),
        # amplitude-prior variant (VERDICT r4 item 2): same objective plus an
        # opt-in motion-amplitude term pinning mean |Δlatent| to the patch
        # system's measured 0.048/frame (the procrustes objective alone is
        # scale-invariant and under-moves 25x, docs/STUDY.md r4 §4)
        "ssopt_amp": SelfSupervisedOptimization(fps=FPS, gan_config=G.config,
                                                model_file=model_file,
                                                lambda_amplitude=100.0),
    }

    # final val losses from the grid runner's results table, for the
    # collapsed-checkpoint guard (VERDICT r3 weak #2: a diverged supervised
    # model silently entered the round-3 study)
    val_by_dir = {}
    results_json = grid_dir / "record_results.json"
    if results_json.exists():
        for row in json.loads(results_json.read_text()):
            if "log_dir" in row:
                val_by_dir[Path(row["log_dir"]).name] = row.get("val_loss")

    for cell in sorted(grid_dir.glob("backbone-gru_*")):
        if "_hidden_size-32_" not in cell.name:
            continue  # h3 / guarded diagnostics cells are not study models
        loss = [p for p in cell.name.split("_") if p.startswith("loss-")][0][5:]
        runs = sorted(d for d in cell.iterdir() if (d / "ckpt").exists())
        if not runs:
            print(f"skipping {cell.name}: no checkpointed run")
            continue
        val = val_by_dir.get(runs[-1].name)
        if val is not None and (not np.isfinite(val) or val > max_val_loss):
            raise SystemExit(
                f"REFUSING checkpoint {runs[-1].name}: final val loss {val:.4g} exceeds "
                f"--max_val_loss {max_val_loss:.4g} — the model collapsed during training; "
                "re-run the grid (python experiments.py --grid record) before the study")
        model, params, cfg = load_checkpoint(str(runs[-1]))
        models[f"gru_{loss}"] = SupervisedSequenceModel(model, params, fps=FPS, G=G)
        print(f"loaded gru_{loss} from {runs[-1].name} (val loss {val})")
    return models


def run_calibration(G, clips, out: Path) -> dict:
    """Score the known-correlation recipe videos with the study's own
    battery (reference ssar/metrics/generate.py:60-174).  Returns
    {recipe: {clip: correlation}} and asserts nothing — the collected doc
    interprets the ordering."""
    import jax.numpy as jnp

    from ssar_tpu.metrics.comparison import AFNS, VFN_NAMES, VFNS
    from ssar_tpu.metrics.generate import CORRELATION_RECIPES, render_correlation_clip
    from ssar_tpu.train.losses import audio_reactive_loss

    path = out / "calibration.json"
    if path.exists():
        return json.loads(path.read_text()), True
    results = {}
    for recipe in CORRELATION_RECIPES:
        results[recipe] = {}
        for clip_name, audio, sr in clips:
            t0 = time.time()
            video = render_correlation_clip(recipe, audio, sr, G, fps=FPS, seed=7)
            import jax

            video128 = jax.image.resize(
                jnp.asarray(video).transpose(0, 2, 3, 1),
                (video.shape[0], 128, 128, 3), method="bilinear").transpose(0, 3, 1, 2)
            vfeats = {n: fn(video128)[None] for n, fn in zip(VFN_NAMES, VFNS)}
            afeats = {fn.__name__: fn(jnp.asarray(audio), int(sr))[None] for fn in AFNS}
            corr = float(1 - audio_reactive_loss(afeats, vfeats)[0])
            # channel-specific block: a chroma-only video has, by
            # construction, no counterpart motion for 7 of the 9 audio
            # features, so the battery MEAN is bounded for single-channel
            # recipes; the chroma-pair block is where that channel shows
            rec = {"overall": corr}
            pairs = []
            for an in ("chromagram", "tonnetz"):
                for vn in ("rgb_hist", "hsv_hist"):
                    pc = float(1 - audio_reactive_loss([afeats[an]], [vfeats[vn]])[0])
                    rec[f"{an}|{vn}"] = pc
                    pairs.append(pc)
            rec["chroma_channel"] = float(np.mean(pairs))
            results[recipe][clip_name] = rec
            print(f"calibration {recipe}/{clip_name}: overall {corr:.4f} "
                  f"chroma_channel {rec['chroma_channel']:.4f} ({time.time() - t0:.0f}s)")
    path.write_text(json.dumps(results, indent=2))
    return results, False


def main():
    import faulthandler

    # the tunneled device RPC can hang; dump the python stack periodically
    # so a stall is diagnosable from the log
    faulthandler.dump_traceback_later(300, repeat=True)

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/study")
    ap.add_argument("--grid_dir", default="runs/experiments")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--max_val_loss", type=float, default=2000.0,
                    help="refuse grid checkpoints whose final val loss exceeds this")
    ap.add_argument("--skip_calibration", action="store_true")
    ap.add_argument("--model_file", default=None,
                    help="G checkpoint (.npz) — e.g. the in-env calibration G "
                         "from scripts/train_calibration_g.py; None = random init")
    ap.add_argument("--max_channels", type=int, default=512,
                    help="G width cap; must match the checkpoint's config")
    args = ap.parse_args()

    import jax

    from ssar_tpu.gan.stylegan2 import StyleGAN2Config
    from ssar_tpu.gan.wrapper import StyleGAN2
    from ssar_tpu.metrics.comparison import compare_models

    print(f"backend: {jax.default_backend()}")
    G = StyleGAN2(model_file=args.model_file,
                  output_size=(args.resolution, args.resolution),
                  config=StyleGAN2Config(resolution=args.resolution,
                                         max_channels=args.max_channels), seed=0)

    clips = [(f"clip{i}", synth_track(seed=2000 + i, seconds=CLIP_SECONDS), SR)
             for i in range(N_CLIPS)]
    models = build_models(G, Path(args.grid_dir), args.max_val_loss,
                          model_file=args.model_file)
    print(f"{len(models)} models x {len(clips)} clips")
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    wall = {}

    t0 = time.time()
    if not args.skip_calibration:
        _, cached = run_calibration(G, clips[:3], out)
        # a resume-skip must not record 0.0 wall-clock for a phase that
        # plainly ran (VERDICT r4 weak #6): record the cache hit explicitly
        wall["calibration_s"] = "cached" if cached else round(time.time() - t0, 1)

    n_before = len(list((out / "study").glob("*.json"))) if (out / "study").exists() else 0
    t0 = time.time()
    records = compare_models("study", models, clips, G, out_dir=args.out)
    # resume accounting (VERDICT r4 weak #6): a fully-cached replay must not
    # overwrite the measured battery time with ~0
    wall["battery_s"] = ("cached" if len(records) == n_before and n_before > 0
                         else round(time.time() - t0, 1))
    print(f"correlation battery: {wall['battery_s']}s, {len(records)} records")

    # ssopt objective curves (captured by the optimizer during the battery);
    # record the loss-sample stride so downstream axes/slopes stay honest
    for nm in ("ssopt", "ssopt_amp"):
        ssopt = models.get(nm)
        if ssopt is not None and getattr(ssopt, "loss_curves", None):
            suffix = "" if nm == "ssopt" else "_amp"
            (out / f"ssopt_curves{suffix}.json").write_text(json.dumps(
                {"log_steps": getattr(ssopt, "log_steps", 16),
                 "curves": ssopt.loss_curves}, indent=2))

    t0 = time.time()
    runtimes = compare_models("runtimes", models, clips, G, out_dir=args.out,
                              forward_only=True)
    wall["forward_only_s"] = round(time.time() - t0, 1)
    print(f"forward-only pass: {wall['forward_only_s']:.0f}s")

    # summary table + per-model heatmaps
    from ssar_tpu.utils.plot import correlation_heatmap

    # merge with a previous run's wall clock: cached phases keep the
    # measured value from the run that actually paid them
    prev_wall = {}
    if (out / "summary.json").exists():
        prev_wall = json.loads((out / "summary.json").read_text()).get("wall_clock", {})
    for k, v in wall.items():
        if v == "cached" and isinstance(prev_wall.get(k), (int, float)):
            wall[k] = prev_wall[k]
    summary = {"wall_clock": wall}
    if getattr(models.get("random_patch"), "mir_seconds", None):
        summary["wall_clock"]["patch_mir_s_per_clip"] = float(
            np.median(models["random_patch"].mir_seconds))
    for m in models:
        recs = [r for r in records if r["model_name"] == m]
        if recs:
            summary[m] = {
                "median_correlation": float(np.median([r["correlation"] for r in recs])),
                "mean_correlation": float(np.mean([r["correlation"] for r in recs])),
                "median_latent_correlation": float(
                    np.median([r["latent_correlation"] for r in recs if "latent_correlation" in r])
                    if any("latent_correlation" in r for r in recs) else float("nan")),
                "mean_latent_step": float(np.mean([r.get("mean_latent_step", np.nan) for r in recs])),
                "mean_pixel_step": float(np.mean([r.get("mean_pixel_step", np.nan) for r in recs])),
                "n_clips": len(recs),
            }
            correlation_heatmap(
                [{k: v for k, v in r.items() if "|" in k or k == "clip"} for r in recs],
                str(out / f"heatmap_{m}.png"))
        rts = [r for r in runtimes if r["model_name"] == m]
        if rts and m in summary:
            fps_vals = [r["n"] / max(r["time"], 1e-9) for r in rts]
            summary[m]["inference_frames_per_s"] = float(np.median(fps_vals))
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
