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

    python scripts/run_study.py --out output/study

Writes output/study/{study.csv, runtimes.csv, heatmap_<model>.png},
consumed by docs/STUDY.md.
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


def build_models(G, grid_dir: Path):
    from ssar_tpu.metrics.comparison import (LucidSonicBaseline, RandomGenerator,
                                             SelfSupervisedOptimization,
                                             SupervisedSequenceModel)
    from ssar_tpu.train.evaluate import load_checkpoint

    models = {
        "random_patch": RandomGenerator(G, fps=FPS, seed=0),
        "lucid_baseline": LucidSonicBaseline(G, fps=FPS),
        "ssopt": SelfSupervisedOptimization(fps=FPS, gan_config=G.config),
    }
    for cell in sorted(grid_dir.glob("backbone-gru_*")):
        loss = [p for p in cell.name.split("_") if p.startswith("loss-")][0][5:]
        runs = sorted(d for d in cell.iterdir() if (d / "ckpt").exists())
        if not runs:
            print(f"skipping {cell.name}: no checkpointed run")
            continue
        model, params, cfg = load_checkpoint(str(runs[-1]))
        models[f"gru_{loss}"] = SupervisedSequenceModel(model, params, fps=FPS, G=G)
        print(f"loaded gru_{loss} from {runs[-1].name}")
    return models


def main():
    import faulthandler

    # the tunneled device RPC can hang; dump the python stack periodically
    # so a stall is diagnosable from the log
    faulthandler.dump_traceback_later(300, repeat=True)

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/study")
    ap.add_argument("--grid_dir", default="runs/experiments")
    ap.add_argument("--resolution", type=int, default=256)
    args = ap.parse_args()

    import jax

    from ssar_tpu.gan.stylegan2 import StyleGAN2Config
    from ssar_tpu.gan.wrapper import StyleGAN2
    from ssar_tpu.metrics.comparison import compare_models

    print(f"backend: {jax.default_backend()}")
    G = StyleGAN2(output_size=(args.resolution, args.resolution),
                  config=StyleGAN2Config(resolution=args.resolution), seed=0)

    clips = [(f"clip{i}", synth_track(seed=2000 + i, seconds=CLIP_SECONDS), SR)
             for i in range(N_CLIPS)]
    models = build_models(G, Path(args.grid_dir))
    print(f"{len(models)} models x {len(clips)} clips")

    t0 = time.time()
    records = compare_models("study", models, clips, G, out_dir=args.out)
    print(f"correlation battery: {time.time() - t0:.0f}s, {len(records)} records")

    t0 = time.time()
    runtimes = compare_models("runtimes", models, clips, G, out_dir=args.out,
                              forward_only=True)
    print(f"forward-only pass: {time.time() - t0:.0f}s")

    # summary table + per-model heatmaps
    out = Path(args.out)
    from ssar_tpu.utils.plot import correlation_heatmap

    summary = {}
    for m in models:
        recs = [r for r in records if r["model_name"] == m]
        if recs:
            summary[m] = {
                "median_correlation": float(np.median([r["correlation"] for r in recs])),
                "mean_correlation": float(np.mean([r["correlation"] for r in recs])),
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
