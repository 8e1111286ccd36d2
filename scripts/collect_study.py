"""Collect the compare-big-three study artifacts into committed docs
(VERDICT r2 item 1, the config-5 north-star).

Reads ``output/study`` (written by ``python scripts/run_study.py``) and
emits ``docs/STUDY.md`` + ``docs/study/`` (summary CSV, per-model AV
correlation heatmaps, runtimes table).  Reference end product:
/root/reference/ssar/comparison.py:443-555 -> output/*.csv.

    python scripts/collect_study.py [--src output/study] [--out docs]
"""
from __future__ import annotations

import argparse
import json
import shutil
from collections import defaultdict
from pathlib import Path

import numpy as np

# the 9 audio x 12 video battery (comparison.py:43-56)
AUDIO_FEATURES = ["chromagram", "tonnetz", "mfcc", "spectral_contrast", "rms",
                  "drop_strength", "onsets", "spectral_flatness", "pulse"]


def load_records(src: Path, sub: str) -> list[dict]:
    return [json.loads(p.read_text()) for p in sorted((src / sub).glob("*.json"))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="output/study")
    ap.add_argument("--out", default="docs")
    args = ap.parse_args()
    src, out = Path(args.src), Path(args.out)
    doc_dir = out / "study"
    doc_dir.mkdir(parents=True, exist_ok=True)

    records = load_records(src, "study")
    runtimes = load_records(src, "runtimes")
    summary = json.loads((src / "summary.json").read_text())

    by_model = defaultdict(list)
    for r in records:
        by_model[r["model_name"]].append(r)

    # per-model aggregate + best per-pair rows
    rows = []
    for m, recs in sorted(by_model.items(),
                          key=lambda kv: -np.median([r["correlation"] for r in kv[1]])):
        corr = [r["correlation"] for r in recs]
        pair_keys = [k for k in recs[0] if "|" in k]
        pair_mean = {k: float(np.mean([r[k] for r in recs])) for k in pair_keys}
        top = sorted(pair_mean.items(), key=lambda kv: -kv[1])[:3]
        rts = [r["n"] / max(r["time"], 1e-9) for r in runtimes if r["model_name"] == m]
        rows.append({
            "model": m,
            "median": float(np.median(corr)),
            "mean": float(np.mean(corr)),
            "std": float(np.std(corr)),
            "fps": float(np.median(rts)) if rts else float("nan"),
            "top_pairs": top,
        })

    # copy artifacts the doc links
    for png in sorted(src.glob("heatmap_*.png")):
        shutil.copy(png, doc_dir / png.name)
    shutil.copy(src / "study.csv", doc_dir / "study.csv")
    shutil.copy(src / "runtimes.csv", doc_dir / "runtimes.csv")
    (doc_dir / "summary.json").write_text(json.dumps(summary, indent=2) + "\n")

    n_clips = len({r["clip"] for r in records})
    lines = [
        "# The compare-big-three study (TPU run of record)",
        "",
        "The reference's end product is a correlation table comparing its three",
        "generation paradigms against baselines",
        "(`/root/reference/ssar/comparison.py:443-555`, results -> `output/*.csv`).",
        "This page commits that study executed end-to-end on the TPU:",
        f"**{len(by_model)} models x {n_clips} clips x the full 9-audio x 12-video",
        "feature battery**, scored by audio-reactivity correlation",
        "(`1 - audio_reactive_loss`, ssar/train.py:165-176) on frames rendered at",
        "256 px and feature-extracted at 128 px, exactly the reference pipeline.",
        "",
        "Produced by `python scripts/run_study.py` (renders + battery) and",
        "`python scripts/collect_study.py` (this page).  Raw records:",
        "[study.csv](study/study.csv), [runtimes.csv](study/runtimes.csv),",
        "[summary.json](study/summary.json).",
        "",
        "## Headline table",
        "",
        "| model | median corr | mean corr | std | inference fps | top mean feature pairs |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        top = "; ".join(f"{k} {v:.2f}" for k, v in r["top_pairs"])
        lines.append(f"| {r['model']} | **{r['median']:.3f}** | {r['mean']:.3f} "
                     f"| {r['std']:.3f} | {r['fps']:.0f} | {top} |")
    doc = "\n".join(lines) + "\n"
    (out / "STUDY.md").write_text(doc)
    print(doc)
    print(f"wrote {out / 'STUDY.md'} + {doc_dir}/")


if __name__ == "__main__":
    main()
