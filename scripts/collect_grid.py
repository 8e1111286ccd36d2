"""Collect the record-grid training artifacts into committed docs (VERDICT r2
item 2): per-cell final losses + wall-clock table, loss-curve figure, final
diagnostics image and rendered checkpoint sample per loss mode.

Reads the gitignored ``runs/experiments`` tree (written by
``python experiments.py --grid record``) and emits ``docs/grid/`` +
``docs/GRID.md``.  Reference runs of record: /root/reference/experiments.sh:1-38.

    python scripts/collect_grid.py [--runs runs/experiments] [--out docs]
"""
from __future__ import annotations

import argparse
import csv
import json
import shutil
from collections import defaultdict
from pathlib import Path

TRAIN_C, VAL_C = "#2a78d6", "#eb6834"
INK, MUTED = "#0b0b0b", "#52514e"


def read_curves(metrics_csv: Path) -> dict[str, list[tuple[int, float]]]:
    series = defaultdict(list)
    with metrics_csv.open() as f:
        for step, tag, value in csv.reader(f):
            series[tag].append((int(step), float(value)))
    return series


def latest_run(cell_dir: Path) -> Path | None:
    runs = sorted(d for d in cell_dir.iterdir() if (d / "metrics.csv").exists())
    return runs[-1] if runs else None


def loss_curves_figure(cells: dict[str, Path], out_png: Path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(cells), figsize=(5 * len(cells), 3.6),
                             squeeze=False)
    fig.patch.set_facecolor("#fcfcfb")
    for ax, (loss, run) in zip(axes[0], sorted(cells.items())):
        series = read_curves(run / "metrics.csv")
        train = series.get(f"Loss/{loss}", [])
        val = series.get("Loss/val", [])
        # train logs every step: thin to ~400 points so the png stays light
        stride = max(1, len(train) // 400)
        if train:
            xs, ys = zip(*train[::stride])
            ax.plot(xs, ys, color=TRAIN_C, lw=2, label="train")
        if val:
            xs, ys = zip(*sorted(set(val)))
            ax.plot(xs, ys, color=VAL_C, lw=2, label="val")
        vals = [y for _, y in train + val if y > 0]
        if vals and max(vals) / max(min(vals), 1e-12) > 50:
            ax.set_yscale("log")
        ax.set_title(f"gru / fixed / {loss}", color=INK, fontsize=11)
        ax.set_xlabel("examples", color=MUTED)
        ax.tick_params(colors=MUTED)
        ax.grid(True, color="#e8e8e4", lw=0.6)
        for s in ax.spines.values():
            s.set_color("#e8e8e4")
        ax.set_facecolor("#fcfcfb")
        ax.legend(frameon=False, labelcolor=INK)
    axes[0][0].set_ylabel("loss", color=MUTED)
    fig.tight_layout()
    out_png.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_png, dpi=130)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", default="runs/experiments")
    ap.add_argument("--out", default="docs")
    args = ap.parse_args()
    runs, out = Path(args.runs), Path(args.out)
    grid_dir = out / "grid"
    grid_dir.mkdir(parents=True, exist_ok=True)

    results = json.loads((runs / "record_results.json").read_text())
    for extra_grid in ("record_h3", "record_h3g"):
        p = runs / f"{extra_grid}_results.json"
        if p.exists():  # h3 record config + its env-guarded variant
            results = results + json.loads(p.read_text())
    cells = {}
    for cell in sorted(runs.glob("backbone-*")):
        run = latest_run(cell)
        if run is None:
            continue
        loss = [p for p in cell.name.split("_") if p.startswith("loss-")][0][5:]
        hidden = [p for p in cell.name.split("_") if p.startswith("size-")]
        h = hidden[0][5:] if hidden else "32"
        key = loss if h == "32" else f"{loss}-h{h}"
        if "env_guard" in cell.name:
            key += "-guarded"
        cells[key] = run
        for pat, dst in [("diagnostics_*.png", f"diagnostics_{key}.png"),
                         ("sample_*.mp4", f"sample_{key}.mp4")]:
            files = sorted(run.glob(pat))
            if files:
                shutil.copy(files[-1], grid_dir / dst)

    shutil.copy(runs / "record_results.csv", grid_dir / "record_results.csv")
    loss_curves_figure(cells, grid_dir / "loss_curves.png")

    rows = ["| loss mode | hidden | layers | env guard | examples | final val loss (mean) | val (median) | wall-clock (s) | run |",
            "|---|---|---|---|---|---|---|---|---|"]
    for r in results:
        guard = r.get("env_guard_eps", 0) or "—"
        if "error" in r:
            rows.append(f"| {r['loss']} | {r['hidden_size']} | {r['num_layers']} | {guard} | "
                        f"{r['n_examples']} | ERROR | — | — | {r.get('error', '')[:60]} |")
            continue
        med = r.get("val_loss_median")
        med_s = f"{med:.4g}" if isinstance(med, (int, float)) else "—"
        rows.append(f"| {r['loss']} | {r['hidden_size']} | {r['num_layers']} | {guard} | "
                    f"{r['n_examples']} | {r['val_loss']:.4g} | {med_s} | {r['seconds']:.0f} | "
                    f"`{Path(r['log_dir']).name}` |")

    md = f"""# Training runs of record (record grid)

The reference's configs of record live in `/root/reference/experiments.sh:1-38`
(GRU reactor, three loss modes, 128k examples).  `python experiments.py --grid
record` executes that subset on the TPU over the committed record corpus
(`scripts/make_record_dataset.py`, 126 windows x 192 frames, seed-42 split) and
writes `runs/experiments/record_results.csv`; this page commits the artifacts.

{chr(10).join(rows)}

![loss curves](grid/loss_curves.png)

Per-loss final-checkpoint artifacts: `docs/grid/diagnostics_<loss>.png`
(prediction-vs-target envelope/latent diagnostics) and
`docs/grid/sample_<loss>.mp4` (render-at-checkpoint on the held-out chirp clip,
256 px).

## Stability note: supervised + the fixed decoder

An earlier (round-3) supervised cell trained with bare `optax.adam`
(matching the reference's `torch.optim.Adam`, ssar/train.py:262) diverged at
step ~64k — val loss 555 -> 6.3e5 spike -> collapse to a constant 9922.
Root cause is the fixed decoder's envelope normalisation `env / env.sum(-1)`
(latent_n_noise2.py:151, faithfully mirrored at
`ssar_tpu/models/reactor.py:92`): the sum has no sign guard, so a batch
whose envelopes sum near zero fires an enormous gradient through the whole
backbone.  The framework now defaults to global-norm gradient clipping
(`--grad_clip 1.0`, `train/train.py`); `--grad_clip 0` restores the
reference's exact optimizer.  The grid above IS the post-fix re-run: no
cell collapses, and the selfsupervised/ssabsdiff cells also end lower than
the bare-Adam round-3 runs (0.078 vs 0.527; 0.68 vs 0.81).

The supervised VAL trajectory remains spiky (occasional large excursions
over a low floor, see the loss-curve figure): the same unguarded
normalisation makes the EVALUATION itself heavy-tailed — a val WINDOW
whose predicted envelopes sum near zero scores a huge MSE even under a
well-trained model.  Round 5 addresses this two ways (VERDICT r4 item 5):

1. **Per-window median val loss** next to the mean (train.py computes
   per-example eval losses; the val split is ~one batch, so a batch-level
   median would just be the mean).  The medians are the caveat-free
   numbers: supervised h32 median 15.5 against its 345.8 mean —
   the typical window is fine; a handful of env.sum~0 windows carry the
   mean.
2. **The reference's ACTUAL supervised record config** — fixed decoder at
   hidden_size 3 (experiments.sh:4-5) — ran as `record_h3`.  The round-4
   hypothesis (fewer envelope terms -> tail mostly gone) is EMPIRICALLY
   BACKWARDS: a 3-term signed sum lands near zero far MORE often than a
   32-term one, so the h3 cell's val mean explodes (5.9e5) while its
   per-window median is 83.5, and its train curve oscillates from step 0.
   On this corpus the reference's own h3 record config is
   unstable-by-construction under its unguarded normalisation; the
   hidden-32 cell is the better-behaved configuration, and the median
   column is the honest statistic for both.
3. **Root cause proven by the guarded re-run** (`record_h3g`): the SAME
   h3 config with the opt-in `--env_guard_eps 1e-2` (models/reactor.py —
   clamps |env.sum| away from zero, sign-preserving; 0 = reference-exact,
   latent_n_noise2.py:151) trains completely stably: val mean 2.53 /
   per-window median 2.21, smooth flat curves, vs the unguarded cell's
   5.9e5 mean.  The instability is exactly the unguarded normalisation —
   a one-line opt-in fix the reference lacks.
"""
    (out / "GRID.md").write_text(md)
    print(f"wrote {out / 'GRID.md'} + {grid_dir}")


if __name__ == "__main__":
    main()
