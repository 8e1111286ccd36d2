"""AV feature study: which audio features predict which video features?

The TPU-native counterpart of the reference's figure batteries
(ssar/features/experiment.py:84-386 and the core of
ssar/analysis/preliminary.py): for a corpus of (audio, video) pairs —
optionally organized into named groups (model A vs model B vs real
videos) — extract the canonical 9 audio x 12 video feature matrices,
score every pair under a panel of correlation measures, and emit a tidy
records list plus the reference's report surface: per-clip extrema,
concat-correlation bars, per-measure group bars, and per-group score
histograms.

Record schema (one row per scored pair):
    {"group", "clip", "measure", "audio_feature", "video_feature", "value"}
Concatenated-feature scores (all 9 audio mats | all 12 video mats glued
along channels, the reference's ``quadratic=False`` mode,
experiment.py:175-188) appear as audio_feature = video_feature = "concat".

The correlation panel defaults to the reference study's panel
{procrustes (op), pwcca, rv2, smi, svcca} (experiment.py:202) — pass
``measures`` to widen it to anything in metrics.correlation.CORRELATION_FNS.
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .comparison import AFNS, VFN_NAMES, VFNS
from .correlation import CORRELATION_FNS

STUDY_MEASURES = ("procrustes", "pwcca", "rv2", "smi", "svcca")


def _flatten(f: jnp.ndarray) -> jnp.ndarray:
    return f.reshape(f.shape[0], -1)


def extract_av_features(audio, sr: int, video, cache_stem: str | None = None):
    """The study's 9 audio + 12 video feature dicts for one clip, with the
    reference's per-clip .npz caching (experiment.py:225-240)."""
    if cache_stem is not None:
        ap, vp = Path(f"{cache_stem}_afeats.npz"), Path(f"{cache_stem}_vfeats.npz")
        if ap.exists() and vp.exists():
            with np.load(ap) as arr:
                afeats = {k: jnp.asarray(arr[k]) for k in arr.files}
            with np.load(vp) as arr:
                vfeats = {k: jnp.asarray(arr[k]) for k in arr.files}
            return afeats, vfeats
    audio = jnp.asarray(audio)
    video = jnp.asarray(video)
    afeats = {fn.__name__: _flatten(fn(audio, int(sr))) for fn in AFNS}
    vfeats = {vn: _flatten(fn(video)) for vn, fn in zip(VFN_NAMES, VFNS)}
    T = min(min(a.shape[0] for a in afeats.values()),
            min(v.shape[0] for v in vfeats.values()))
    afeats = {k: v[:T] for k, v in afeats.items()}
    vfeats = {k: v[:T] for k, v in vfeats.items()}
    if cache_stem is not None:
        Path(cache_stem).parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(f"{cache_stem}_afeats.npz", **{k: np.asarray(v) for k, v in afeats.items()})
        np.savez_compressed(f"{cache_stem}_vfeats.npz", **{k: np.asarray(v) for k, v in vfeats.items()})
    return afeats, vfeats


def audiovisual_correlation(afeats: dict, vfeats: dict, cname: str, correlation_fn,
                            quadratic: bool = False, variation_normalized: bool = False,
                            mean_diff_normalized: bool = False):
    """Reference semantics (ssar/features/experiment.py:157-188).

    quadratic=True: one score per (audio feature, video feature) pair,
    returned as {(aname, vname, cname): value}. quadratic=False: one score
    of the channel-concatenated feature matrices. The two optional
    normalizers scale scores by signal smoothness / variation exactly as
    the reference does (experiment.py:163-172, 182-187).
    """
    if quadratic:
        res = {}
        for aname, af in afeats.items():
            for vname, vf in vfeats.items():
                cor = float(correlation_fn(af, vf))
                if mean_diff_normalized:
                    asm = float(jnp.max(jnp.abs(jnp.diff(af, axis=0)) / (jnp.abs(af).max(0) + 1e-8)))
                    vsm = float(jnp.max(jnp.abs(jnp.diff(vf, axis=0)) / (jnp.abs(vf).max(0) + 1e-8)))
                    cor *= asm + vsm
                if variation_normalized:
                    cor *= float(af.std(0).mean() / (jnp.linalg.norm(af) + 1e-8)
                                 + vf.std(0).mean() / (jnp.linalg.norm(vf) + 1e-8))
                res[(aname, vname, cname)] = cor
        return res
    af = jnp.concatenate(list(afeats.values()), axis=1)
    vf = jnp.concatenate(list(vfeats.values()), axis=1)
    res = float(correlation_fn(af, vf))
    if mean_diff_normalized:
        res *= float(jnp.max(jnp.diff(af, axis=0) / (af.max(0) + 1e-8))
                     + jnp.max(jnp.diff(vf, axis=0) / (vf.max(0) + 1e-8)))
    if variation_normalized:
        res *= float(af.std(0).mean() / (jnp.linalg.norm(af) + 1e-8)
                     + vf.std(0).mean() / (jnp.linalg.norm(vf) + 1e-8))
    return res


def av_feature_study(pairs, measures=STUDY_MEASURES, out_dir: str | None = None,
                     groups: dict | None = None, cache_dir: str | None = None):
    """Score every (audio feature x video feature) pair per clip.

    pairs: [(name, audio, sr, video (T, C, H, W) in [0, 1])].
    groups: optional {clip_name: group_name}; defaults to one group "all".
    Returns tidy records (schema above, incl. "concat" rows); writes
    ``av_study.csv`` + one heatmap per measure when ``out_dir``.
    """
    fns = {m: CORRELATION_FNS[m] for m in measures}
    records = []
    for name, audio, sr, video in pairs:
        stem = str(Path(cache_dir) / name) if cache_dir else None
        afeats, vfeats = extract_av_features(audio, sr, video, cache_stem=stem)
        group = (groups or {}).get(name, "all")
        for m, fn in fns.items():
            quad = audiovisual_correlation(afeats, vfeats, m, fn, quadratic=True)
            for (an, vn, _), val in quad.items():
                records.append({"group": group, "clip": name, "measure": m,
                                "audio_feature": an, "video_feature": vn, "value": val})
            records.append({"group": group, "clip": name, "measure": m,
                            "audio_feature": "concat", "video_feature": "concat",
                            "value": audiovisual_correlation(afeats, vfeats, m, fn)})
    if out_dir is not None:
        write_study_report(records, out_dir, measures=measures)
    return records


# ---------------------------------------------------------------------------
# report drivers (experiment.py:263-386)


def group_stats(records: list[dict]):
    """Median/std per (group, measure, audio_feature, video_feature) —
    the reference's groupby("group").agg(["median", "std"])
    (experiment.py:276-303). Returns tidy stat dicts."""
    cells = {}
    for r in records:
        key = (r["group"], r["measure"], r["audio_feature"], r["video_feature"])
        cells.setdefault(key, []).append(r["value"])
    return [{"group": g, "measure": m, "audio_feature": a, "video_feature": v,
             "median": float(np.nanmedian(vals)), "std": float(np.nanstd(vals))}
            for (g, m, a, v), vals in cells.items()]


def extrema(records: list[dict], n: int = 5, measure: str = "procrustes") -> dict:
    """Best/worst clips per group by concat score (experiment.py:263-274)."""
    out = {}
    per_group = {}
    for r in records:
        if r["measure"] == measure and r["audio_feature"] == "concat" and np.isfinite(r["value"]):
            per_group.setdefault(r["group"], []).append((r["value"], r["clip"]))
    for g, vals in per_group.items():
        vals.sort(reverse=True)
        out[g] = {"best": vals[:n], "worst": vals[-n:][::-1]}
    return out


MEASURE_TITLES = {
    "procrustes": "Orthogonal Procrustes",
    "rv2": "Adjusted RV Coefficient",
    "smi": "Matrix Similarity Index",
    "pwcca": "Projection-weighted CCA",
    "svcca": "SVCCA",
}


def concatbar(stats: list[dict], out_file: str, measure: str = "procrustes"):
    """Median concat correlation per group, one bar each
    (experiment.py:305-317)."""
    from ..utils.plot import _plt

    plt = _plt()
    rows = [s for s in stats if s["measure"] == measure and s["audio_feature"] == "concat"]
    groups = [s["group"] for s in rows]
    fig, ax = plt.subplots(figsize=(max(4, len(groups) * 1.2), 4))
    ax.bar(groups, [s["median"] for s in rows], yerr=[s["std"] for s in rows],
           color=plt.cm.tab10(np.arange(len(groups)) % 10))
    ax.set_xlabel("Group")
    ax.set_ylabel(f"{MEASURE_TITLES.get(measure, measure)} (concat)")
    ax.tick_params(axis="x", rotation=10)
    fig.tight_layout()
    fig.savefig(out_file)
    plt.close(fig)


def groupbars(stats: list[dict], out_file: str, measures=STUDY_MEASURES,
              audio_filter: str | None = None):
    """Per-measure panel of group bars over the quadratic scores; optional
    restriction to one audio feature (the reference's full/chroma/onsets
    variants, experiment.py:323-347)."""
    from ..utils.plot import _plt

    plt = _plt()
    measures = [m for m in measures if m != "svcca"]
    ncols = 2
    nrows = (len(measures) + 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(16, 4.5 * nrows), sharex=True, squeeze=False)
    for c, m in enumerate(measures):
        ax = axes.flatten()[c]
        rows = [s for s in stats
                if s["measure"] == m and s["audio_feature"] != "concat"
                and (audio_filter is None or s["audio_feature"] == audio_filter)]
        per_group = {}
        for s in rows:
            per_group.setdefault(s["group"], []).append(s["median"])
        groups = list(per_group)
        ax.bar(groups, [float(np.nanmedian(v)) for v in per_group.values()],
               yerr=[float(np.nanstd(v)) for v in per_group.values()],
               color=plt.cm.tab10(np.arange(len(groups)) % 10))
        ax.set_title(MEASURE_TITLES.get(m, m))
        ax.tick_params(axis="x", rotation=10)
    for c in range(len(measures), nrows * ncols):
        axes.flatten()[c].axis("off")
    fig.tight_layout()
    fig.savefig(out_file)
    plt.close(fig)


def grouphists(records: list[dict], out_file: str, measures=STUDY_MEASURES,
               mode: str = "quadratic", bins: int = 100):
    """Histogram grid: rows = groups, cols = measures, of per-clip scores;
    mode selects quadratic pairs / concat / one audio feature
    (experiment.py:349-386)."""
    from ..utils.plot import _plt

    plt = _plt()
    measures = [m for m in measures if m != "svcca"]

    def keep(r):
        if mode == "quadratic":
            return r["audio_feature"] != "concat"
        if mode == "concat":
            return r["audio_feature"] == "concat"
        return r["audio_feature"] == mode

    rows = [r for r in records if keep(r) and np.isfinite(r["value"])]
    groups = list(dict.fromkeys(r["group"] for r in rows))
    vals_all = [r["value"] for r in rows] or [0.0]
    lo, hi = float(np.min(vals_all)), float(np.max(vals_all))
    rng = (lo, hi if hi > lo else lo + 1.0)
    fig, axes = plt.subplots(len(groups), len(measures),
                             figsize=(4 * len(measures), 2.2 * len(groups)),
                             sharex=True, squeeze=False)
    for g, group in enumerate(groups):
        color = plt.cm.tab10(g % 10)
        for c, m in enumerate(measures):
            data = [r["value"] for r in rows if r["group"] == group and r["measure"] == m]
            ax = axes[g, c]
            if data:
                y, _, _ = ax.hist(data, bins=bins, range=rng, color=color, density=True)
                ax.vlines(float(np.median(data)), 0, y.max() or 1, ls="--", color=color)
            ax.set_yticklabels([])
            if g == len(groups) - 1:
                ax.set_xlabel(MEASURE_TITLES.get(m, m))
            if c == 0:
                ax.set_ylabel(group)
    fig.tight_layout()
    fig.savefig(out_file)
    plt.close(fig)


def write_study_report(records: list[dict], out_dir: str, measures=STUDY_MEASURES):
    """CSV + the full figure battery + extrema text for one study."""
    from ..utils.plot import correlation_heatmap

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    try:
        import pandas as pd

        pd.DataFrame(records).to_csv(out / "av_study.csv")
    except ImportError:
        pass
    stats = group_stats(records)
    for m in measures:
        recs_m = [{"clip": r["clip"], f"{r['audio_feature']}|{r['video_feature']}": r["value"]}
                  for r in records if r["measure"] == m and r["audio_feature"] != "concat"]
        if recs_m:
            correlation_heatmap(recs_m, str(out / f"av_study_{m}.png"))
    concatbar(stats, str(out / "barplot_concat_corr.png"))
    groupbars(stats, str(out / "group_corr_bars_full.png"), measures)
    for af in ("chromagram", "onsets"):
        if any(s["audio_feature"] == af for s in stats):
            groupbars(stats, str(out / f"group_corr_bars_{af}.png"), measures, audio_filter=af)
    for mode in ("quadratic", "concat"):
        grouphists(records, str(out / f"group_corr_hists_{mode}.png"), measures, mode=mode)
    ex = extrema(records, measure=measures[0])
    lines = []
    for g, d in ex.items():
        lines.append(f"# {g}")
        lines += [f"best  {v:.4f}  {c}" for v, c in d["best"]]
        lines += [f"worst {v:.4f}  {c}" for v, c in d["worst"]]
    (out / "extrema.txt").write_text("\n".join(lines) + "\n")
    return stats


def feature_visualizations(audio, sr: int, video, out_dir: str):
    """Render every study feature as an image / line plot
    (experiment.py:84-136): 1-channel features as line plots, matrix
    features as inferno images, time on the x axis."""
    from ..utils.plot import _plt

    plt = _plt()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    audio = jnp.asarray(audio)
    video = jnp.asarray(video)
    feats = {fn.__name__: np.asarray(_flatten(fn(audio, int(sr)))) for fn in AFNS}
    feats.update({vn: np.asarray(_flatten(fn(video))) for vn, fn in zip(VFN_NAMES, VFNS)})
    for name, feat in feats.items():
        fig = plt.figure(figsize=(6.5, 1.6))
        if feat.shape[-1] == 1:
            plt.plot(feat[:, 0], linewidth=0.5, color="black")
            plt.xlim(0, len(feat))
        else:
            lo, hi = feat.min(), feat.max()
            plt.imshow((feat.T - lo) / (hi - lo + 1e-8), cmap="inferno",
                       aspect="auto", origin="lower")
        plt.axis("off")
        fig.savefig(out / f"{name}.png", bbox_inches="tight", pad_inches=0, dpi=100)
        plt.close(fig)
    return sorted(p.name for p in out.glob("*.png"))
