"""AV feature study: which audio features predict which video features?

Equivalent of the core of ssar/analysis/preliminary.py (1 007 LoC driver):
for a corpus of (audio, video) pairs, extract the canonical 9 audio x 12
video feature matrices, score every pair under a panel of correlation
measures, and emit a tidy records list (+ CSV / heatmaps via utils.plot).

The correlation panel defaults to a representative subset of the zoo
(RV2, linear CKA, procrustes) — pass ``measures``
to widen it to anything in metrics.correlation.CORRELATION_FNS.
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .comparison import AFNS, VFN_NAMES, VFNS
from .correlation import CORRELATION_FNS


def _flatten(f: jnp.ndarray) -> jnp.ndarray:
    return f.reshape(f.shape[0], -1)


def av_feature_study(pairs, measures=("rv2", "cka", "procrustes"), out_dir: str | None = None):
    """pairs: [(name, audio, sr, video (T, C, H, W) [0, 1])].

    Returns records [{clip, measure, audio_feature, video_feature, value}];
    writes ``av_study.csv`` and one heatmap per measure when ``out_dir``.
    """
    fns = {m: CORRELATION_FNS[m] for m in measures}
    records = []
    for name, audio, sr, video in pairs:
        audio = jnp.asarray(audio)
        video = jnp.asarray(video)
        afeats = {fn.__name__: fn(audio, int(sr)) for fn in AFNS}
        vfeats = {vn: fn(video) for vn, fn in zip(VFN_NAMES, VFNS)}
        T = min(min(a.shape[0] for a in afeats.values()),
                min(v.shape[0] for v in vfeats.values()))
        for an, af in afeats.items():
            for vn, vf in vfeats.items():
                a2, v2 = _flatten(af[:T]), _flatten(vf[:T])
                for m, fn in fns.items():
                    records.append({"clip": name, "measure": m, "audio_feature": an,
                                    "video_feature": vn, "value": float(fn(a2, v2))})
    if out_dir is not None:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        try:
            import pandas as pd

            pd.DataFrame(records).to_csv(out / "av_study.csv")
        except ImportError:
            pass
        from ..utils.plot import correlation_heatmap

        for m in measures:
            recs_m = [{"clip": r["clip"], f"{r['audio_feature']}|{r['video_feature']}": r["value"]}
                      for r in records if r["measure"] == m]
            correlation_heatmap(recs_m, str(out / f"av_study_{m}.png"))
    return records
