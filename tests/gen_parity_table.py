"""Regenerate docs/PARITY.md: the committed frame-level parity table.

Usage: ``python -m tests.gen_parity_table`` (from the repo root; runs the
JAX stack on whatever backend is active — CPU is fine and bit-matches TPU
to float32 round-off for this pipeline).
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main(out_path: str = "docs/PARITY.md") -> None:
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
    import jax.numpy as jnp

    import tests.oracle_dsp as O
    from tests.test_parity_oracle import FEATURE_GROUPS, GROUP_TOL, SR, TRACKS
    from ssar_tpu.audio.features import audio2features

    import datetime
    import subprocess

    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True).stdout.strip() or "unknown"
    except OSError:
        rev = "unknown"
    stamp = datetime.date.today().isoformat()

    lines = [
        "# PARITY — frame-level parity vs the reference DSP semantics",
        "",
        f"Generated at rev `{rev}` on {stamp} (so a reader can tell which",
        "implementation state this table validates).",
        "",
        "Per-feature abs-diff of the full 59-dim `audio2features` stack against",
        "`tests/oracle_dsp.py`, an independent pure-numpy port of the reference",
        "PyTorch implementation (ssar/features/audio.py, ssar/features/rosa/*,",
        "ssar/supervised/data.py:59-107).  The format mirrors the reference's own",
        "librosa-parity harness (ssar/features/audio.py:162-190).",
        "",
        "Tracks: synthetic golden vectors (arpeggio+clicks / chord stack / noise",
        "bursts), 4 s at sr=24576 (fps 24), float32 inputs, oracle in float64.",
        "Regenerate with `python -m tests.gen_parity_table`.",
        "",
        "| track | feature group | min | mean | max | budget |",
        "|---|---|---|---|---|---|",
    ]
    worst = 0.0
    for name, au in TRACKS:
        F = np.asarray(audio2features(jnp.asarray(au), SR, 24, tuning=0.0))
        Fo = O.audio2features_np(au.astype(np.float64), SR, 24, tuning=0.0)
        for g, (a, b) in FEATURE_GROUPS.items():
            d = np.abs(F[:, a:b] - Fo[:, a:b])
            worst = max(worst, float(d.max()))
            lines.append(
                f"| {name} | {g} | {d.min():.2e} | {d.mean():.2e} | {d.max():.2e} | {GROUP_TOL[g]:.0e} |"
            )
    lines += [
        "",
        f"Worst-case deviation across all tracks and features: **{worst:.2e}**",
        "(budget: 1e-2 per BASELINE.md / VERDICT r1; group budgets above are",
        "~10x headroom over observed).",
        "",
        "Component-level parity (see tests/test_parity_oracle.py):",
        "- recursive CQT reproduces the reference chain (kaiser resampler +",
        "  basis sparsification) to < 1e-4 absolute;",
        "- chroma CENS, PLP, onset strength, biquads, MFCC, tonnetz, spectral",
        "  contrast/flatness, RMS, drop strength all at float32 round-off;",
        "- tuning estimation agrees bin-exactly at bpo 12 and 36.",
        "",
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path} (worst abs diff {worst:.3g})")


if __name__ == "__main__":
    main(*sys.argv[1:])
