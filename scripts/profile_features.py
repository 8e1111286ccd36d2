"""Per-stage profile of the fused 59-dim feature program (VERDICT r2 item 5).

audio2features is one fused program per signature; this script times each
of its stage sub-programs separately on the 40 s bench budget (the stages
are individually jitted, so the per-stage timings add up to ~the fused
cost modulo XLA cross-stage fusion) and prints the breakdown that
ARCHITECTURE.md commits. Also traces the fused program with jax.profiler
(--trace) for offline inspection.

    python scripts/profile_features.py           # TPU
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FPS = 24
SR = 1024 * FPS


def make_track(seconds: int) -> np.ndarray:
    rng = np.random.RandomState(0)
    t = np.arange(seconds * SR) / SR
    x = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.randn(seconds * SR))
    x[:: SR // 2] += 1.0
    return x.astype(np.float32)


def _sync(out):
    """True device sync: fetch one scalar.  On the tunneled axon runtime
    block_until_ready returns immediately (bench.py:109-110); only a value
    fetch drains the stream."""
    import jax

    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "shape"):
            v = leaf.ravel()[0] if leaf.ndim else leaf
            if jnp.iscomplexobj(v):
                v = jnp.abs(v)  # complex fetch is UNIMPLEMENTED on axon
            np.asarray(v)
            return


def timed(label, fn, *a, iters=10, results=None, **kw):
    out = fn(*a, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a, **kw)
    # one fetch after the async dispatch queue: total = iters x device time
    # + a single ~50 ms tunnel round trip (amortized below the noise floor)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:34s} {dt:9.2f} ms", flush=True)
    if results is not None:
        results[label] = round(dt, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=40)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--out", default="docs/feature_profile.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssar_tpu.audio import features as FT
    from ssar_tpu.audio.constantq import cqt
    from ssar_tpu.audio.pitch import estimate_tuning

    audio = jnp.asarray(make_track(args.seconds))
    print(f"backend: {jax.default_backend()}  track: {args.seconds}s "
          f"({audio.shape[0]} samples)")
    res = {}

    F = timed("audio2features (fused, total)", FT.audio2features, audio, SR, FPS,
              results=res)
    total_ms = res["audio2features (fused, total)"]
    print(f"  = {args.seconds * 1e3 / total_ms:.0f}x realtime\n")

    harm, perc = timed("  _stage_hp (HPSS)", FT._stage_hp, audio, results=res)
    timed("  tuning (harmonic[:4s] piptrack)", estimate_tuning, harm[: 4 * SR], SR,
          results=res)
    timed("  _stage_spectral (mel/mfcc/contrast)", FT._stage_spectral, audio, SR,
          results=res)
    tuning = float(estimate_tuning(harm[: 4 * SR], SR))
    timed("  _stage_chroma (CQT+CENS+tonnetz)", FT._stage_chroma, harm, SR, tuning,
          results=res)
    # jitted, like the stage that contains it — eager cqt dispatches each
    # octave op over the tunnel and reads ~3x higher
    cqt_j = jax.jit(lambda x: cqt(x, SR, n_bins=252, bins_per_octave=36,
                                  tuning=0.0, method="recursive"))
    timed("    cqt 252x36 alone (jit)", cqt_j, harm, results=res)
    timed("  _stage_onsets (mel flux + PLP)", FT._stage_onsets, perc, SR, results=res)
    timed("  _stage_rms (8 band envelopes)", FT._stage_rms, harm, audio, SR,
          results=res)
    feats_raw = jnp.zeros((args.seconds * FPS, 59), jnp.float32)
    timed("  _stage_post (clamp+smooth)", FT._stage_post, feats_raw, FPS, True, True,
          False, results=res)

    staged = sum(v for k, v in res.items() if k.startswith("  ") and "alone" not in k)
    res["sum_of_stages"] = round(staged, 2)
    res["x_realtime"] = round(args.seconds * 1e3 / total_ms, 1)
    res["seconds"] = args.seconds
    res["backend"] = jax.default_backend()
    print(f"\nsum of stages: {staged:.2f} ms (fused total {total_ms:.2f} ms)")

    if args.trace:
        with jax.profiler.trace("/tmp/jax_trace"):
            jax.block_until_ready(FT.audio2features(audio, SR, FPS))
        print("trace written to /tmp/jax_trace")

    Path(args.out).write_text(json.dumps(res, indent=2) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
