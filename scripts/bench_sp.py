"""SP feature-extraction scaling table (VERDICT r2 item 8).

Measures audio2features_sharded over a 1/2/4/8-device mesh on a 3-minute
track and writes docs/sp_scaling.json.

Two modes, chosen by the platform the interpreter starts on:

- CPU (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8):
  the virtual mesh validates the SP *mechanics* (chunk plan, halos, pass-2
  assembly) and records per-device chunk shapes. HONEST CAVEAT: this image
  has ONE physical core, so the N virtual devices timeshare it and
  wall-clock cannot go down with N; the committed numbers demonstrate work
  partitioning (per-chunk frames ~ T/N + 2*halo) and constant assembly
  overhead, not speedup. On a real N-chip mesh pass 1 is embarrassingly
  parallel over chips.
- TPU (default): measures the single-chip chunked long-form pipeline
  (audio2features_long) against the fused whole-track program, the
  realtime multiple, and pass-1 vs pass-2 split. This is the real-hardware
  anchor for the table.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_sp.py --seconds 180
    python scripts/bench_sp.py --seconds 180   # TPU anchor
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
    x[:: SR // 2] += 1.0  # 2 Hz clicks
    return x.astype(np.float32)


def timed(fn, *a, repeats=3, **kw):
    def sync(o):
        # true device sync: fetch one scalar.  On the tunneled axon runtime
        # block_until_ready returns immediately (bench.py:109-110)
        np.asarray(o.ravel()[0])

    out = fn(*a, **kw)
    sync(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        sync(out)
        times.append(time.perf_counter() - t0)
    return out, min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=180)
    ap.add_argument("--out", default="docs/sp_scaling.json")
    args = ap.parse_args()

    import os

    import jax

    # the axon sitecustomize force-registers the TPU plugin and overrides
    # JAX_PLATFORMS; honor the env var explicitly (tests/conftest.py pattern)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from ssar_tpu.parallel.features_sp import (_chunk_plan, audio2features_long,
                                               audio2features_sharded)

    platform = jax.default_backend()
    audio = make_track(args.seconds)
    T = args.seconds * FPS
    result = {"platform": platform, "seconds": args.seconds, "frames": T,
              "physical_cores": 1 if platform == "cpu" else None, "rows": []}

    if platform == "cpu":
        from jax.sharding import Mesh

        n_avail = len(jax.devices())
        ref = None
        for n in (1, 2, 4, 8):
            if n > n_avail:
                break
            mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
            feats, dt = timed(audio2features_sharded, audio, SR, FPS,
                              mesh=mesh, repeats=2)
            fpc, halo, chunk_frames, _, _ = _chunk_plan(T, n)
            row = {"devices": n, "wall_s": round(dt, 2),
                   "frames_per_device_chunk": chunk_frames,
                   "halo_frames": halo,
                   "device_work_fraction": round(chunk_frames / T, 4)}
            if ref is None:
                ref = np.asarray(feats)
            else:
                row["max_abs_dev_vs_1dev"] = float(np.abs(np.asarray(feats) - ref).max())
            result["rows"].append(row)
            print(row, flush=True)
    else:
        # chunk-size sweep (VERDICT r4 item 3): one batched pass-1 dispatch
        # per run, so the trade is halo overhead vs per-chunk program size.
        # The fused whole-track program is NOT attempted at this length: its
        # remote compile was measured to stall >20 min at T=4320 (the r4
        # error row) — bounding compiled program size is the design, and the
        # chunked path's parity with the fused program is covered at test
        # lengths by tests/test_parallel.py.
        ref = None
        for cf in (960, 1440):
            feats_l, dt_long = timed(audio2features_long, audio, SR, FPS,
                                     chunk_frames=cf)
            row = {"mode": f"chunked audio2features_long (single chip, chunk={cf})",
                   "chunk_frames": cf, "wall_s": round(dt_long, 3),
                   "realtime_x": round(args.seconds / dt_long, 1)}
            if ref is None:
                ref = np.asarray(feats_l)
            else:
                row["max_abs_dev_vs_chunk960"] = float(
                    np.abs(np.asarray(feats_l) - ref).max())
            result["rows"].append(row)
            print(row, flush=True)
        best = max(result["rows"], key=lambda r: r.get("realtime_x", 0))
        result["best"] = {"chunk_frames": best["chunk_frames"],
                          "realtime_x": best["realtime_x"]}
        print("best:", result["best"], flush=True)

    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
