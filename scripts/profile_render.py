"""Per-op profile of the 1024px render program (VERDICT r4 item 4).

ARCHITECTURE.md's 38%-of-peak "measured ceiling" rested on end-to-end A/B
experiments; this script substantiates (or breaks) it with a real device
trace: run the exact bench.py render step under jax.profiler, parse the
xplane with tensorboard-plugin-profile, and emit the per-op/per-category
time breakdown.

    python scripts/profile_render.py [--resolution 1024] [--batch 48]

Writes docs/render_profile.json: top ops by self time, time grouped by op
category (conv / elementwise-fusion / copy / other), and the share of the
step in MXU convolutions — the number that says whether the remaining 62%
is non-matmul work (a real ceiling) or fusion overhead (a lever).
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_step(resolution: int, batch: int):
    import jax
    import jax.numpy as jnp

    from ssar_tpu.gan import stylegan2 as sg

    cfg = sg.StyleGAN2Config(resolution=resolution)
    params = sg.init_generator(jax.random.PRNGKey(0), cfg)
    prep = jax.jit(lambda p: sg.prepare_synthesis(p, cfg, jnp.bfloat16))(params)

    def step_fn(p, pre, l, n):
        frames = (sg.synthesis(p, l, n, cfg, dtype=jnp.bfloat16, prep=pre) + 1.0) / 2.0
        u8 = (jnp.clip(frames, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        return u8[0, 0, 0, 0]

    latents = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.n_latent, 512))
    noises = [jax.random.normal(jax.random.PRNGKey(i), (batch, h, w, 1), jnp.bfloat16)
              for i, (h, w) in enumerate(cfg.noise_shapes())]
    compiled = jax.jit(step_fn).lower(params, prep, latents, noises).compile()
    return lambda: compiled(params, prep, latents, noises)


def parse_xplane(trace_dir: str) -> dict:
    """Extract per-op self times from the captured xplane protos."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(Path(paths[-1]).read_bytes())

    ops = defaultdict(float)  # op name -> total duration (us)
    device_total = 0.0
    for plane in xspace.planes:
        if "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            # ONLY the synchronous op timeline: 'Async XLA Ops' spans
            # (DMA copy-start..done) OVERLAP compute and triple-count the
            # step; 'XLA Ops' sums exactly to the wall step time
            # (validated: 1353.9 ms / 8 iters = 169 ms/step = the bench's
            # measured 281 fps at batch 48)
            if line.name != "XLA Ops":
                continue
            for event in line.events:
                meta = plane.event_metadata[event.metadata_id]
                dur_us = event.duration_ps / 1e6
                ops[meta.name] += dur_us
                device_total += dur_us
    return {"ops": dict(ops), "device_total_us": device_total, "file": paths[-1]}


def categorize(name: str) -> str:
    """Classify by the HLO op PREFIX (before ' = '): operand names inside a
    fusion's argument list must not leak into the category."""
    head = name.split(" = ")[0].lower()
    if "copy" in head:
        return "layout copy"
    if "fusion" in head:
        return "fused compute (convs + elementwise)"
    if "convolution" in head or "dot" in head:
        return "conv/dot"
    if "broadcast" in head:
        return "materialized broadcast"
    if "transpose" in head or "bitcast" in head or "reshape" in head:
        return "transpose/reshape"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trace_dir", default="/tmp/jax-trace-render")
    ap.add_argument("--out", default="docs/render_profile.json")
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}")
    step = build_step(args.resolution, args.batch)
    np.asarray(step())  # warm + compile outside the trace

    t0 = time.time()
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.iters):
        out = step()
    np.asarray(out)
    jax.profiler.stop_trace()
    wall = time.time() - t0
    print(f"traced {args.iters} steps in {wall:.2f}s "
          f"({args.batch * args.iters / wall:.0f} fps incl. trace overhead)")

    parsed = parse_xplane(args.trace_dir)
    ops = parsed["ops"]
    per_step = {k: v / args.iters for k, v in ops.items()}
    top = sorted(per_step.items(), key=lambda kv: -kv[1])[:30]
    by_cat = defaultdict(float)
    for name, us in per_step.items():
        by_cat[categorize(name)] += us
    total = sum(per_step.values())

    result = {
        "resolution": args.resolution, "batch": args.batch, "iters": args.iters,
        "wall_s": round(wall, 3),
        "device_us_per_step": round(total, 1),
        "by_category_us": {k: round(v, 1) for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])},
        "by_category_pct": {k: round(100 * v / max(total, 1e-9), 1)
                            for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])},
        "top_ops_us": [{"op": k, "us": round(v, 1), "pct": round(100 * v / max(total, 1e-9), 1)}
                       for k, v in top],
        "xplane": parsed["file"],
    }
    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps({k: result[k] for k in ("device_us_per_step", "by_category_pct")}, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
