"""Tracing / profiling helpers (aux subsystem, SURVEY.md §5.1).

The reference profiles with ad-hoc time() deltas and a CUDA-kernel
autotuner; the TPU equivalents are jax.profiler traces plus a tiny
stage-timer that accounts for async dispatch (block_until_ready), and a
generic grid autotuner for pallas kernel block sizes (the analogue of the
reference's cauchy #define-sweep, ssar/models/sashimi/cauchy/tuner.py).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StageTimer:
    """Named stage timing with device sync; prints a summary table."""

    records: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.time()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.records.setdefault(name, []).append(time.time() - t0)

    def summary(self) -> str:
        lines = ["stage".ljust(30) + "mean ms".rjust(10) + "calls".rjust(8)]
        for name, ts in self.records.items():
            lines.append(name.ljust(30) + f"{1e3 * sum(ts) / len(ts):10.2f}" + f"{len(ts):8d}")
        return "\n".join(lines)


def autotune(make_fn, configs: list[dict], args, iters: int = 10, warmup: int = 2):
    """Benchmark a kernel factory over a config grid; returns
    (best_config, results) — the pallas analogue of the reference's
    cauchy tile sweep."""
    results = []
    for cfg in configs:
        try:
            fn = make_fn(**cfg)
            out = fn(*args)
            jax.block_until_ready(out)
            for _ in range(warmup):
                out = fn(*args)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            results.append({**cfg, "time": (time.time() - t0) / iters})
        except Exception as e:
            results.append({**cfg, "time": float("inf"), "error": str(e)[:100]})
    best = min(results, key=lambda r: r["time"])
    return {k: v for k, v in best.items() if k not in ("time", "error")}, results
