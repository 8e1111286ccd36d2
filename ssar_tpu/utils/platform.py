"""Platform helpers: TPU detection and Pallas interpret-mode gating.

Pallas TPU kernels are compiled by Mosaic only when running on real TPU
hardware; on the CPU test mesh (tests/conftest.py forces JAX_PLATFORMS=cpu
with 8 virtual devices) every kernel transparently falls back to interpreter
mode so the same code path — and the same numerics contract — is exercised
everywhere.
"""
from __future__ import annotations

import contextlib
import contextvars

import jax

_FORCE_INTERPRET = contextvars.ContextVar("pallas_force_interpret", default=False)


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_interpret() -> bool:
    """Whether pallas_call should run in interpreter mode (non-TPU backends,
    or inside a host_compute() block)."""
    return _FORCE_INTERPRET.get() or not on_tpu()


def use_pallas() -> bool:
    """Whether a dispatch site should pick its Pallas kernel over the jnp
    reference.  False inside host_compute(): interpret-mode Pallas executes
    the grid in Python and is far slower than the XLA:CPU jnp path."""
    return on_tpu() and not _FORCE_INTERPRET.get()


def host_eager() -> bool:
    """True inside host_compute(): dispatch sites should prefer eager
    python loops / unjitted paths over lax.scan-and-jit — on the host the
    per-op dispatch is microseconds while every fresh shape's XLA:CPU
    compile of a fused scan costs seconds (beat counts differ per clip, so
    segmentation shapes NEVER repeat across clips)."""
    return _FORCE_INTERPRET.get()


@contextlib.contextmanager
def host_compute():
    """Run eager jnp math on the host CPU backend.

    For tiny-matrix workloads (beat-sync segmentation: tens-of-rows
    recurrence matrices, 50x50 eigh) the tunneled TPU runtime's per-op
    dispatch latency and per-shape sub-threshold compiles dominate by
    orders of magnitude (measured 269 s cold / 1.8 s warm per feature on
    TPU vs milliseconds on host — generate/mir.py).  Sets the default
    device to CPU and forces pallas interpret mode; jit caches are
    per-backend, so TPU entries traced outside the block are unaffected.
    """
    cpu = jax.devices("cpu")[0]
    tok = _FORCE_INTERPRET.set(True)
    try:
        with jax.default_device(cpu):
            yield
    finally:
        _FORCE_INTERPRET.reset(tok)


def complex_const(c):
    """Upload a host complex array as two f32 planes + on-device combine.

    The axon TPU runtime cannot transfer complex dtypes across the host
    boundary (UNIMPLEMENTED); on-device complex compute is fine.  Use this
    for any eager materialisation of a numpy complex constant.  Inside jit,
    plain ``jnp.asarray`` works (the constant is embedded in the program).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    c = np.asarray(c)
    re = jnp.asarray(np.ascontiguousarray(c.real), dtype=jnp.float32)
    im = jnp.asarray(np.ascontiguousarray(c.imag), dtype=jnp.float32)
    return jax.lax.complex(re, im)
