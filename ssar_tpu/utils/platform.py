"""Platform helpers: TPU detection and Pallas interpret-mode gating.

Pallas TPU kernels are compiled by Mosaic only when running on real TPU
hardware; on the CPU test mesh (tests/conftest.py forces JAX_PLATFORMS=cpu
with 8 virtual devices) every kernel transparently falls back to interpreter
mode so the same code path — and the same numerics contract — is exercised
everywhere.
"""
from __future__ import annotations

import jax


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_interpret() -> bool:
    """Whether pallas_call should run in interpreter mode (non-TPU backends)."""
    return not on_tpu()


def use_pallas() -> bool:
    """Whether a dispatch site should pick its Pallas kernel over the jnp
    reference (real-TPU backends only; elsewhere the XLA jnp path wins)."""
    return on_tpu()


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
