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
