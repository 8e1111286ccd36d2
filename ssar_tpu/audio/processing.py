"""Signal-processing utilities (equivalent of ssar/features/processing.py).

Re-exports the kernel-layer ops and adds normalisation/emphasis helpers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.gaussian import gaussian_filter  # noqa: F401
from ..ops.iir import high_pass, low_pass, mid_pass  # noqa: F401
from ..ops.median import median_filter  # noqa: F401
from ..ops.quantile import (  # noqa: F401
    clamp_lower_percentile,
    clamp_peaks_percentile,
    clamp_upper_percentile,
    quantile,
)


def normalize(array: jax.Array) -> jax.Array:
    """Min-max to [0, 1] (processing.py:52-55)."""
    array = array - jnp.min(array)
    return array / (jnp.max(array) + 1e-8)


def standardize(array: jax.Array) -> jax.Array:
    """IQR clamp + min-max (processing.py:58-61; used exact C++ quantiles)."""
    lo = jnp.quantile(array, 0.25)
    hi = jnp.quantile(array, 0.75) + 1e-10
    return normalize(jnp.clip(array, lo, hi))


def spectral_flux(spec: jax.Array) -> jax.Array:
    """Forward time-difference, zero-padded at the end (processing.py:88-89)."""
    return jnp.diff(spec, axis=0, append=jnp.zeros((1, spec.shape[1]), spec.dtype))


def onset_envelope(flux: jax.Array) -> jax.Array:
    """Half-wave-rectified flux -> [0,1] envelope (processing.py:93-98)."""
    u = jnp.sum(0.5 * (flux + jnp.abs(flux)), axis=1)
    u = jnp.clip(u, jnp.quantile(u, 0.025), jnp.quantile(u, 0.975))
    u = u - jnp.min(u)
    return u / jnp.max(u)


def emphasize(envs: jax.Array, strength: float, percentile: float) -> jax.Array:
    """tanh expander above the per-column percentile (processing.py:132-138)."""
    mn = jnp.min(envs, axis=0)
    x = envs - mn
    mx = jnp.max(x, axis=0)
    x = x / mx
    x = x * (1 + jnp.tanh(strength * (x - jnp.quantile(x, percentile / 100.0, axis=0))))
    return (x * mx) + mn


def sync_agg(data: jax.Array, slices: list, aggregate=jnp.mean, axis: int = -1,
             pad_slice: bool = False) -> jax.Array:
    """Aggregate `data` over a host list of index slices along `axis`
    (ssar/features/rosa/helpers.py:4-21): the beat-synchronisation helper.
    Slices are static, so this unrolls to a fixed stack of reductions."""
    if pad_slice:
        slices = list(slices) + [data.shape[axis] - 1]
    idx = [slice(None)] * data.ndim
    outs = []
    for segment in slices:
        if isinstance(segment, int):  # single index -> width-1 window
            segment = slice(segment, segment + 1)
        idx[axis] = segment
        outs.append(aggregate(data[tuple(idx)], axis=axis))
    return jnp.stack(outs, axis=axis)
