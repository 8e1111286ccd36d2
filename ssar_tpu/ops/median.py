"""Median filters (1-D and separable 2-D windows).

Equivalents of the reference's ``median_filter2d``
(ssar/features/processing.py:74-84, used by hpss with (1,31)/(31,1) windows)
and ``median_filter1d`` (ssar/features/rosa/segment.py:63-67).

TPU approach: the window sizes used anywhere in the pipeline are small, odd
and static (7, 9, 31), so we materialise the k shifted views as a stacked
axis and take ``jnp.median`` — XLA lowers this to a sort of fixed tiny width,
fully vectorised on the VPU, no data-dependent control flow.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "axis", "mode"))
def median_filter(x: jax.Array, k: int, axis: int = -1, mode: str = "reflect") -> jax.Array:
    """Sliding-window median of odd width `k` along `axis` with padding.

    On TPU, 2-D reflect-padded inputs with k >= 7 dispatch to the pallas
    sliding-median kernel (ops/median_pallas.py) — one HBM pass + a VPU
    sorting network instead of materialising a (.., k) window tensor for
    XLA's generic sort.  Exact same results.  (Host-side per-clip callers
    use the numpy pipeline — audio/segment.py laplacian_segmentation_np —
    so no eager/jit split is needed here.)
    """
    assert k % 2 == 1, "median_filter expects odd window size"
    axis = axis % x.ndim

    from ..utils.platform import use_pallas

    if use_pallas() and x.ndim == 2 and mode == "reflect" and k >= 7:
        from .median_pallas import sliding_median_lastaxis

        if axis == x.ndim - 1:
            return sliding_median_lastaxis(x, k)
        return sliding_median_lastaxis(x.T, k).T

    p = k // 2
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (p, p)
    xp = jnp.pad(x, pad_width, mode=mode)
    windows = jnp.stack([jax.lax.slice_in_dim(xp, i, i + x.shape[axis], axis=axis) for i in range(k)], axis=-1)
    return jnp.median(windows, axis=-1)


def median_filter2d_freq(S: jax.Array, ks: int = 31) -> jax.Array:
    """Median over the frequency axis (axis 0 of a (F, T) spectrogram)."""
    return median_filter(S, ks, axis=0, mode="reflect")


def median_filter2d_time(S: jax.Array, ks: int = 31) -> jax.Array:
    """Median over the time axis (axis 1 of a (F, T) spectrogram)."""
    return median_filter(S, ks, axis=1, mode="reflect")
