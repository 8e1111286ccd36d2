"""Latent-sequence construction: spline loops + feature/segment patches.

Equivalent of ssar/random/latent.py: a base W+ sequence is a natural cubic
spline loop through palette latents; subpatches overlay segmentation-,
feature-, or loop-driven sequences into W+ layer bands by averaging,
modulation, or overwrite.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.gaussian import gaussian_filter

MERGE_DEPTH_SLICES = {
    "low": slice(0, 6), "mid": slice(6, 12), "high": slice(12, 18),
    "lowmid": slice(0, 12), "midhigh": slice(6, 18), "all": slice(0, 18),
}


def natural_cubic_spline(t_in: jax.Array, y: jax.Array, t_out: jax.Array) -> jax.Array:
    """Natural cubic spline through (t_in, y) evaluated at t_out.

    y: (n, ...) values; returns (len(t_out), ...).  The tridiagonal system
    is tiny (n <= ~20 knots), solved densely.
    """
    n = y.shape[0]
    shape = y.shape[1:]
    yf = y.reshape(n, -1)
    h = t_in[1:] - t_in[:-1]  # (n-1,)

    # second-derivative system: natural BCs m_0 = m_{n-1} = 0
    A = jnp.zeros((n, n))
    A = A.at[0, 0].set(1.0).at[n - 1, n - 1].set(1.0)
    rows = jnp.arange(1, n - 1)
    A = A.at[rows, rows - 1].set(h[:-1])
    A = A.at[rows, rows].set(2.0 * (h[:-1] + h[1:]))
    A = A.at[rows, rows + 1].set(h[1:])
    d = jnp.zeros((n, yf.shape[1]))
    slope = (yf[1:] - yf[:-1]) / h[:, None]
    d = d.at[1:-1].set(6.0 * (slope[1:] - slope[:-1]))
    m = jnp.linalg.solve(A, d)  # (n, F)

    idx = jnp.clip(jnp.searchsorted(t_in, t_out, side="right") - 1, 0, n - 2)
    x0 = t_in[idx]
    hi = h[idx][:, None]
    a = (t_in[idx + 1] - t_out)[:, None] / hi
    b = (t_out - x0)[:, None] / hi
    out = (a * yf[idx] + b * yf[idx + 1]
           + ((a**3 - a) * m[idx] + (b**3 - b) * m[idx + 1]) * hi**2 / 6.0)
    return out.reshape((len(t_out),) + shape)


def spline_loop_latents(y: jax.Array, size: int, n_loops: float = 1.0) -> jax.Array:
    """Closed spline loop through latents y (n, n_ws, 512) -> (size, n_ws, 512)
    (ssar/random/latent.py:7-13)."""
    y = jnp.concatenate([y, y[:1]], axis=0)
    t_in = jnp.linspace(0, 1, y.shape[0])
    t_out = jnp.linspace(0, n_loops, size) % 1.0
    return natural_cubic_spline(t_in, y, t_out)


def latent_patch(key, latents, palette, segmentations, features, tempo, fps, *,
                 patch_type, segments, loop_bars, seq_feat, seq_feat_weight,
                 mod_feat, mod_feat_weight, merge_type, merge_depth):
    """Apply one random latent subpatch (ssar/random/latent.py:16-80)."""
    feature = seq_feat_weight * features[seq_feat]
    segmentation = segmentations[(seq_feat, segments)]
    permutation = jax.random.permutation(key, palette.shape[0])

    if patch_type == "segmentation":
        selection = permutation[:segments]
        labels = jnp.argmax(segmentation, axis=1) if segmentation.ndim == 2 else segmentation
        sequence = palette[selection[labels]]
        sequence = gaussian_filter(sequence, 5)
    elif patch_type == "feature":
        n_select = feature.shape[1]
        if n_select == 1:
            selection = permutation[:2]
            sequence = feature[..., None] * palette[selection][0:1] \
                + (1 - feature[..., None]) * palette[selection][1:2]
        else:
            selection = permutation[:n_select]
            sequence = jnp.einsum("TN,NWL->TWL", feature, palette[selection])
    elif patch_type == "loop":
        selection = permutation[:segments]
        n_loops = latents.shape[0] / fps / 60 / tempo / 4 / loop_bars
        sequence = spline_loop_latents(palette[selection], latents.shape[0], n_loops=float(n_loops))
    else:
        raise ValueError(patch_type)
    sequence = gaussian_filter(sequence, 1)

    lays = MERGE_DEPTH_SLICES[merge_depth]
    if merge_type == "average":
        latents = latents.at[:, lays].set((latents[:, lays] + sequence[:, lays]) / 2)
    elif merge_type == "modulate":
        modulation = (mod_feat_weight * features[mod_feat])[..., None]
        latents = latents.at[:, lays].set(
            latents[:, lays] * (1 - modulation) + modulation * sequence[:, lays]
        )
    else:  # overwrite
        latents = latents.at[:, lays].set(sequence[:, lays])
    return latents
