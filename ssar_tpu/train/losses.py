"""Training losses: procrustes self-supervision, MSE supervision, grad-norm.

Equivalents of ssar/train.py:157-194:
- ``orthogonal_procrustes_distance``: 1 - ||x̄ᵀȳ||_nuc (nuclear norm via SVD —
  jnp.linalg.svd runs fine on TPU for the (D, D') cross-covariance).
- ``audio_reactive_loss``: per-batch procrustes between concatenated
  flattened audio features and latent/noise/video features.
- ``normalize_gradients``: custom_vjp identity that rescales the backward
  signal to unit norm x strength (the reference's autograd.Function).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def orthogonal_procrustes_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """x (T, Dx), y (T, Dy) -> scalar in [0, 2] (ssar/train.py:157-162).

    The nuclear norm ||x'y||_* is computed as sum sqrt(eigvals(A A^T)) on
    whichever Gram side of A = x'y is smaller — for the self-supervised
    loss that turns grad-of-SVD of a (n_ws*512 + noise, 59) matrix (a
    compile-time and runtime monster on TPU) into two matmuls plus a tiny
    symmetric eigendecomposition, whose eigenvalue gradients are also
    better-behaved than SVD's."""
    x = x - jnp.mean(x, axis=0, keepdims=True)
    x = x / (jnp.linalg.norm(x) + 1e-12)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = y / (jnp.linalg.norm(y) + 1e-12)
    a = x.T @ y
    m = a @ a.T if a.shape[0] <= a.shape[1] else a.T @ a
    ev = jnp.linalg.eigvalsh(m)
    s = jnp.sqrt(jnp.clip(ev, 0.0) + 1e-24)  # |eps err| <= d * 1e-12
    return 1.0 - jnp.sum(s)


def audio_reactive_loss(afeats, vfeats) -> jax.Array:
    """Lists of (B, T, ...) arrays -> (B,) procrustes distances
    (ssar/train.py:165-176).  afeats/vfeats are concatenated along the
    flattened feature axis, then reduced per batch element."""
    if isinstance(afeats, dict):
        afeats, vfeats = list(afeats.values()), list(vfeats.values())
    a = jnp.concatenate([f.reshape(f.shape[0], f.shape[1], -1) for f in afeats], axis=2)
    v = jnp.concatenate([f.reshape(f.shape[0], f.shape[1], -1) for f in vfeats], axis=2)
    return jax.vmap(orthogonal_procrustes_distance)(a, v)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def normalize_gradients(x: jax.Array, strength: float = 1.0) -> jax.Array:
    """Identity forward; backward rescales grad to `strength`/||grad||
    (ssar/train.py:179-194)."""
    return x


def _ng_fwd(x, strength):
    return x, None


def _ng_bwd(strength, _, g):
    return (strength * g / (jnp.linalg.norm(g) + 1e-8),)


normalize_gradients.defvjp(_ng_fwd, _ng_bwd)


def supervised_loss(pred_latents, pred_noise, latents, noise_targets) -> jax.Array:
    """Sum of MSEs over latents + noise pyramid (ssar/train.py:285-298)."""
    loss = jnp.mean((pred_latents - latents) ** 2)
    for p, t in zip(pred_noise, noise_targets):
        loss = loss + jnp.mean((p - t) ** 2)
    return loss


def supervised_loss_per_example(pred_latents, pred_noise, latents, noise_targets) -> jax.Array:
    """Per-window (B,) variant of :func:`supervised_loss` — the val loop
    medians over WINDOWS (the val split is ~1 batch, so a batch-level
    median is the mean; the env/env.sum heavy tail lives at window
    granularity, docs/GRID.md)."""
    axes = tuple(range(1, pred_latents.ndim))
    loss = jnp.mean((pred_latents - latents) ** 2, axis=axes)
    for p, t in zip(pred_noise, noise_targets):
        loss = loss + jnp.mean((p - t) ** 2, axis=tuple(range(1, p.ndim)))
    return loss
