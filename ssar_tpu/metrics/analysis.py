"""Exploratory analysis toolkit: covariance distances, kNN KL, mutual info.

Equivalent of ssar/analysis/preliminary.py (PCA/covariance-matrix distances
on SPD matrices, k-nearest-neighbour KL divergence, a differentiable
mutual-information estimate) used for the paper's audio-video feature
studies.  jnp throughout; eigendecompositions are tiny (feature-dim sized).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def covariance(x: jax.Array) -> jax.Array:
    x = x - jnp.mean(x, axis=0)
    return x.T @ x / (x.shape[0] - 1)


def _sqrtm_psd(A: jax.Array) -> jax.Array:
    w, v = jnp.linalg.eigh(A)
    return (v * jnp.sqrt(jnp.maximum(w, 0.0))) @ v.T


def _logm_psd(A: jax.Array, eps: float = 1e-10) -> jax.Array:
    w, v = jnp.linalg.eigh(A)
    return (v * jnp.log(jnp.maximum(w, eps))) @ v.T


def frobenius_distance(A: jax.Array, B: jax.Array) -> jax.Array:
    return jnp.linalg.norm(A - B)


def affine_invariant_distance(A: jax.Array, B: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Riemannian SPD distance ||log(A^-1/2 B A^-1/2)||_F."""
    A = A + eps * jnp.eye(A.shape[0])
    B = B + eps * jnp.eye(B.shape[0])
    w, v = jnp.linalg.eigh(A)
    inv_sqrt = (v * (1.0 / jnp.sqrt(jnp.maximum(w, eps)))) @ v.T
    M = inv_sqrt @ B @ inv_sqrt
    return jnp.linalg.norm(_logm_psd(M))


def log_euclidean_distance(A: jax.Array, B: jax.Array, eps: float = 1e-6) -> jax.Array:
    n = A.shape[0]
    return jnp.linalg.norm(_logm_psd(A + eps * jnp.eye(n)) - _logm_psd(B + eps * jnp.eye(n)))


def bures_wasserstein_distance(A: jax.Array, B: jax.Array) -> jax.Array:
    """W2 distance between zero-mean gaussians with covariances A, B."""
    sA = _sqrtm_psd(A)
    cross = _sqrtm_psd(sA @ B @ sA)
    return jnp.sqrt(jnp.maximum(jnp.trace(A) + jnp.trace(B) - 2 * jnp.trace(cross), 0.0))


COVARIANCE_DISTANCES = {
    "frobenius": frobenius_distance,
    "affine_invariant": affine_invariant_distance,
    "log_euclidean": log_euclidean_distance,
    "bures_wasserstein": bures_wasserstein_distance,
}


def knn_kl_divergence(x: jax.Array, y: jax.Array, k: int = 5) -> jax.Array:
    """kNN estimator of KL(p_x || p_y) (Perez-Cruz 2008) — the sample-based
    distribution divergence from preliminary.py's feature study."""
    n, d = x.shape
    m = y.shape[0]

    def kdist(a, b, kk, exclude_self):
        d2 = jnp.sum((a[:, None] - b[None]) ** 2, axis=-1)
        if exclude_self:
            d2 = d2 + jnp.eye(a.shape[0]) * 1e18
        return jnp.sqrt(jnp.sort(d2, axis=1)[:, kk - 1])

    rho = kdist(x, x, k, True)
    nu = kdist(x, y, k, False)
    return d * jnp.mean(jnp.log(nu / (rho + 1e-12) + 1e-12)) + np.log(m / (n - 1.0))


def mutual_information(x: jax.Array, y: jax.Array, sigma: float = 1.0, bins: int = 16) -> jax.Array:
    """Differentiable MI via soft (gaussian-kernel) histograms — the
    MutualInformation module's approach (preliminary.py)."""
    def soft_hist(v):
        v = (v - jnp.min(v)) / (jnp.max(v) - jnp.min(v) + 1e-8)
        centers = jnp.linspace(0, 1, bins)
        w = jnp.exp(-0.5 * ((v[:, None] - centers[None]) / (sigma / bins)) ** 2)
        return w / (jnp.sum(w, axis=1, keepdims=True) + 1e-12)

    px = soft_hist(x.reshape(-1))
    py = soft_hist(y.reshape(-1))
    pxy = px.T @ py / px.shape[0]
    pxm = jnp.sum(pxy, axis=1, keepdims=True)
    pym = jnp.sum(pxy, axis=0, keepdims=True)
    return jnp.sum(pxy * jnp.log((pxy + 1e-12) / (pxm @ pym + 1e-12)))


def pca(x: jax.Array, n_components: int):
    """(T, D) -> (components (n, D), explained_variance, projected (T, n))."""
    xc = x - jnp.mean(x, axis=0)
    u, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    var = s**2 / (x.shape[0] - 1)
    return vt[:n_components], var[:n_components], xc @ vt[:n_components].T
