"""Multivariate correlation zoo — losses and evaluation measures.

Equivalent of ssar/features/correlation.py:14-403 + ssar/analysis/
{chatterjee,sgw}.py.  These double as self-supervised losses and as the
"audio-reactivity correlation" evaluation (SURVEY.md §2.3), so everything is
differentiable jnp (soft ranks replace torchsort; FOCI's rpy2->R dependency
is re-implemented natively, see ``foci``).

Conventions: inputs are (T, Dx), (T, Dy) feature matrices over time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..train.losses import orthogonal_procrustes_distance  # canonical procrustes


# ------------------------------------------------------------ helpers ----
def _center(x):
    return x - jnp.mean(x, axis=0, keepdims=True)


def soft_rank(x: jax.Array, regularization_strength: float = 1.0) -> jax.Array:
    """Differentiable ranks via a smoothed pairwise-comparison estimator
    (replaces torchsort.soft_rank for spearman).  (T,) -> (T,)."""
    d = (x[:, None] - x[None, :]) / regularization_strength
    return 0.5 + jnp.sum(jax.nn.sigmoid(d), axis=1)


def hard_rank(x: jax.Array) -> jax.Array:
    return jnp.argsort(jnp.argsort(x)).astype(jnp.float32) + 1.0


# ----------------------------------------------------- simple bivariate --
def pearson(x: jax.Array, y: jax.Array) -> jax.Array:
    """Mean absolute pairwise pearson correlation between columns."""
    x, y = _center(x), _center(y)
    x = x / (jnp.linalg.norm(x, axis=0, keepdims=True) + 1e-8)
    y = y / (jnp.linalg.norm(y, axis=0, keepdims=True) + 1e-8)
    return jnp.mean(jnp.abs(x.T @ y))


def spearman(x: jax.Array, y: jax.Array, differentiable: bool = False) -> jax.Array:
    rank = soft_rank if differentiable else hard_rank
    xr = jnp.stack([rank(c) for c in x.T], axis=1)
    yr = jnp.stack([rank(c) for c in y.T], axis=1)
    return pearson(xr, yr)


def concordance(x: jax.Array, y: jax.Array) -> jax.Array:
    """Lin's concordance correlation, averaged over column pairs."""
    xm, ym = jnp.mean(x, 0), jnp.mean(y, 0)
    xv, yv = jnp.var(x, 0), jnp.var(y, 0)
    cov = ((x - xm).T @ (y - ym)) / x.shape[0]
    ccc = 2 * cov / (xv[:, None] + yv[None, :] + (xm[:, None] - ym[None, :]) ** 2 + 1e-8)
    return jnp.mean(jnp.abs(ccc))


# ------------------------------------------------------- matrix methods --
def _cross(x, y):
    return _center(x).T @ _center(y)


def rv(x: jax.Array, y: jax.Array) -> jax.Array:
    """Escoufier's RV coefficient (correlation.py:90-123)."""
    xx, yy, xy = _cross(x, x), _cross(y, y), _cross(x, y)
    return jnp.sum(xy * xy) / (jnp.sqrt(jnp.sum(xx * xx) * jnp.sum(yy * yy)) + 1e-12)


def rv2(x: jax.Array, y: jax.Array) -> jax.Array:
    """Modified RV2 (Smilde et al.): time-domain Gram matrices with their
    diagonals removed — the canonical optimization target of
    ssar/optimize.py:326-346.  Bounded in [-1, 1]."""
    xc, yc = _center(x), _center(y)
    xx = xc @ xc.T
    yy = yc @ yc.T
    xx = xx - jnp.diag(jnp.diag(xx))
    yy = yy - jnp.diag(jnp.diag(yy))
    num = jnp.sum(xx * yy)
    den = jnp.sqrt(jnp.sum(xx * xx) * jnp.sum(yy * yy)) + 1e-12
    return num / den


def rv_adjusted(x: jax.Array, y: jax.Array) -> jax.Array:
    """Maye/Ghaziri adjusted RV: correlation-matrix variant."""
    def corr(a):
        a = _center(a)
        s = jnp.std(a, axis=0) + 1e-8
        return (a / s).T @ (a / s) / a.shape[0]

    xx, yy = corr(x), corr(y)
    a = _center(x) / (jnp.std(x, 0) + 1e-8)
    b = _center(y) / (jnp.std(y, 0) + 1e-8)
    xy = a.T @ b / x.shape[0]
    return jnp.sum(xy * xy) / (jnp.sqrt(jnp.sum(xx * xx) * jnp.sum(yy * yy)) + 1e-12)


def linear_cka(x: jax.Array, y: jax.Array) -> jax.Array:
    xy = _cross(x, y)
    xx = _cross(x, x)
    yy = _cross(y, y)
    return jnp.sum(xy * xy) / (jnp.linalg.norm(xx) * jnp.linalg.norm(yy) + 1e-12)


def svcca(x: jax.Array, y: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Mean canonical correlation after whitening (SVCCA/PWCCA family)."""
    def whiten(a):
        a = _center(a)
        u, s, vt = jnp.linalg.svd(a, full_matrices=False)
        keep = s > eps * jnp.max(s)
        return u * keep
    qx, qy = whiten(x), whiten(y)
    s = jnp.linalg.svd(qx.T @ qy, compute_uv=False)
    return jnp.mean(s)


def smi(x: jax.Array, y: jax.Array, k: int | None = None) -> jax.Array:
    """Similarity of Matrices Index (orthogonal projection variant,
    correlation.py:188-276)."""
    def basis(a, k_):
        u, s, vt = jnp.linalg.svd(_center(a), full_matrices=False)
        return u[:, :k_]
    kx = k or min(x.shape[1], x.shape[0] - 1)
    ky = k or min(y.shape[1], y.shape[0] - 1)
    ux, uy = basis(x, kx), basis(y, ky)
    s = jnp.linalg.svd(ux.T @ uy, compute_uv=False)
    return jnp.sum(s**2) / min(kx, ky)


def procrustes(x: jax.Array, y: jax.Array) -> jax.Array:
    """Similarity form: 1 - procrustes distance."""
    return 1.0 - orthogonal_procrustes_distance(x, y)


def autocorrcorr(x: jax.Array, y: jax.Array) -> jax.Array:
    """Correlation of row-normalised time-Gram matrices over their strict
    upper triangles (ssar/features/correlation.py:71-88) — the zoo-level
    form of the chromatic-reactivity statistic."""
    def gram(a):
        a = _center(a)
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-12)
        return a @ a.T

    T = x.shape[0]
    iu = jnp.triu_indices(T, k=1)
    gx = gram(x)[iu]
    gy = gram(y)[iu]
    gx = gx - gx.mean()
    gy = gy - gy.mean()
    return jnp.sum(gx * gy) / (jnp.linalg.norm(gx) * jnp.linalg.norm(gy) + 1e-12)


# ----------------------------------- r-family / coxhead / pwcca ----------
def r1(x: jax.Array, y: jax.Array) -> jax.Array:
    """Inner-product correlation of time-Gram matrices
    (ssar/features/correlation.py:277-283)."""
    xc, yc = _center(x), _center(y)
    num = jnp.trace(xc @ yc.T)
    den = jnp.sqrt(jnp.trace(xc @ xc.T) * jnp.trace(yc @ yc.T))
    return num / (den + 1e-12)


def r2(x: jax.Array, y: jax.Array) -> jax.Array:
    """r1 on the scaled left singular bases U diag(s)
    (correlation.py:286-293)."""
    def us(a):
        u, s, _ = jnp.linalg.svd(_center(a), full_matrices=False)
        return u * s[None, :]

    return r1(us(x), us(y))


def r3(x: jax.Array, y: jax.Array) -> jax.Array:
    """r1 on the orthogonal polar factors U V^T (correlation.py:296-302)."""
    def uv(a):
        u, _, vt = jnp.linalg.svd(_center(a), full_matrices=False)
        return u @ vt

    return r1(uv(x), uv(y))


def r4(x: jax.Array, y: jax.Array) -> jax.Array:
    """r1 on the left singular bases alone (correlation.py:305-310)."""
    def ubasis(a):
        return jnp.linalg.svd(_center(a), full_matrices=False)[0]

    return r1(ubasis(x), ubasis(y))


def rG(x: jax.Array, y: jax.Array, n_components: int | None = None) -> jax.Array:
    """Yanai's GCD-style coefficient: r1 between U_k^T U_k projector Grams
    (correlation.py:313-322).  ``n_components`` defaults to the full column
    rank bound (a static choice; the reference computes torch.matrix_rank,
    a data-dependent host sync)."""
    def ubasis(a, k):
        return jnp.linalg.svd(_center(a), full_matrices=False)[0][:, :k]

    kx = n_components or min(x.shape[1], x.shape[0] - 1)
    ky = n_components or min(y.shape[1], y.shape[0] - 1)
    ux, uy = ubasis(x, kx), ubasis(y, ky)
    return r1(ux.T @ ux, uy.T @ uy)


def coxhead(x: jax.Array, y: jax.Array) -> jax.Array:
    """Coxhead's multivariate association (the pinv trace form,
    correlation.py:334-351)."""
    if y.shape[1] > x.shape[1]:
        x, y = y, x
    xc, yc = _center(x), _center(y)
    rxx = xc @ xc.T
    ryy = yc @ yc.T
    rxy = xc @ yc.T
    ryx = yc @ xc.T
    rxxinv = jnp.linalg.pinv(rxx)
    rrrrinv = jnp.linalg.pinv(ryy - ryx @ rxxinv @ rxy)
    return jnp.trace(rrrrinv @ ryx @ rxxinv @ rxy) / (jnp.trace(rrrrinv @ ryy) + 1e-12)


def pwcca(x: jax.Array, y: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Projection-weighted CCA similarity (1 - anatome pwcca_distance,
    correlation.py:395-396): canonical correlations weighted by how much of
    x projects onto each canonical direction."""
    xc, yc = _center(x), _center(y)
    qx, _ = jnp.linalg.qr(xc)
    qy, _ = jnp.linalg.qr(yc)
    u, s, _ = jnp.linalg.svd(qx.T @ qy, full_matrices=False)
    xdirs = qx @ u  # (T, k) canonical directions in time space
    alpha = jnp.sum(jnp.abs(xdirs.T @ xc), axis=1)
    alpha = alpha / (jnp.sum(alpha) + 1e-12)
    return jnp.sum(alpha * s)


# --------------------------------------------------------- chatterjee xi --
def xi(x: jax.Array, y: jax.Array) -> jax.Array:
    """Chatterjee's rank correlation ξ (ssar/analysis/chatterjee.py:46-84).
    x, y are 1-D; non-differentiable (uses hard sorts), ties broken by order."""
    x = x.reshape(-1)
    y = y.reshape(-1)
    n = x.shape[0]
    order = jnp.argsort(x)
    y_ord = y[order]
    r = jnp.sum(y_ord[:, None] >= y_ord[None, :], axis=0).astype(jnp.float32)
    l = jnp.sum(y_ord[:, None] <= y_ord[None, :], axis=0).astype(jnp.float32)
    num = n * jnp.sum(jnp.abs(r[1:] - r[:-1]))
    den = 2 * jnp.sum(l * (n - l))
    return 1.0 - num / (den + 1e-12)


def foci_codependence(y: jax.Array, x: jax.Array, n_neighbors: int = 1) -> jax.Array:
    """Conditional-dependence coefficient T(Y, X) (Azadkia & Chatterjee's
    CODEC, the statistic behind FOCI feature ordering).  Native replacement
    for the reference's rpy2 -> R bridge (chatterjee.py:87-112).

    x (T, d) conditioning features, y (T,) response.  Unconditional variant.
    """
    T = y.shape[0]
    # nearest neighbour of each row of x (euclidean, excluding self)
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    d2 = d2 + jnp.eye(T) * 1e18
    nn = jnp.argmin(d2, axis=1)
    R = jnp.sum(y[:, None] >= y[None, :], axis=1).astype(jnp.float32)
    L = jnp.sum(y[:, None] <= y[None, :], axis=1).astype(jnp.float32)
    num = jnp.sum(jnp.minimum(R, R[nn]) - L**2 / T)
    den = jnp.sum(L * (T - L) / T)
    return num / (den + 1e-12)


# ------------------------------------------- sliced gromov-wasserstein ---
def sgw(x: jax.Array, y: jax.Array, key: jax.Array | None = None, n_proj: int = 200) -> jax.Array:
    """Sliced Gromov-Wasserstein discrepancy (ssar/analysis/sgw.py:12-53):
    random 1-D projections + sorted matching + 1-D Gromov cost."""
    if key is None:
        key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    px = jax.random.normal(kx, (x.shape[1], n_proj))
    py = jax.random.normal(ky, (y.shape[1], n_proj))
    px = px / (jnp.linalg.norm(px, axis=0, keepdims=True) + 1e-12)
    py = py / (jnp.linalg.norm(py, axis=0, keepdims=True) + 1e-12)
    xs = jnp.sort(x @ px, axis=0)  # (T, n_proj)
    ys = jnp.sort(y @ py, axis=0)

    # direct O(T^2) 1-D Gromov cost on sorted projections (T <= ~500 in practice)
    da = (xs[:, None, :] - xs[None, :, :]) ** 2
    db = (ys[:, None, :] - ys[None, :, :]) ** 2
    cost = jnp.mean((da - db) ** 2, axis=(0, 1))
    return jnp.mean(cost)


CORRELATION_FNS = {
    "pearson": pearson,
    "spearman": spearman,
    "concordance": concordance,
    "autocorrcorr": autocorrcorr,
    "rv": rv,
    "rv2": rv2,
    "rv_adj": rv_adjusted,
    "cka": linear_cka,
    "svcca": svcca,
    "pwcca": pwcca,
    "smi": smi,
    "procrustes": procrustes,
}

# The r-family compares (T, D) matrices via trace inner products and is only
# defined for equal column counts (the reference's own sanity harness
# skips them on mismatched pairs via try/except, correlation.py:420-426).
CORRELATION_FNS_EQUAL_WIDTH = {
    "coxhead": coxhead,
    "r1": r1,
    "r2": r2,
    "r3": r3,
    "r4": r4,
    "rG": rG,
}
