"""Preliminary audio-video correspondence study.

Structured rebuild of the reference's notebook-style exploration
(ssar/analysis/preliminary.py, 1 007 LoC of pandas/torch cells): does a
corpus of music videos show measurably more audio-video correspondence
than a deliberately misaligned (permuted) pairing of the same clips?

The reference answers this with per-group tables of
  - summed sliced Gromov-Wasserstein between stacked deep features
    (preliminary.py:413-433 ``compare_av_feats``),
  - mean trace-correlation / Bures-Wasserstein distances between the
    per-clip time-Gram matrices of those features (:135-205),
  - DTW statistics between audio and video onset envelopes (:463-472),
  - soft-binned mutual information between tempograms (:475-480),
computed once for the aligned pairing and once against a permutation
null.  Here that whole driver is :func:`preliminary_study`, built on
batched jit-friendly primitives instead of dataframe cells.

The exploratory tail of the reference applies time-series "imaging"
transforms from pyts/tsai (Gramian angular fields, joint recurrence
plots, MiniRocket; preliminary.py:617-668, 905-955).  Those libraries do
not exist here, so the transforms are implemented natively: GAF/JRP are
closed-form einsums, and MiniRocket is a fit/transform pair whose 84
fixed kernels run as one grouped ``lax.conv_general_dilated`` per
dilation — MXU-shaped instead of the reference's per-kernel loops.
"""
from __future__ import annotations

import csv
from itertools import combinations
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .analysis import mutual_information
from .correlation import sgw
from .rhythmic import dtw_distance

__all__ = [
    "standardize", "time_gram", "trace_correlation_distance",
    "bures_distance_batched", "kullback_distance", "condition_distance",
    "pca_svd", "pca_eig", "compare_av_feats", "preliminary_study",
    "gramian_angular_field", "joint_recurrence_plot",
    "minirocket_fit", "minirocket_transform",
]


# ------------------------------------------------------------ primitives --
def standardize(x: jax.Array, lo: float = 0.05, hi: float = 0.95) -> jax.Array:
    """Quantile-clip then min-max normalise (preliminary.py:69-73)."""
    x = jnp.clip(x, jnp.quantile(x, lo), jnp.quantile(x, hi))
    x = x - x.min()
    return x / jnp.maximum(x.max(), 1e-12)


def time_gram(A: jax.Array) -> jax.Array:
    """(m, t, p) -> per-clip centered time-Gram (m, t, t)
    (preliminary.py:135-139 ``covariance``: grand-mean centering)."""
    A = A - A.mean(axis=(1, 2), keepdims=True)
    return jnp.einsum("mtp,msp->mts", A, A, precision=jax.lax.Precision.HIGHEST)


def trace_correlation_distance(A: jax.Array, B: jax.Array) -> jax.Array:
    """1 - <A, B> / (||A|| ||B||), batched over leading dim
    (preliminary.py:172-173 ``distance_correlation``)."""
    inner = jnp.einsum("mij,mij->m", A, B)
    return 1.0 - inner / (jnp.linalg.norm(A, axis=(1, 2)) * jnp.linalg.norm(B, axis=(1, 2)) + 1e-12)


def _sqrtm_psd_batched(A: jax.Array) -> jax.Array:
    w, v = jnp.linalg.eigh(A)
    return jnp.einsum("mik,mk,mjk->mij", v, jnp.sqrt(jnp.maximum(w, 0.0)), v)


def bures_distance_batched(A: jax.Array, B: jax.Array) -> jax.Array:
    """2-Wasserstein (Bures) distance between PSD matrices, batched
    (preliminary.py:176-179 ``distance_wasserstein``)."""
    B12 = _sqrtm_psd_batched(B)
    C = _sqrtm_psd_batched(jnp.einsum("mij,mjk,mkl->mil", B12, A, B12))
    tr = jnp.trace(A + B - 2 * C, axis1=1, axis2=2)
    return jnp.sqrt(jnp.maximum(tr, 0.0))


def kullback_distance(A: jax.Array, B: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Gaussian KL(N(0,A) || N(0,B)) between PSD matrices, batched
    (preliminary.py:186-191 ``distance_kullback``, with the eigh-based
    pinv/logdet the torch version left ill-conditioned)."""
    d = A.shape[-1]
    wa, _ = jnp.linalg.eigh(A)
    wb, vb = jnp.linalg.eigh(B)
    wa, wb = jnp.maximum(wa, eps), jnp.maximum(wb, eps)
    Binv = jnp.einsum("mik,mk,mjk->mij", vb, 1.0 / wb, vb)
    logdet = jnp.sum(jnp.log(wb), -1) - jnp.sum(jnp.log(wa), -1)
    return 0.5 * (jnp.einsum("mij,mji->m", Binv, A) - d + logdet)


def condition_distance(A: jax.Array, B: jax.Array, eps: float = 1e-6) -> jax.Array:
    """log condition number of A^{-1/2} B A^{-1/2}: the spread of the
    generalised eigenvalue spectrum (preliminary.py:194-203
    ``distance_condition`` — fixed via eigvalsh on the symmetrised star
    matrix, the TODO the reference left open)."""
    wa, va = jnp.linalg.eigh(A)
    invroot = jnp.einsum("mik,mk,mjk->mij", va, 1.0 / jnp.sqrt(jnp.maximum(wa, eps)), va)
    star = jnp.einsum("mij,mjk,mkl->mil", invroot, B, invroot)
    w = jnp.maximum(jnp.linalg.eigvalsh(star), eps)
    return jnp.log(w[:, -1]) - jnp.log(w[:, 0])


def pca_svd(X: jax.Array, k: int) -> jax.Array:
    """(m, t, p) -> (m, t, k): shared principal axes over all clips/frames
    (preliminary.py:147-155, row-centered SVD semantics)."""
    m, t, p = X.shape
    flat = X.reshape(m * t, p)
    flat = flat - flat.mean(axis=1, keepdims=True)
    _, _, vt = jnp.linalg.svd(flat, full_matrices=False)
    return (X.reshape(m * t, p) @ vt[:k].T).reshape(m, t, k)


def pca_eig(X: jax.Array, k: int, scale: bool = False) -> jax.Array:
    """Eigendecomposition flavour of :func:`pca_svd`
    (preliminary.py:158-169; note torch eigh sorts ascending, so the
    reference's ``[:, :k]`` keeps the SMALLEST-variance axes — kept)."""
    m, t, p = X.shape
    flat = X.reshape(m * t, p)
    c = flat - flat.mean(axis=1, keepdims=True)
    cov = c.T @ c / (m * t - 1)
    if scale:
        cov = jnp.diag(jax.lax.rsqrt(jnp.diagonal(cov) + 1e-12)) @ cov
    _, vecs = jnp.linalg.eigh(cov)
    return (flat @ vecs[:, :k]).reshape(m, t, k)


# ---------------------------------------------------------------- driver --
def _as3d(x) -> jnp.ndarray:
    x = jnp.asarray(x, jnp.float32)
    return x[..., None] if x.ndim == 2 else x


def compare_av_feats(vid_feats: dict, aud_feats: dict, key: jax.Array,
                     misaligned: bool = False) -> dict:
    """Sum of pairwise correspondence scores between every (video feature,
    audio feature) column pair (preliminary.py:413-433).

    Each value is stacked per-clip features (m, t, p) (or (m, t)).  With
    ``misaligned`` the video clips are permuted per pair — the permutation
    null the study compares against.  Returns
    {"sgw", "pca_corr", "pca_wass"} summed over pairs.  Note sgw compares
    the two clip point-clouds, so it is invariant to the pairing
    permutation (as in the reference); the Gram-based scores carry the
    aligned-vs-misaligned signal.
    """
    sgws, corrs, wasss = [], [], []
    for vf in vid_feats.values():
        for af in aud_feats.values():
            vf3, af3 = _as3d(vf), _as3d(af)
            key, pk, sk = jax.random.split(key, 3)
            if misaligned:
                vf3 = vf3[jax.random.permutation(pk, vf3.shape[0])]
            vg, ag = time_gram(vf3), time_gram(af3)
            sgws.append(sgw(vf3.reshape(vf3.shape[0], -1), af3.reshape(af3.shape[0], -1), key=sk))
            corrs.append(trace_correlation_distance(vg, ag).mean())
            wasss.append(bures_distance_batched(vg, ag).mean())
    return {"sgw": float(sum(sgws)), "pca_corr": float(sum(corrs)), "pca_wass": float(sum(wasss))}


def preliminary_study(groups: dict, vid_cols, aud_cols, n_samples: int = 100,
                      onset_cols=("video_onsets", "audio_onsets"),
                      tempogram_cols=(("video_tempogram", "audio_tempogram"),
                                      ("video_fourier_tempogram", "audio_fourier_tempogram")),
                      seed: int = 0, out_dir: str | None = None):
    """Aligned-vs-misaligned correspondence table per corpus group
    (preliminary.py:503-636 driver cells).

    ``groups`` maps group name -> {column -> stacked array (m, t, ...)}.
    For every group and both pairings this scores: deep-feature pairs
    (``vid_cols`` x ``aud_cols``), chroma/onsets cross pairs when present,
    DTW stats between onset envelopes, and tempogram mutual information.
    Returns (aligned_rows, misaligned_rows); writes ``aligned.csv`` /
    ``misaligned.csv`` under ``out_dir`` like the reference (:580-582).
    """
    key = jax.random.PRNGKey(seed)
    aligned_rows, misaligned_rows = [], []
    for group, cols in groups.items():
        m = len(next(iter(cols.values())))
        key, gk = jax.random.split(key)
        take = np.asarray(jax.random.permutation(gk, m))[:n_samples]
        cols = {c: jnp.asarray(np.asarray(v)[take]) for c, v in cols.items()}
        for mis, rows in ((False, aligned_rows), (True, misaligned_rows)):
            key, k1, k2, k3, k4, dk, tk = jax.random.split(key, 7)
            row = {"group": group}
            vid = {c: cols[c] for c in vid_cols if c in cols}
            aud = {c: cols[c] for c in aud_cols if c in cols}
            for prefix, v, a, kk in (
                ("acav", vid, aud, k1),
                ("chroma", vid, {c: cols[c] for c in ("audio_chroma",) if c in cols}, k2),
                ("aud_ons", vid, {c: cols[c] for c in ("audio_onsets",) if c in cols}, k3),
                ("vid_ons", {c: cols[c] for c in ("video_onsets",) if c in cols}, aud, k4),
            ):
                if not v or not a:
                    continue
                scores = compare_av_feats(v, a, kk, misaligned=mis)
                row.update({f"{prefix}_{s}": val for s, val in scores.items()})
            von, aon = onset_cols
            if von in cols and aon in cols:
                vo = np.asarray(cols[von])
                if mis:
                    vo = vo[np.asarray(jax.random.permutation(dk, len(vo)))]
                d = [dtw_distance(v, a) for v, a in zip(vo, np.asarray(cols[aon]))]
                row.update({"dtw_min": float(np.min(d)), "dtw_med": float(np.median(d)),
                            "dtw_mean": float(np.mean(d)), "dtw_max": float(np.max(d))})
            avmi = 0.0
            for vt_c, at_c in tempogram_cols:
                if vt_c in cols and at_c in cols:
                    vt = cols[vt_c]
                    if mis:
                        tk, pk = jax.random.split(tk)
                        vt = vt[jax.random.permutation(pk, vt.shape[0])]
                    avmi += float(sum(mutual_information(v.ravel(), a.ravel())
                                      for v, a in zip(vt, cols[at_c])))
            row["avmi"] = avmi
            rows.append(row)
    if out_dir is not None:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        for name, rows in (("aligned", aligned_rows), ("misaligned", misaligned_rows)):
            if rows:
                with open(out / f"{name}.csv", "w", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=sorted({k for r in rows for k in r}))
                    w.writeheader()
                    w.writerows(rows)
    return aligned_rows, misaligned_rows


# ------------------------------------------------- time-series featurizers --
def gramian_angular_field(X: jax.Array, method: str = "summation") -> jax.Array:
    """Gramian angular field per channel (preliminary.py:617-630 via
    pyts.image.GramianAngularField): each series is min-max scaled to
    [-1, 1], phi = arccos(x), and GASF[i,j] = cos(phi_i + phi_j)
    (difference: sin(phi_i - phi_j)) — closed form, no trig needed.

    (m, t, p) or (t, p) -> (..., p, t, t).
    """
    X = jnp.asarray(X, jnp.float32)
    squeeze = X.ndim == 2
    if squeeze:
        X = X[None]
    x = jnp.swapaxes(X, 1, 2)  # (m, p, t)
    mn = x.min(-1, keepdims=True)
    mx = x.max(-1, keepdims=True)
    x = jnp.where(mx > mn, 2 * (x - mn) / (mx - mn) - 1, jnp.zeros_like(x))
    comp = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))  # sin(arccos x)
    if method == "summation":  # cos(a+b) = cos a cos b - sin a sin b
        G = jnp.einsum("mpi,mpj->mpij", x, x) - jnp.einsum("mpi,mpj->mpij", comp, comp)
    else:  # sin(a-b) = sin a cos b - cos a sin b
        G = jnp.einsum("mpi,mpj->mpij", comp, x) - jnp.einsum("mpi,mpj->mpij", x, comp)
    return G[0] if squeeze else G


def joint_recurrence_plot(X: jax.Array, percentage: float = 50.0) -> jax.Array:
    """Joint recurrence plot (preliminary.py:618-631 via
    pyts.image.JointRecurrencePlot(threshold="point", percentage=50)):
    per channel, the pairwise-distance matrix is binarised at its
    ``percentage``-th percentile; the JRP is the elementwise AND (product)
    across channels.  (m, t, p) or (t, p) -> (..., t, t).
    """
    X = jnp.asarray(X, jnp.float32)
    squeeze = X.ndim == 2
    if squeeze:
        X = X[None]
    x = jnp.swapaxes(X, 1, 2)  # (m, p, t)
    d2 = (x[..., :, None] - x[..., None, :]) ** 2  # (m, p, t, t)
    d = jnp.sqrt(d2)
    thr = jnp.percentile(d.reshape(*d.shape[:2], -1), percentage, axis=-1)
    R = (d <= thr[..., None, None]).astype(jnp.float32)
    J = jnp.prod(R, axis=1)
    return J[0] if squeeze else J


_MR_KLEN = 9
_MR_INDICES = np.array(list(combinations(range(_MR_KLEN), 3)), np.int64)  # 84 kernels


def _mr_kernels() -> np.ndarray:
    W = -np.ones((len(_MR_INDICES), _MR_KLEN), np.float32)
    for i, idx in enumerate(_MR_INDICES):
        W[i, idx] = 2.0  # weights {-1, 2}, three 2s -> zero-sum kernels
    return W


def _mr_dilations(t: int, n_dilations: int = 8) -> np.ndarray:
    max_exp = np.log2(max((t - 1) / (_MR_KLEN - 1), 1.0))
    d = np.unique(np.floor(2 ** np.linspace(0, max_exp, n_dilations)).astype(np.int64))
    return np.maximum(d, 1)


def minirocket_fit(X, quantiles_per_kernel: int = 4, seed: int = 0) -> dict:
    """Fit MiniRocket pooling biases on sample data (preliminary.py:640-644
    via tsai MiniRocketFeatures; Dempster et al. 2021).

    The transform is deterministic by construction — 84 fixed zero-sum
    kernels of length 9 (all C(9,3) placements of weight 2 over -1s) at a
    fixed dilation ladder; the only data-dependent state is the bias each
    (kernel, dilation) pools against, drawn as quantiles of its convolution
    output on ``X`` (m, t, p).  Multivariate inputs are mixed channels-first
    by a fixed random channel projection per kernel like tsai.
    """
    X = jnp.asarray(X, jnp.float32)
    m, t, p = X.shape
    dilations = _mr_dilations(t)
    rng = np.random.RandomState(seed)
    mix = rng.randn(len(_MR_INDICES), p).astype(np.float32) / np.sqrt(p) if p > 1 \
        else np.ones((len(_MR_INDICES), 1), np.float32)
    qs = np.linspace(0.1, 0.9, quantiles_per_kernel).astype(np.float32)
    conv = _mr_conv(X, jnp.asarray(mix), dilations)  # (m, D, 84, t)
    biases = jnp.quantile(conv.transpose(1, 2, 0, 3).reshape(len(dilations), len(_MR_INDICES), -1),
                          jnp.asarray(qs), axis=-1)  # (Q, D, 84)
    return {"dilations": dilations, "mix": mix, "biases": np.asarray(biases)}


def _mr_conv(X: jax.Array, mix: jax.Array, dilations) -> jax.Array:
    """(m, t, p) -> (m, n_dilations, 84, t): all 84 kernels at every
    dilation as one grouped dilated conv per dilation — a (84, 1, 9)
    weight tensor on the channel-mixed series, so the whole bank is a
    single MXU-friendly conv instead of tsai's per-kernel loops."""
    W = jnp.asarray(_mr_kernels())[:, None, :]  # (84, 1, 9)
    mixed = jnp.einsum("mtp,kp->mkt", X, mix)  # (m, 84, t)
    outs = []
    for d in dilations:
        pad = (_MR_KLEN // 2) * int(d)
        outs.append(jax.lax.conv_general_dilated(
            mixed, W, window_strides=(1,), padding=[(pad, pad)],
            rhs_dilation=(int(d),), feature_group_count=W.shape[0],
            dimension_numbers=("NCH", "OIH", "NCH")))
    return jnp.stack(outs, 1)  # (m, D, 84, t)


def minirocket_transform(X, params: dict) -> jax.Array:
    """(m, t, p) -> (m, n_features) PPV features: the fraction of positions
    where each (kernel, dilation) conv exceeds each fitted bias."""
    X = jnp.asarray(X, jnp.float32)
    conv = _mr_conv(X, jnp.asarray(params["mix"]), params["dilations"])  # (m, D, 84, t)
    biases = jnp.asarray(params["biases"])  # (Q, D, 84)
    ppv = (conv[:, None] > biases[None, :, :, :, None]).mean(-1)  # (m, Q, D, 84)
    return ppv.reshape(X.shape[0], -1)
