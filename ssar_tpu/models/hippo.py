"""HiPPO (High-order Polynomial Projection Operators) timeseries parameterization.

Equivalent of ssar/models/hippo/{transition,hippo,unroll}.py + the
HiPPOTimeseries module used by test-time optimization
(ssar/optimize.py:81-100): a whole envelope timeseries is represented by N
Legendre coefficients; decoding is a single (L, N) x (N, C) matmul, so the
optimizer tunes a compact spectral parameterization instead of raw frames.

TPU design: transition matrices are built host-side in numpy (static), the
LegS time-varying encode runs as one ``lax.scan`` over frames (done once at
init) — or, for long tracks, as a blocked parallel unroll whose inner loops
are vmapped dense matmuls (``encode_leg_s_parallel``, the MXU counterpart of
the reference's parallel ``variable_unroll``) — and decode is a dense MXU
matmul inside the optimization step. Standard HiPPO formulas (Gu et al. 2020).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as ssignal
from scipy import special as ss


def transition(measure: str, N: int):
    """Continuous-time HiPPO transition (A, B) — 'lmu' (LegT) or 'legs'."""
    if measure == "lmu":
        Q = np.arange(N, dtype=np.float64)
        R = (2 * Q + 1)[:, None]
        j, i = np.meshgrid(Q, Q)
        A = np.where(i < j, -1.0, (-1.0) ** (i - j + 1)) * R
        B = ((-1.0) ** Q[:, None]) * R
    elif measure == "legs":
        q = np.arange(N, dtype=np.float64)
        col, row = np.meshgrid(q, q)
        r = 2 * q + 1
        M = -(np.where(row >= col, r, 0) - np.diag(q))
        T = np.sqrt(np.diag(2 * q + 1))
        A = T @ M @ np.linalg.inv(T)
        B = np.diag(T)[:, None]
    else:
        raise ValueError(measure)
    return A, B


@lru_cache(maxsize=8)
def init_leg_t(N: int, dt: float = 1.0):
    """Time-invariant LegT (LMU) discretisation + Legendre eval matrix."""
    A, B = transition("lmu", N)
    C = np.ones((1, N))
    D = np.zeros((1,))
    Ad, Bd, *_ = ssignal.cont2discrete((A, B, C, D), dt=dt, method="bilinear")
    vals = np.arange(0.0, 1.0, dt)
    E = ss.eval_legendre(np.arange(N)[:, None], 1 - 2 * vals).T
    return Ad.astype(np.float32), Bd.squeeze(-1).astype(np.float32), E.astype(np.float32)


@lru_cache(maxsize=8)
def init_leg_s(N: int, max_length: int = 1024):
    """Scale-invariant LegS: per-step bilinear discretisation A_t, B_t
    (t = 1..L) + reconstruction matrix E (L, N)."""
    # The LegS transition A = T M T^{-1} with T = sqrt(diag(2q+1)) and M lower
    # triangular, so the per-step bilinear discretisation
    #   A_t = (I - A/2t)^{-1} (I + A/2t) = T (2tI - M)^{-1} (2tI + M) T^{-1}
    #   B_t = (I - A/2t)^{-1} B/t     = T (2tI - M)^{-1} 2·1     (T^{-1}B = 1)
    # needs only *triangular* solves. Build all steps as one vmapped batched
    # triangular solve on the accelerator — the host loop of dense LU solves
    # this replaces was the dominant cost of HiPPO init at N=512, T≈8k
    # (minutes on one CPU core vs well under a second here).
    q = np.arange(N, dtype=np.float64)
    r = 2 * q + 1
    col, row = np.meshgrid(q, q)
    M = -(np.where(row >= col, r, 0) - np.diag(q))  # lower triangular
    Td = np.sqrt(r)
    Mj = jnp.asarray(M, jnp.float32)
    Tj = jnp.asarray(Td, jnp.float32)
    coef = jnp.asarray(r, jnp.float32)  # strict-lower row of L is constant: (2j+1)
    eye_j = jnp.eye(N, dtype=jnp.float32)
    ts = jnp.arange(1, max_length + 1, dtype=jnp.float32)

    def one_step(t):
        # Forward substitution for L X = R with L = 2tI - M: L[i, j>i-strict]
        # = 2j+1 is row-independent, so the running inner product is a single
        # rank-1 carry update per row — a cheap lax.scan, vs XLA's
        # TriangularSolve whose TPU compile alone takes ~1 min at this size.
        R = jnp.concatenate([2 * t * eye_j + Mj, jnp.full((N, 1), 2.0, jnp.float32)], 1)
        diag = 2 * t + jnp.arange(N, dtype=jnp.float32) + 1.0

        def row(S, inp):
            b_i, c_i, d_i = inp
            x_i = (b_i - S) / d_i
            return S + c_i * x_i, x_i

        _, X = jax.lax.scan(row, jnp.zeros(N + 1, jnp.float32), (R, coef, diag))
        At = Tj[:, None] * X[:, :N] / Tj[None, :]
        Bt = Tj * X[:, N]
        return At, Bt

    # lax.map in modest batches bounds peak memory at large (T, N, N)
    bs = min(256, max_length)
    pad = (-max_length) % bs
    if pad:
        ts = jnp.concatenate([ts, jnp.ones((pad,), jnp.float32)])
    A_stacked, B_stacked = jax.lax.map(jax.vmap(one_step), ts.reshape(-1, bs))
    A_stacked = np.asarray(A_stacked.reshape(-1, N, N)[:max_length])
    B_stacked = np.asarray(B_stacked.reshape(-1, N)[:max_length])
    E = (Td[:, None] * ss.eval_legendre(np.arange(N)[:, None], 2 * np.linspace(0.0, 1.0, max_length) - 1)).T  # B = Td
    return A_stacked.astype(np.float32), B_stacked.astype(np.float32), E.astype(np.float32)


def encode_leg_s(f: jax.Array, A_stacked, B_stacked) -> jax.Array:
    """f (T, C) -> final coefficients (C, N) via lax.scan over the
    time-varying recurrence c_t = A_t c_{t-1} + B_t f_t."""
    A = jnp.asarray(A_stacked[: f.shape[0]])
    B = jnp.asarray(B_stacked[: f.shape[0]])

    def step(c, inp):
        At, Bt, ft = inp
        # HIGHEST precision matters: the 4096-step recurrence at N=128
        # accumulates bf16-matmul error to O(1) relative on TPU.
        c = jnp.einsum("nk,ck->cn", At, c, precision=jax.lax.Precision.HIGHEST) + ft[:, None] * Bt[None, :]
        return c, None

    c0 = jnp.zeros((f.shape[1], A.shape[-1]), f.dtype)
    c, _ = jax.lax.scan(step, c0, (A, B, f))
    return c


def encode_leg_s_parallel(f: jax.Array, A_stacked, B_stacked, block: int = 64) -> jax.Array:
    """Final LegS coefficients (C, N) via a blocked parallel unroll.

    Counterpart of the reference's parallel ``variable_unroll``
    (ssar/models/hippo/unroll.py:236-453), restructured for the MXU instead
    of translating the recursive halving: the T time-varying steps are split
    into ceil(T/block) chunks; every chunk's transition product
    ``P_k = A_kM ... A_k1`` and local contribution ``s_k`` are computed by one
    *vmapped* scan (all chunks run in parallel, each step a dense (N, N)
    matmul that tiles onto the MXU), then the chunk summaries combine with a
    short sequential scan of cheap mat-vecs. Wall depth drops from T matvecs
    to block matmuls + T/block matvecs; work is O(T N^3) like the reference's
    doubling scheme. Exact (no approximation) — parity-tested against
    ``encode_leg_s``.
    """
    T, C = f.shape
    N = A_stacked.shape[-1]
    A = jnp.asarray(A_stacked[:T])
    b = jnp.asarray(B_stacked[:T])[:, None, :] * f[:, :, None]  # (T, C, N)

    K = -(-T // block)
    pad = K * block - T
    if pad:  # identity transitions + zero inputs leave the final state unchanged
        A = jnp.concatenate([A, jnp.broadcast_to(jnp.eye(N, dtype=A.dtype), (pad, N, N))])
        b = jnp.concatenate([b, jnp.zeros((pad, C, N), b.dtype)])
    A = A.reshape(K, block, N, N)
    b = b.reshape(K, block, C, N)

    def chunk_summary(A_c, b_c):
        def step(carry, inp):
            P, s = carry
            At, bt = inp
            P = jnp.matmul(At, P, precision=jax.lax.Precision.HIGHEST)
            s = jnp.einsum("nk,ck->cn", At, s, precision=jax.lax.Precision.HIGHEST) + bt
            return (P, s), None

        (P, s), _ = jax.lax.scan(step, (jnp.eye(N, dtype=A_c.dtype),
                                        jnp.zeros((C, N), b_c.dtype)), (A_c, b_c))
        return P, s

    P_k, s_k = jax.vmap(chunk_summary)(A, b)  # (K, N, N), (K, C, N)

    def combine(c, inp):
        P, s = inp
        return jnp.einsum("nk,ck->cn", P, c, precision=jax.lax.Precision.HIGHEST) + s, None

    c, _ = jax.lax.scan(combine, jnp.zeros((C, N), f.dtype), (P_k, s_k))
    return c


def encode_leg_t(f: jax.Array, Ad, Bd) -> jax.Array:
    A = jnp.asarray(Ad)
    B = jnp.asarray(Bd)

    def step(c, ft):
        c = jnp.einsum("nk,ck->cn", A, c) + ft[:, None] * B[None, :]
        return c, None

    c0 = jnp.zeros((f.shape[1], A.shape[-1]), f.dtype)
    c, _ = jax.lax.scan(step, c0, f)
    return c


class HiPPOTimeseries:
    """Envelope timeseries parameterized by HiPPO coefficients
    (ssar/optimize.py:81-100).

    init_params(f (T, C)) -> {"c": (C, N)}; decode(params) -> (T, C).
    Edge padding mirrors the reference's pad-then-trim.
    """

    def __init__(self, T: int, n_envelopes: int, N: int = 512, invariance: str = "s",
                 padding: int = 128):
        self.padding = padding
        self.T_pad = T + 2 * padding
        self.n_envelopes = n_envelopes
        self.invariance = invariance
        if invariance == "s":
            self.A, self.B, self.E = init_leg_s(N, max_length=self.T_pad)
        else:
            self.A, self.B, self.E = init_leg_t(N, dt=1.0 / self.T_pad)
        self.E_j = jnp.asarray(self.E)

    def init_params(self, f: jax.Array) -> dict:
        fp = jnp.pad(f, ((self.padding, self.padding), (0, 0)))
        if self.invariance != "s":
            return {"c": encode_leg_t(fp, self.A, self.B)}
        # Long tracks at small N: blocked parallel unroll instead of T
        # sequential matvecs. Measured on the real chip (T=4096): parallel
        # ties the scan at N=64 (1.55s vs 1.63s) and loses 3.6x at N=128 —
        # its O(T N^3) chunk products overtake the scan's latency win as N
        # grows, so the scan stays the default at the record N=512.
        use_par = fp.shape[0] > 2048 and self.A.shape[-1] <= 64
        enc = encode_leg_s_parallel if use_par else encode_leg_s
        return {"c": enc(fp, self.A, self.B)}

    def decode(self, params: dict) -> jax.Array:
        out = jnp.matmul(self.E_j, params["c"].T, precision=jax.lax.Precision.HIGHEST)
        return out[self.padding : -self.padding]
