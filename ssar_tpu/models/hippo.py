"""HiPPO (High-order Polynomial Projection Operators) timeseries parameterization.

Equivalent of ssar/models/hippo/{transition,hippo,unroll}.py + the
HiPPOTimeseries module used by test-time optimization
(ssar/optimize.py:81-100): a whole envelope timeseries is represented by N
Legendre coefficients; decoding is a single (L, N) x (N, C) matmul, so the
optimizer tunes a compact spectral parameterization instead of raw frames.

TPU design: transition matrices are built host-side in numpy (static), the
LegS time-varying encode runs as one ``lax.scan`` over frames (done once at
init), and decode is a dense MXU matmul inside the optimization step.
Standard HiPPO formulas (Gu et al. 2020).
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
    A, B = transition("legs", N)
    B = B.squeeze(-1)
    eye = np.eye(N)
    A_stacked = np.empty((max_length, N, N), dtype=np.float64)
    B_stacked = np.empty((max_length, N), dtype=np.float64)
    for t in range(1, max_length + 1):
        At = A / t
        Bt = B / t
        A_stacked[t - 1] = np.linalg.solve(eye - At / 2, eye + At / 2)
        B_stacked[t - 1] = np.linalg.solve(eye - At / 2, Bt)
    E = (B[:, None] * ss.eval_legendre(np.arange(N)[:, None], 2 * np.linspace(0.0, 1.0, max_length) - 1)).T
    return A_stacked.astype(np.float32), B_stacked.astype(np.float32), E.astype(np.float32)


def encode_leg_s(f: jax.Array, A_stacked, B_stacked) -> jax.Array:
    """f (T, C) -> final coefficients (C, N) via lax.scan over the
    time-varying recurrence c_t = A_t c_{t-1} + B_t f_t."""
    A = jnp.asarray(A_stacked[: f.shape[0]])
    B = jnp.asarray(B_stacked[: f.shape[0]])

    def step(c, inp):
        At, Bt, ft = inp
        c = jnp.einsum("nk,ck->cn", At, c) + ft[:, None] * Bt[None, :]
        return c, None

    c0 = jnp.zeros((f.shape[1], A.shape[-1]), f.dtype)
    c, _ = jax.lax.scan(step, c0, (A, B, f))
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
        enc = encode_leg_s if self.invariance == "s" else encode_leg_t
        return {"c": enc(fp, self.A, self.B)}

    def decode(self, params: dict) -> jax.Array:
        out = jnp.matmul(self.E_j, params["c"].T, precision=jax.lax.Precision.HIGHEST)
        return out[self.padding : -self.padding]
