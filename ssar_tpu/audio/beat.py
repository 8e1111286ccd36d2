"""Onset strength, Fourier tempogram, and predominant local pulse (PLP).

Equivalent of ssar/features/rosa/beat.py.  Everything is static-shape jnp;
the tempogram is an STFT of the onset envelope with hop 1 (a batched rFFT).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .convert import power_to_db
from .spectral import istft, melspectrogram, stft


@partial(jax.jit, static_argnames=("sr", "hop_length", "n_fft", "aggregate"))
def onset_strength(y: jax.Array, sr: int, hop_length: int = 1024, n_fft: int = 2048,
                   aggregate: str = "mean") -> jax.Array:
    """Spectral-flux onset envelope, shape (T,) (beat.py:10-23).

    Positive temporal difference of the dB mel spectrogram, aggregated over
    mel bands, right-shifted by 1 + n_fft // (2*hop) frames to counteract
    STFT framing lag.
    """
    S = jnp.abs(melspectrogram(y, sr, n_fft=n_fft, hop_length=hop_length, fmax=11025.0))
    S = power_to_db(S)

    diff = jnp.maximum(0.0, S[:, 1:] - S[:, :-1])
    if aggregate == "mean":
        env = jnp.mean(diff, axis=0)
    elif aggregate == "median":
        env = jnp.median(diff, axis=0)
    else:
        raise ValueError(aggregate)

    pad_width = 1 + n_fft // (2 * hop_length)
    env = jnp.pad(env, (pad_width, 0))[: S.shape[1]]
    return env


@partial(jax.jit, static_argnames=("sr", "hop_length", "n_fft"))
def mel_power_multi(signals: jax.Array, sr: int, hop_length: int = 1024,
                    n_fft: int = 2048) -> jax.Array:
    """Batched mel POWER spectrograms (pre-dB): (N, L) -> (N, n_mels, T).

    One batched framing + rFFT + mel matmul for all band-filtered signals —
    the TPU-shaped front half of onset_strength.  Kept separate so the
    sequence-parallel path can assemble whole-track mel specs before the
    global power_to_db reference (features_sp two-pass design)."""
    from .spectral import hann_window, mel_basis

    N, L = signals.shape
    pad = n_fft // 2
    x = jnp.pad(signals, ((0, 0), (pad, pad)), mode="reflect")
    from .spectral import frame_signal_batched

    frames = frame_signal_batched(x, n_fft, hop_length) * jnp.asarray(hann_window(n_fft))
    S = jnp.abs(jnp.fft.rfft(frames, axis=2)) ** 2  # (N, T+1, F)
    S = S[:, :-1]  # drop trailing frame (spectral.py:59-62 semantics)
    basis = jnp.asarray(mel_basis(sr, n_fft, fmax=11025.0))
    return jnp.einsum("mf,ntf->nmt", basis, S, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("hop_length", "n_fft", "aggregate"))
def onset_env_from_melpower(M: jax.Array, hop_length: int = 1024, n_fft: int = 2048,
                            aggregate: str = "mean") -> jax.Array:
    """(N, n_mels, T) mel power -> (N, T) onset envelopes (beat.py:10-23 back
    half: per-signal power_to_db, positive flux, band aggregate, lag shift)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(1e-10, M))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(1, 2), keepdims=True) - 80.0)

    diff = jnp.maximum(0.0, log_spec[:, :, 1:] - log_spec[:, :, :-1])
    if aggregate == "mean":
        env = jnp.mean(diff, axis=1)
    else:
        env = jnp.median(diff, axis=1)
    pad_width = 1 + n_fft // (2 * hop_length)
    env = jnp.pad(env, ((0, 0), (pad_width, 0)))[:, : log_spec.shape[2]]
    return env


@partial(jax.jit, static_argnames=("sr", "hop_length", "n_fft", "aggregate"))
def onset_strength_multi(signals: jax.Array, sr: int, hop_length: int = 1024, n_fft: int = 2048,
                         aggregate: str = "mean") -> jax.Array:
    """Batched onset strength: (N, L) -> (N, T); numerics identical per
    signal to four sequential onset_strength calls
    (ssar/supervised/data.py:76-79)."""
    M = mel_power_multi(signals, sr, hop_length=hop_length, n_fft=n_fft)
    return onset_env_from_melpower(M, hop_length=hop_length, n_fft=n_fft, aggregate=aggregate)


def fourier_tempo_frequencies(sr: int, win_length: int = 1024, hop_length: int = 1024) -> jax.Array:
    rate = sr * 60 / float(hop_length)
    return jnp.linspace(0, float(rate) / 2, int(1 + win_length // 2))


def fourier_tempogram(onset_envelope: jax.Array, sr: int = 22050, hop_length: int = 1024,
                      win_length: int = 1024) -> jax.Array:
    """STFT of the onset envelope at hop 1 (beat.py:33-38). (1+win//2, T+1) complex."""
    return stft(onset_envelope, n_fft=win_length, hop_length=1, center=True, window="hann")


@partial(jax.jit, static_argnames=("sr", "hop_length", "win_length", "tempo_min", "tempo_max"))
def plp(y: jax.Array, sr: int, hop_length: int = 1024, win_length: int = 1024,
        tempo_min: float | None = 60, tempo_max: float | None = 180) -> jax.Array:
    """Predominant local pulse, normalised to [0, 1], shape (T,) (beat.py:41-75)."""
    onset_env = onset_strength(y, sr, hop_length=hop_length, aggregate="median")
    return plp_from_onset_env(onset_env, sr, hop_length=hop_length, win_length=win_length,
                              tempo_min=tempo_min, tempo_max=tempo_max)


@partial(jax.jit, static_argnames=("sr", "hop_length", "win_length", "tempo_min", "tempo_max"))
def plp_from_onset_env(onset_env: jax.Array, sr: int, hop_length: int = 1024,
                       win_length: int = 1024, tempo_min: float | None = 60,
                       tempo_max: float | None = 180) -> jax.Array:
    """PLP back half (beat.py:47-75), exposed so the sequence-parallel path
    can run it on the *assembled whole-track* envelope (the tempogram's
    1024-frame window far exceeds any practical SP halo)."""
    max_win = min(onset_env.shape[0], win_length)
    ftgram = fourier_tempogram(onset_env, sr=sr, hop_length=hop_length, win_length=max_win)
    tempo_frequencies = fourier_tempo_frequencies(sr=sr, hop_length=hop_length, win_length=max_win)

    if tempo_min is not None:
        ftgram = jnp.where((tempo_frequencies < tempo_min)[:, None], 0.0, ftgram)
    if tempo_max is not None:
        ftgram = jnp.where((tempo_frequencies > tempo_max)[:, None], 0.0, ftgram)

    ftmag = jnp.log1p(1e6 * jnp.abs(ftgram))
    peak_values = jnp.max(ftmag, axis=0, keepdims=True)
    ftgram = jnp.where(ftmag < peak_values, 0.0, ftgram)

    absmaxabs = jnp.max(jnp.abs(ftgram), axis=0, keepdims=True)
    ftgram = ftgram / (np.finfo(np.float32).tiny ** 0.5 + absmaxabs)

    pulse = istft(ftgram, n_fft=max_win, hop_length=1, length=onset_env.shape[0])
    pulse = jnp.clip(pulse, 0.0, jnp.max(pulse))

    pulse = pulse - jnp.min(pulse)
    return pulse / (jnp.max(pulse) + 1e-8)
