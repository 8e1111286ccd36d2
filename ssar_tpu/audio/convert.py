"""Unit conversions (Hz/mel/octave/midi/chroma maps).

Equivalent of ssar/features/rosa/convert.py (itself a librosa port).  All of
these are trace-time-static or cheap elementwise math; the chroma fold matrix
is built once on the host in numpy and baked into the program as a constant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# note_to_hz("C1") — the only note the reference ever looks up
# (ssar/features/rosa/convert.py:129-130); A440 equal temperament.
C1_HZ = 440.0 * 2.0 ** ((24 - 69) / 12.0)  # 32.70319566257483


def note_to_hz(note: str) -> float:
    assert note == "C1", "only C1 is used anywhere in the pipeline"
    return C1_HZ


def power_to_db(magnitude: jax.Array, ref_value: float = 1.0, amin: float = 1e-10, top_db: float | None = 80.0):
    """10*log10 with floor and top_db clamp relative to the global max
    (ssar/features/rosa/convert.py:7-12)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, magnitude))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref_value))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def hz_to_mel(frequencies, htk: bool = False):
    """Slaney (default) or HTK mel scale; works on scalars and arrays."""
    frequencies = jnp.asarray(frequencies, dtype=jnp.float32)
    if htk:
        return 2595.0 * jnp.log10(1.0 + frequencies / 700.0)
    f_sp = 200.0 / 3
    mels = frequencies / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_mels = min_log_mel + jnp.log(jnp.maximum(frequencies, 1e-10) / min_log_hz) / logstep
    return jnp.where(frequencies >= min_log_hz, log_mels, mels)


def mel_to_hz(mels, htk: bool = False):
    mels = jnp.asarray(mels, dtype=jnp.float32)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_freqs = min_log_hz * jnp.exp(logstep * (mels - min_log_mel))
    return jnp.where(mels >= min_log_mel, log_freqs, freqs)


def hz_to_mel_np(frequencies, htk: bool = False) -> np.ndarray:
    """Pure-numpy Slaney/HTK mel scale for host-side filterbank construction."""
    frequencies = np.asarray(frequencies, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + frequencies / 700.0)
    f_sp = 200.0 / 3
    mels = frequencies / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(frequencies >= min_log_hz,
                    min_log_mel + np.log(np.maximum(frequencies, 1e-10) / min_log_hz) / logstep, mels)


def mel_to_hz_np(mels, htk: bool = False) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), f_sp * mels)


def hz_to_octs(frequencies, tuning: float = 0.0, bins_per_octave: int = 12):
    A440 = 440.0 * 2.0 ** (tuning / bins_per_octave)
    return jnp.log2(frequencies / (A440 / 16))


def hz_to_midi(frequencies):
    return 12 * (np.log2(frequencies) - np.log2(440.0)) + 69


def cq_to_chroma_matrix(n_input: int, bins_per_octave: int = 12, n_chroma: int = 12,
                        fmin: float | None = None, base_c: bool = True) -> np.ndarray:
    """Static (n_chroma, n_input) CQT-bin -> chroma fold matrix
    (ssar/features/rosa/convert.py:69-117), built host-side in numpy."""
    n_merge = float(bins_per_octave) / n_chroma
    if fmin is None:
        fmin = C1_HZ

    m = np.repeat(np.eye(n_chroma), round(n_merge), axis=1)
    m = np.roll(m, -int(n_merge // 2), axis=1)
    n_octaves = int(np.ceil(float(n_input) / bins_per_octave))
    m = np.tile(m, (1, n_octaves))[:, :n_input]

    midi_0 = hz_to_midi(fmin) % 12
    roll = midi_0 if base_c else midi_0 - 9
    roll = int(np.round(roll * (n_chroma / 12.0)))
    return np.roll(m, roll, axis=0).astype(np.float32)
