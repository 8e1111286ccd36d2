"""Feature parity & timing harness (`python -m ssar_tpu.audio.parity`).

Equivalent of the reference's librosa-parity __main__ block
(ssar/features/audio.py:136-210): for each named feature it reports value
statistics, per-call latency over N trials, gradient flow, and — where an
independent numpy oracle exists in-image — the abs-diff against it.
(librosa is not in this image; scipy/numpy oracles cover stft/mel/rms/dct,
and the remaining features are checked for stats + differentiability.)
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import features as FT
from .beat import onset_strength, plp


def _mel_oracle(au: np.ndarray, sr: int) -> np.ndarray:
    from .spectral import mel_basis

    n_fft, hop = 2048, 1024
    ap = np.pad(au, (n_fft // 2, n_fft // 2), mode="reflect")
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    nf = (len(ap) - n_fft) // hop + 1
    fr = np.stack([ap[i * hop : i * hop + n_fft] * win for i in range(nf)])[:-1]
    S = np.abs(np.fft.rfft(fr, axis=1)) ** 2
    return mel_basis(sr, n_fft) @ S.T


def _rms_oracle(au: np.ndarray, sr: int) -> np.ndarray:
    ap = np.pad(au, (1024, 1024), mode="reflect")
    nf = (len(ap) - 2048) // 1024 + 1
    return np.stack([np.sqrt(np.mean(ap[i * 1024 : i * 1024 + 2048] ** 2)) for i in range(nf - 1)])[:, None]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--trials", type=int, default=5)
    args = p.parse_args(argv)

    sr = 1024 * args.fps
    L = int(sr * args.seconds)
    t = np.arange(L) / sr
    au = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * np.random.RandomState(0).randn(L)).astype(np.float32)
    au[:: sr // 2] += 1.5
    aj = jnp.asarray(au)

    harness = [
        ("mfcc", lambda a: FT.mfcc(a, sr), None),
        ("chroma", lambda a: FT.chromagram(a, sr, tuning=0.0), None),
        ("tonnetz", lambda a: FT.tonnetz(a, sr, tuning=0.0), None),
        ("contrast", lambda a: FT.spectral_contrast(a, sr), None),
        ("flatness", lambda a: FT.spectral_flatness(a, sr), None),
        ("onsets", lambda a: onset_strength(a, sr), None),
        ("rms", lambda a: FT.rms(a, sr), lambda: _rms_oracle(au, sr)),
        ("drop_strength", lambda a: FT.drop_strength(a, sr), None),
        ("pulse", lambda a: plp(a, sr), None),
        ("melspec", lambda a: __import__("ssar_tpu.audio.spectral", fromlist=["melspectrogram"]).melspectrogram(a, sr),
         lambda: _mel_oracle(au, sr)),
    ]

    print(f"{'feature'.ljust(16)} {'shape'.ljust(14)} {'min/mean/max'.ljust(28)} "
          f"{'ms/call'.ljust(9)} {'grad'.ljust(8)} oracle |diff|")
    for name, fn, oracle in harness:
        out = fn(aj)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.trials):
            out = fn(aj)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.trials * 1000

        grad_ok = "-"
        try:
            g = jax.grad(lambda a: jnp.sum(jnp.abs(fn(a))))(aj)
            grad_ok = f"{float(jnp.linalg.norm(g)):.2g}"
        except Exception:
            grad_ok = "FAIL"

        diff = "-"
        if oracle is not None:
            ref = oracle()
            o = np.asarray(out)
            if o.shape == ref.shape:
                d = np.abs(o - ref)
                diff = f"{d.min():.2g}/{d.mean():.2g}/{d.max():.2g}"
            else:
                diff = f"shape {o.shape} vs {ref.shape}"

        o = np.asarray(out)
        stats = f"{o.min():.3f}/{o.mean():.3f}/{o.max():.3f}"
        print(f"{name.ljust(16)} {str(tuple(o.shape)).ljust(14)} {stats.ljust(28)} "
              f"{dt:7.1f}  {grad_ok.ljust(8)} {diff}")


if __name__ == "__main__":
    main()
