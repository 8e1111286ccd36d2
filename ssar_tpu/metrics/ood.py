"""Image-quality / OOD metrics: FID, KID, precision-recall-density-coverage.

Equivalent of ssar/ood.py:80-206 (which calls maua.GAN.metrics.compute with
a SwAV extractor).  The metric math is implemented natively in jnp; the
feature extractor is pluggable:

- pass any callable `(N, H, W, 3) [0,1] -> (N, D)`; for reference-grade
  absolute numbers use the native ResNet-50 SwAV trunk with converted
  weights: ``models.resnet.swav_extractor(load_converted("swav.npz"))``
  (convert offline: ``python -m ssar_tpu.models.convert_extractors
  swav.pt swav.npz --arch resnet50``),
- `default_extractor()` returns a fixed random-projection + pooling
  extractor — deterministic and distribution-sensitive, usable for
  relative comparisons in this zero-egress image (no pretrained weights
  available in-image).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg


def default_extractor(dim: int = 256, patch: int = 8, seed: int = 0):
    """Deterministic random-feature extractor: overlapping patch projections
    + average/max pooling statistics."""
    key = jax.random.PRNGKey(seed)
    W = jax.random.normal(key, (patch * patch * 3, dim)) / np.sqrt(patch * patch * 3)

    @jax.jit
    def extract(images):  # (N, H, W, 3) in [0, 1]
        N, H, Wd, C = images.shape
        ph, pw = H // patch, Wd // patch
        x = images[:, : ph * patch, : pw * patch]
        x = x.reshape(N, ph, patch, pw, patch, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(N, ph * pw, patch * patch * C)
        feats = jnp.einsum("npd,df->npf", x - 0.5, W)
        feats = jax.nn.gelu(feats)
        return jnp.concatenate([feats.mean(1), feats.max(1)], axis=-1)

    return extract


def discriminator_extractor(d_params, resolution: int = 256,
                            channel_multiplier: int = 1, batch_size: int = 32):
    """TRAINED in-environment extractor: the calibration run's StyleGAN2
    discriminator (gan/discriminator.py, trained by
    scripts/train_calibration_g.py against procedural structured-color
    images) evaluated at its (B, 512) penultimate features.

    This closes the absolute-number gap as far as a zero-egress image
    allows: the features come from a real trained discriminative model (not
    a random projection), so FID/KID/PRDC through it are absolute for this
    extractor and stable across runs — they are still NOT comparable to
    published Inception/SwAV numbers (docs/WEIGHTS.md for that path).
    """
    import jax

    from ..gan.discriminator import Discriminator

    D = Discriminator(resolution=resolution, channel_multiplier=channel_multiplier)

    @jax.jit
    def feats(x):  # (B, H, W, 3) in [0, 1] -> (B, 512)
        return D.apply(d_params, x * 2.0 - 1.0, features=True)

    def extract(images):
        out = []
        n = images.shape[0]
        for i in range(0, n, batch_size):
            b = images[i : i + batch_size]
            if b.shape[0] < batch_size:  # one compiled shape
                b = jnp.concatenate([b, jnp.repeat(b[-1:], batch_size - b.shape[0], 0)])
            out.append(np.asarray(feats(b))[: min(batch_size, n - i)])
        return np.concatenate(out)

    return extract


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FID between two feature sets (gaussian W2 distance)."""
    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    s1 = np.cov(feats_a, rowvar=False)
    s2 = np.cov(feats_b, rowvar=False)
    covmean = scipy.linalg.sqrtm(s1 @ s2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(np.sum((mu1 - mu2) ** 2) + np.trace(s1 + s2 - 2 * covmean))


def kernel_distance(feats_a: np.ndarray, feats_b: np.ndarray, degree: int = 3,
                    gamma: float | None = None, coef0: float = 1.0) -> float:
    """KID: polynomial-kernel MMD^2 (unbiased)."""
    d = feats_a.shape[1]
    gamma = gamma if gamma is not None else 1.0 / d

    def k(x, y):
        return (gamma * x @ y.T + coef0) ** degree

    m, n = len(feats_a), len(feats_b)
    kxx = k(feats_a, feats_a)
    kyy = k(feats_b, feats_b)
    kxy = k(feats_a, feats_b)
    term_x = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
    term_y = (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
    return float(term_x + term_y - 2 * kxy.mean())


def prdc(feats_real: np.ndarray, feats_fake: np.ndarray, k: int = 5) -> dict:
    """Precision / recall / density / coverage (Naeem et al. 2020)."""

    def pairwise(a, b):
        return np.sqrt(np.maximum(
            (a**2).sum(1)[:, None] + (b**2).sum(1)[None] - 2 * a @ b.T, 0))

    d_rr = pairwise(feats_real, feats_real)
    d_ff = pairwise(feats_fake, feats_fake)
    d_rf = pairwise(feats_real, feats_fake)

    r_radii = np.sort(d_rr, axis=1)[:, k]
    f_radii = np.sort(d_ff, axis=1)[:, k]

    precision = float((d_rf < r_radii[:, None]).any(axis=0).mean())
    recall = float((d_rf < f_radii[None, :]).any(axis=1).mean())
    density = float((d_rf < r_radii[:, None]).sum(axis=0).mean() / k)
    coverage = float((d_rf.min(axis=1) < r_radii).mean())
    return {"precision": precision, "recall": recall, "density": density, "coverage": coverage}


def compute(real_images, fake_images, extractor=None,
            metrics=("frechet", "kernel", "prdc"),
            allow_random_extractor: bool = False) -> dict:
    """maua.GAN.metrics.compute-equivalent surface (ssar/ood.py:16,103-113).

    Images: (N, H, W, 3) float [0, 1] (NHWC) or (N, 3, H, W).

    Without an ``extractor`` the fallback is the deterministic
    random-projection extractor — its numbers are only comparable to other
    runs of the SAME extractor, never to published FID/KID.  That silent
    degradation cost the reference-grade study comparability, so it now
    warns loudly unless ``allow_random_extractor=True``.
    """
    def to_nhwc(x):
        x = np.asarray(x)
        if x.shape[1] == 3 and (x.ndim == 4 and x.shape[-1] != 3):
            x = x.transpose(0, 2, 3, 1)
        return jnp.asarray(x, jnp.float32)

    if extractor is None:
        import warnings

        msg = ("ood.compute called without an extractor: falling back to the "
               "random-projection features. The resulting 'FID'/'KID' are NOT "
               "comparable to SwAV/Inception numbers — pass "
               "models.resnet.swav_extractor(converted_weights) for "
               "reference-grade results, or allow_random_extractor=True to "
               "silence this.")
        if not allow_random_extractor:
            warnings.warn(msg, UserWarning, stacklevel=2)
        extractor = default_extractor()
    fr = np.asarray(extractor(to_nhwc(real_images)))
    ff = np.asarray(extractor(to_nhwc(fake_images)))

    out = {}
    if "frechet" in metrics:
        out["frechet"] = frechet_distance(fr, ff)
    if "kernel" in metrics:
        out["kernel"] = kernel_distance(fr, ff)
    if "prdc" in metrics:
        out.update(prdc(fr, ff))
    return out


def video_vs_generator(video_frames, G, n_samples: int = 256, batch_size: int = 16,
                       seed: int = 0, extractor=None, size: int = 128) -> dict:
    """OOD of rendered video frames vs fresh generator samples — the
    reference's evaluation driver (ssar/ood.py:80-206): sample n z's, render,
    resize both sets, compute the metric battery."""
    import jax
    import jax.numpy as jnp

    fakes = []
    for i in range(0, n_samples, batch_size):
        b = min(batch_size, n_samples - i)
        z = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(seed), i), (b, 512))
        lat = G.mapper(z)
        img = jnp.clip((G.synthesizer(lat) + 1) / 2, 0, 1)
        img = jax.image.resize(img, (b, size, size, 3), method="bilinear")
        fakes.append(np.asarray(img))
    fakes = np.concatenate(fakes)

    reals = np.asarray(video_frames, np.float32)
    if reals.shape[1] == 3 and reals.shape[-1] != 3:
        reals = reals.transpose(0, 2, 3, 1)
    if reals.shape[1] != size:
        import jax.image

        reals = np.asarray(jax.image.resize(jnp.asarray(reals),
                                            (reals.shape[0], size, size, 3), method="bilinear"))
    return compute(reals, fakes, extractor=extractor)
