"""On-the-fly feature-reactive latent target synthesis ("latent augmenter").

Equivalent of ssar/supervised/latent_augmenter.py: generates pseudo
ground-truth W+ sequences directly from audio features (spline-looped base
+ feature-modulated patches over random W+ layer bands), so supervised
training has unlimited synthetic targets with guaranteed audio
correlation.  Used by `medium_correlation` test-set clips and the
train-with-augmented-targets mode.

Randomness is jax.random key-threaded; feature-column index map follows the
59-dim FEATURE_NAMES layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.processing import normalize
from ..generate.latent import spline_loop_latents

FEAT_IDXS = {
    "chroma": (20, 32),
    "tonnetz": (32, 38),
    "onsets": (46, 47),
    "onsets_low": (47, 48),
    "onsets_mid": (48, 49),
    "onsets_high": (49, 50),
    "volume": (51, 52),
    "volume_low": (52, 53),
    "volume_mid": (53, 54),
    "volume_high": (54, 55),
    "volume_long": (55, 56),
    "volume_low_long": (56, 57),
    "volume_mid_long": (57, 58),
    "volume_high_long": (58, 59),
}
SINGLE_KEYS = [k for k, (a, b) in FEAT_IDXS.items() if b - a == 1]


class LatentAugmenter:
    def __init__(self, mapper, n_patches: int = 5, n_ws: int = 16384, seed: int = 0):
        self.n_patches = n_patches
        key = jax.random.PRNGKey(seed)
        self.ws = mapper(jax.random.normal(key, (n_ws, 512)))  # (N, n_w, 512)
        self.num = n_ws
        self.nw = self.ws.shape[1]
        self.keys = list(FEAT_IDXS)

    def random_patch(self, feature: jax.Array, key: jax.Array):
        """feature (T, 59) -> (residual (T, n_w, 512), offset (1, n_w, 512))."""
        keys = jax.random.split(key, 3 * self.n_patches + 2)
        kit = iter(keys)
        T = feature.shape[0]

        n_base = int(jax.random.randint(next(kit), (), 3, 12))
        sel = jax.random.randint(next(kit), (n_base,), 0, self.num)
        latent = spline_loop_latents(self.ws[sel], T)

        for _ in range(self.n_patches):
            k1, k2, k3 = next(kit), next(kit), next(kit)
            name = self.keys[int(jax.random.randint(k1, (), 0, len(self.keys)))]
            start, stop = FEAT_IDXS[name]

            if float(jax.random.uniform(k2)) > 0.5:
                lay_start = int(jax.random.randint(k3, (), 0, self.nw - 6))
                lay_stop = int(jax.random.randint(jax.random.fold_in(k3, 1), (), lay_start + 1, self.nw + 1))
            else:
                lay_start, lay_stop = 0, self.nw
            lays = slice(lay_start, lay_stop)

            if stop - start == 1:
                lat = self.ws[jax.random.randint(jax.random.fold_in(k2, 2), (1,), 0, self.num)]
                modulation = normalize(feature[:, start:stop, None])
                latent = latent.at[:, lays].set(
                    latent[:, lays] * (1 - modulation) + modulation * lat[:, lays])
            else:
                lats = self.ws[jax.random.randint(jax.random.fold_in(k2, 3), (stop - start,), 0, self.num)]
                modulation = normalize(feature[:, start:stop])
                modulation = modulation / (jnp.sum(modulation, axis=1, keepdims=True) + 1e-8)
                patch_latent = jnp.einsum("TA,AWL->TWL", modulation, lats)
                if float(jax.random.uniform(jax.random.fold_in(k2, 4))) > 0.666:
                    iname = SINGLE_KEYS[int(jax.random.randint(jax.random.fold_in(k2, 5), (), 0, len(SINGLE_KEYS)))]
                    a, b = FEAT_IDXS[iname]
                    inter = normalize(feature[:, a:b, None])
                    latent = latent.at[:, lays].set(
                        latent[:, lays] * (1 - inter) + inter * patch_latent[:, lays])
                else:
                    latent = latent.at[:, lays].set(patch_latent[:, lays])

        offset = jnp.mean(latent, axis=(0, 1), keepdims=True)
        return latent - offset, offset

    def __call__(self, features: jax.Array, key: jax.Array | None = None):
        """features (B, T, 59) -> (residuals (B,T,n_w,512), offsets (B,1,n_w,512))."""
        key = key if key is not None else jax.random.PRNGKey(0)
        residuals, offsets = [], []
        for i, f in enumerate(features):
            r, o = self.random_patch(f, jax.random.fold_in(key, i))
            residuals.append(r)
            offsets.append(o)
        return jnp.stack(residuals), jnp.stack(offsets)
