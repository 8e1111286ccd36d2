"""Absolute FID/KID/PRDC through the TRAINED in-environment extractor.

The reference's OOD evaluation (ssar/ood.py:80-206) runs FID-family
metrics through a pretrained SwAV trunk.  Zero egress means no pretrained
Inception/SwAV weights exist in this image (docs/WEIGHTS.md carries that
path); what a zero-egress image CAN produce is absolute numbers through a
real trained discriminative extractor: the calibration run's StyleGAN2
discriminator (scripts/train_calibration_g.py, trained against procedural
structured-color images).

This script validates the full mechanism end-to-end with known orderings:

- null:        two disjoint halves of the real distribution (FID ~ small)
- generator:   calibration-G renders vs real procedural targets
- corrupted:   real targets with channel-swapped colors (should score
               clearly worse than the generator on this color-sensitive
               extractor)

    python scripts/ood_absolute.py      # ~2 min on the TPU

Writes docs/ood_absolute.json.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", default="docs/study/calibration_g.npz")
    ap.add_argument("--d", default="docs/study/calibration_d.npz")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--max_channels", type=int, default=128)
    ap.add_argument("--out", default="docs/ood_absolute.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssar_tpu.gan import stylegan2 as sg
    from ssar_tpu.gan.convert import load_npz
    from ssar_tpu.metrics.ood import compute, discriminator_extractor
    from ssar_tpu.train.palette_g import procedural_targets, target_basis

    print(f"backend: {jax.default_backend()}")
    config = sg.StyleGAN2Config(resolution=args.resolution, max_channels=args.max_channels)
    g_params = load_npz(args.g)
    extractor = discriminator_extractor(load_npz(args.d), resolution=args.resolution)

    P = target_basis(config.style_dim)
    key = jax.random.PRNGKey(11)
    k_real, k_fake = jax.random.split(key)

    # real: procedural targets over mapped latents (the training distribution)
    B = 32

    @jax.jit
    def real_batch(k):
        z = jax.random.normal(k, (B, config.style_dim))
        w = sg.mapping(g_params, z, config)
        return jnp.clip((procedural_targets(w, P, args.resolution) + 1) / 2, 0, 1)

    @jax.jit
    def fake_batch(k):
        z = jax.random.normal(k, (B, config.style_dim))
        w = sg.mapping(g_params, z, config)
        img = sg.synthesis(g_params, sg.w_to_wplus(w, config), None, config,
                           dtype=jnp.bfloat16)
        return jnp.clip((img + 1) / 2, 0, 1)

    t0 = time.time()
    real = np.concatenate([np.asarray(real_batch(jax.random.fold_in(k_real, i)))
                           for i in range(2 * args.n // B)])
    fake = np.concatenate([np.asarray(fake_batch(jax.random.fold_in(k_fake, i)))
                           for i in range(args.n // B)])
    corrupted = real[args.n :][:, :, :, [2, 0, 1]]  # channel-rolled colors

    rows = {
        "null (real half vs real half)": compute(real[: args.n], real[args.n :],
                                                 extractor=extractor),
        "calibration G vs real targets": compute(real[: args.n], fake,
                                                 extractor=extractor),
        "corrupted (channel-rolled) vs real": compute(real[: args.n], corrupted,
                                                      extractor=extractor),
    }
    wall = time.time() - t0
    result = {"extractor": "trained calibration D penultimate (512-d)",
              "n": args.n, "resolution": args.resolution, "wall_s": round(wall, 1),
              "rows": {k: {m: (round(float(x), 4) if isinstance(x, float) else x)
                           for m, x in v.items()} for k, v in rows.items()}}
    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))
    ok = (rows["null (real half vs real half)"]["frechet"]
          < rows["calibration G vs real targets"]["frechet"]
          < rows["corrupted (channel-rolled) vs real"]["frechet"])
    print("ordering (null < G < corrupted):", "OK" if ok else "VIOLATED")


if __name__ == "__main__":
    main()
