"""Train the in-environment calibration G (the round-5 chroma-blindness fix).

docs/STUDY.md r4 diagnosed the study scorer as blind to palette-mixing
reactivity under a random-weight G (calibration high_chroma 0.110 ~= low
0.098) — while palette mixing is the channel every reactive paradigm uses
and the one the reference's own metric validation relies on
(ssar/metrics/generate.py:80-89).  Zero egress means no real pretrained
checkpoint; this script *makes* a non-degenerate G by training the in-repo
generator + discriminator on procedural structured-color targets that are
smooth functions of W (ssar_tpu/train/palette_g.py for the full design).

    python scripts/train_calibration_g.py            # ~3k steps on the TPU

Writes <out>/calibration_g.npz (f16-compressed checkpoint-of-record),
<out>/calibration_g_curve.json (loss curves + identity-spread metric) and
<out>/calibration_g_samples.png (rendered palette grid: 8 random latents +
one chroma-style convex mix row).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def sample_grid(params, config, path: str, n: int = 8, seed: int = 7) -> None:
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ssar_tpu.gan import stylegan2 as sg

    z = jax.random.normal(jax.random.PRNGKey(seed), (n, config.style_dim))
    w = sg.mapping(params, z, config)
    # row 2: convex palette mixes between w[0] and w[1] — the chroma
    # recipe's mechanism; these should render as intermediate palettes
    alphas = jnp.linspace(0.0, 1.0, n)[:, None]
    w_mix = (1 - alphas) * w[0:1] + alphas * w[1:2]
    imgs = sg.synthesis(params, sg.w_to_wplus(jnp.concatenate([w, w_mix]), config),
                        None, config, dtype=jnp.bfloat16)
    imgs = np.clip((np.asarray(imgs, np.float32) + 1) / 2, 0, 1)
    fig, axes = plt.subplots(2, n, figsize=(2 * n, 4.2))
    for i in range(n):
        axes[0, i].imshow(imgs[i]); axes[0, i].set_axis_off()
        axes[1, i].imshow(imgs[n + i]); axes[1, i].set_axis_off()
    axes[0, 0].set_title("random latents", loc="left", fontsize=9)
    axes[1, 0].set_title("convex mix w0 -> w1 (chroma mechanism)", loc="left", fontsize=9)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/study")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--max_channels", type=int, default=128)
    ap.add_argument("--n_steps", type=int, default=3000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--lambda_adv", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from ssar_tpu.gan.convert import save_npz
    from ssar_tpu.gan.stylegan2 import StyleGAN2Config
    from ssar_tpu.train.palette_g import (palette_identity_spread,
                                          palette_target_alignment, train_calibration_g)

    print(f"backend: {jax.default_backend()}")
    config = StyleGAN2Config(resolution=args.resolution, max_channels=args.max_channels)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    params, d_params, losses = train_calibration_g(
        config, n_steps=args.n_steps, batch_size=args.batch_size, lr=args.lr,
        lambda_adv=args.lambda_adv, seed=args.seed)
    wall = time.time() - t0

    spread = palette_identity_spread(params, config)
    alignment = palette_target_alignment(params, config)
    # f16 storage compression; load_npz promotes back to f32
    params_f16 = jax.tree.map(lambda a: np.asarray(a, np.float16), params)
    ckpt = out / "calibration_g.npz"
    save_npz(str(ckpt), params_f16)
    if d_params is not None:  # the trained D doubles as the in-env OOD
        # feature extractor (metrics/ood.py discriminator_extractor)
        save_npz(str(out / "calibration_d.npz"),
                 jax.tree.map(lambda a: np.asarray(a, np.float16), d_params))
    n_params = sum(int(np.prod(np.shape(l))) for l in jax.tree.leaves(params))
    (out / "calibration_g_curve.json").write_text(json.dumps({
        "config": {"resolution": args.resolution, "max_channels": args.max_channels,
                   "n_steps": args.n_steps, "batch_size": args.batch_size,
                   "lr": args.lr, "lambda_adv": args.lambda_adv, "seed": args.seed},
        "n_params": n_params, "wall_s": round(wall, 1),
        "identity_spread": spread, "target_alignment": alignment,
        "mse": losses["mse"][::10], "d_loss": losses["d_loss"][::10],
        "g_adv": losses["g_adv"][::10],
    }, indent=2))
    sample_grid(params, config, str(out / "calibration_g_samples.png"))
    print(f"trained {n_params / 1e6:.1f}M params in {wall:.0f}s; "
          f"final mse {losses['mse'][-1]:.4f}; target alignment {alignment:.3f}; "
          f"checkpoint {ckpt} ({ckpt.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
