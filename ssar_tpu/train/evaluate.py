"""Checkpoint evaluation: split renders, longform generation, sensitivity.

Equivalent of ssar/test.py + ssar/supervised/test.py's evaluation machinery:

- ``load_checkpoint`` restores Orbax params with the stored Config — the
  explicit-schema replacement for the reference's pickle-with-code-snapshot
  archaeology (NewModuleFromFile import rewriting, SURVEY.md §5.4).
- ``generate_by_data_split``: render train/val/test clips from a checkpoint
  (ssar/test.py:189-337).
- ``generate_longform``: full-track inference — the sequence models are
  length-generic, so a long track is one forward pass (ssar/test.py:341-391).
- ``feature_sensitivity``: zero / invert / randomise / scale one feature
  column at a time and measure output deltas — the reference's
  fault-injection hooks (ssar/supervised/test.py:137-262).
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.reactor import LatentNoiseReactor
from ..utils.config import Config


def load_checkpoint(run_dir: str, step: int | None = None):
    """-> (model, params, config) from a training run directory."""
    import orbax.checkpoint as ocp

    run_dir = Path(run_dir)
    cfg_path = run_dir / "config.json"
    if cfg_path.exists():
        import json

        raw = json.loads(cfg_path.read_text())
        cfg = Config.from_dict(raw) if "model" in raw else None
        flat = raw if "model" not in raw else None
    else:
        cfg, flat = None, None

    mgr = ocp.CheckpointManager(run_dir.resolve() / "ckpt")
    step = step if step is not None else mgr.latest_step()
    restored = mgr.restore(step)
    params = restored["params"]

    kw = {}
    if flat is not None:  # train.py's argparse dump
        kw = dict(backbone=flat["backbone"], hidden_size=flat["hidden_size"],
                  num_layers=flat["num_layers"], decoder=flat["decoder"],
                  n_latent_split=flat["n_latent_split"], residual=flat["residual"],
                  dropout=flat["dropout"])
    elif cfg is not None:
        m = cfg.model
        kw = dict(backbone=m.backbone, hidden_size=m.hidden_size, num_layers=m.num_layers,
                  decoder=m.decoder, n_latent_split=m.n_latent_split, residual=m.residual,
                  dropout=m.dropout)

    F = 59
    if (run_dir / "input_mean.npy").exists():
        mean = jnp.asarray(np.load(run_dir / "input_mean.npy"))
        std = jnp.asarray(np.load(run_dir / "input_std.npy"))
    else:  # older runs: identity normalisation
        mean, std = jnp.zeros(F), jnp.ones(F)
    palette = None
    if kw.get("decoder", "learned") == "fixed":
        # the palette is a frozen constant NOT stored in the checkpoint —
        # reconstruct it exactly as train.py does (mapper over
        # RandomState(42) z's, train.py:153-159) or decoding is garbage
        from ..gan.wrapper import StyleGAN2Mapper

        mapper = StyleGAN2Mapper(seed=0)
        z = np.random.RandomState(42).randn(
            kw["n_latent_split"] * kw["hidden_size"], 512).astype(np.float32)
        palette = jnp.asarray(mapper(z))
        del mapper
    model = LatentNoiseReactor(mean, std, palette, **kw)
    return model, params, cfg


def generate_by_data_split(run_dir: str, dataset, out_dir: str, n_per_split: int = 2,
                           fps: int = 24, gan_config=None, model_file=None,
                           output_size=(256, 256)):
    """Render clips from dataset windows through a checkpoint
    (ssar/test.py:189-337)."""
    from ..generate.audio2video import _audio2video

    model, params, _ = load_checkpoint(run_dir)
    outs = []
    for i in range(min(n_per_split, len(dataset))):
        feats = jnp.asarray(dataset.features[i])

        def apply(x):
            return model.apply(params, x, rngs={"noise": jax.random.PRNGKey(i)})

        out_file = str(Path(out_dir) / f"split_render_{i}.mp4")
        outs.append(_audio2video(apply, feats, out_file, model_file=model_file,
                                 output_size=output_size, fps=fps, gan_config=gan_config))
    return outs


def generate_longform(run_dir: str, audio, sr: int, out_file: str, fps: int = 24,
                      gan_config=None, model_file=None, output_size=(256, 256)):
    """Whole-track inference in one pass (ssar/test.py:341-391)."""
    from ..audio.features import audio2features
    from ..generate.audio2video import _audio2video

    model, params, _ = load_checkpoint(run_dir)
    feats = audio2features(jnp.asarray(audio), int(sr), fps)

    def apply(x):
        return model.apply(params, x, rngs={"noise": jax.random.PRNGKey(0)})

    return _audio2video(apply, feats, out_file, model_file=model_file,
                        output_size=output_size, fps=fps, gan_config=gan_config)


PERTURBATIONS = {
    "zero": lambda col, key: jnp.zeros_like(col),
    "invert": lambda col, key: jnp.max(col) - col,
    "random": lambda col, key: jax.random.permutation(key, col),
    "scale2x": lambda col, key: 2.0 * col,
}


def feature_sensitivity(model, params, features: jax.Array, feature_names=None,
                        perturbations=("zero", "invert", "random", "scale2x"),
                        seed: int = 0) -> dict:
    """Output-latent delta per perturbed feature column
    (ssar/supervised/test.py:137-262).  features (T, F); returns
    {(feature, perturbation): mean |delta|}."""
    feats = features[None]
    rngs = {"noise": jax.random.PRNGKey(seed)}
    base, _ = model.apply(params, feats, rngs=rngs)

    @jax.jit
    def delta(x):
        lat, _ = model.apply(params, x, rngs=rngs)
        return jnp.mean(jnp.abs(lat - base))

    out = {}
    F = features.shape[-1]
    names = feature_names or [f"f{i}" for i in range(F)]
    for i in range(F):
        for p in perturbations:
            col = features[:, i]
            new_col = PERTURBATIONS[p](col, jax.random.PRNGKey(seed + i))
            out[(names[i], p)] = float(delta(feats.at[0, :, i].set(new_col)))
    return out
