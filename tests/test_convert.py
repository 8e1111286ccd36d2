"""Checkpoint converter roundtrip: our params -> rosinality-layout torch
state dict -> converter -> identical generator outputs."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ssar_tpu.gan import stylegan2 as sg
from ssar_tpu.gan.convert import load_rosinality_pt

CFG = sg.StyleGAN2Config(resolution=64)


def _to_rosinality_sd(params):
    """Inverse of gan/convert.load_rosinality_pt's layout mapping."""
    import torch

    sd = {}

    def put(key, arr):
        sd[key] = torch.from_numpy(np.asarray(arr).copy())

    for i, lin in enumerate(params["mapping"]):
        put(f"style.{i + 1}.weight", np.asarray(lin["weight"]).T)
        put(f"style.{i + 1}.bias", lin["bias"])

    put("input.input", np.asarray(params["const"]).transpose(2, 0, 1)[None])

    def put_styled(prefix, p):
        put(f"{prefix}.conv.weight", np.asarray(p["weight"]).transpose(3, 2, 0, 1)[None])
        put(f"{prefix}.conv.modulation.weight", np.asarray(p["mod"]["weight"]).T)
        put(f"{prefix}.conv.modulation.bias", p["mod"]["bias"])
        put(f"{prefix}.noise.weight", np.asarray(p["noise_weight"]).reshape(1))
        put(f"{prefix}.activate.bias", p["bias"])

    def put_torgb(prefix, p):
        put(f"{prefix}.conv.weight", np.asarray(p["weight"]).transpose(3, 2, 0, 1)[None])
        put(f"{prefix}.conv.modulation.weight", np.asarray(p["mod"]["weight"]).T)
        put(f"{prefix}.conv.modulation.bias", p["mod"]["bias"])
        put(f"{prefix}.bias", np.asarray(p["bias"]).reshape(1, 3, 1, 1))

    put_styled("conv1", params["conv1"])
    put_torgb("to_rgb1", params["to_rgb1"])
    for i, p in enumerate(params["convs"]):
        put_styled(f"convs.{i}", p)
    for i, p in enumerate(params["to_rgbs"]):
        put_torgb(f"to_rgbs.{i}", p)
    put("latent_avg", params["w_avg"])
    return sd


def test_rosinality_roundtrip(rng):
    import torch

    params = sg.init_generator(jax.random.PRNGKey(0), CFG)
    params["conv1"]["noise_weight"] = jnp.asarray(0.3)  # nonzero to test transfer
    sd = _to_rosinality_sd(params)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "g.pt")
        torch.save({"g_ema": sd}, path)
        restored = load_rosinality_pt(path, CFG)

    z = jnp.asarray(rng.randn(2, 512).astype(np.float32))
    noises = [jnp.asarray(rng.randn(2, h, w, 1).astype(np.float32)) for h, w in CFG.noise_shapes()]
    img_a = sg.synthesis(params, sg.w_to_wplus(sg.mapping(params, z, CFG), CFG), noises, CFG)
    img_b = sg.synthesis(restored, sg.w_to_wplus(sg.mapping(restored, z, CFG), CFG), noises, CFG)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(restored["w_avg"]), np.asarray(params["w_avg"]))
