"""Checkpoint converter roundtrip: our params -> rosinality-layout torch
state dict -> converter -> identical generator outputs."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
def test_nvidia_pkl_structural_roundtrip(tmp_path):
    """Build an ada-pytorch-shaped snapshot from our random init (inverse
    layout transposes), load it through the stub unpickler, and require the
    recovered pytree to match the original exactly."""
    import pickle

    from ssar_tpu.gan import stylegan2 as sg
    from ssar_tpu.gan.convert import load_nvidia_pkl

    cfg = sg.StyleGAN2Config(resolution=32)
    ref = sg.init_generator(jax.random.PRNGKey(0), cfg)

    def inv_conv(w):  # (kh, kw, in, out) -> ada (out, in, kh, kw)
        return np.asarray(w).transpose(3, 2, 0, 1)

    def mod_params(p, with_noise=True):
        d = {"weight": np.asarray(p["weight"]).T if False else inv_conv(p["weight"]),
             "bias": np.asarray(p["bias"]),
             "affine.weight": np.asarray(p["mod"]["weight"]).T,
             "affine.bias": np.asarray(p["mod"]["bias"])}
        if with_noise:
            d["noise_strength"] = np.asarray(p["noise_weight"])
        return d

    flat = {"synthesis.b4.const": np.asarray(ref["const"]).transpose(2, 0, 1),
            "mapping.w_avg": np.asarray(ref["w_avg"])}
    for i, lay in enumerate(ref["mapping"]):
        flat[f"mapping.fc{i}.weight"] = np.asarray(lay["weight"]).T
        flat[f"mapping.fc{i}.bias"] = np.asarray(lay["bias"])
    for name, p in [("synthesis.b4.conv1", ref["conv1"])]:
        for k, v in mod_params(p).items():
            flat[f"{name}.{k}"] = v
    for k, v in mod_params(ref["to_rgb1"], with_noise=False).items():
        flat[f"synthesis.b4.torgb.{k}"] = v
    for i in range(3, cfg.log_size + 1):
        res = 2**i
        c0, c1 = ref["convs"][(i - 3) * 2], ref["convs"][(i - 3) * 2 + 1]
        for k, v in mod_params(c0).items():
            flat[f"synthesis.b{res}.conv0.{k}"] = v
        for k, v in mod_params(c1).items():
            flat[f"synthesis.b{res}.conv1.{k}"] = v
        for k, v in mod_params(ref["to_rgbs"][i - 3], with_noise=False).items():
            flat[f"synthesis.b{res}.torgb.{k}"] = v

    path = tmp_path / "net.pkl"
    path.write_bytes(pickle.dumps({"G_ema": {"state": flat}}))

    got = load_nvidia_pkl(str(path), cfg)
    ra = {jax.tree_util.keystr(p): v for p, v in jax.tree.flatten_with_path(ref)[0]}
    ga = {jax.tree_util.keystr(p): v for p, v in jax.tree.flatten_with_path(got)[0]}
    assert set(ra) == set(ga)
    for k in ra:
        assert np.allclose(np.asarray(ra[k]), np.asarray(ga[k])), k
