"""Checkpoint converters: rosinality .pt / native .npz -> our param pytree.

The reference loads both NVIDIA ``.pkl`` pickles (via maua) and rosinality
``.pt`` state dicts (ssar/supervised/test.py:191, SURVEY.md §2.9).  Here:

- rosinality ``.pt``: full fidelity conversion (torch CPU load; weights
  transposed to our (kh, kw, in, out) NHWC layout).  Note the transposed-conv
  layers store weights identically to regular convs in rosinality
  (the transpose happens at call time), so no extra flip is needed here.
- native ``.npz``: flat `path -> array` dict of our own pytree.
- NVIDIA ``.pkl``: requires unpickling NVIDIA's class definitions; not
  supported in-image (zero-egress, no dnnlib).  Convert externally to
  rosinality format first.
"""
from __future__ import annotations

import numpy as np

from .stylegan2 import StyleGAN2Config


def _t(w) -> np.ndarray:  # torch tensor -> numpy
    return w.detach().cpu().numpy()


def load_rosinality_pt(path: str, config: StyleGAN2Config) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("g_ema", ckpt.get("g", ckpt)) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    import jax.numpy as jnp

    def conv_w(key):  # (1, out, in, kh, kw) -> (kh, kw, in, out)
        w = _t(sd[key])
        if w.ndim == 5:
            w = w[0]
        return jnp.asarray(w.transpose(2, 3, 1, 0))

    def lin(prefix):
        return {"weight": jnp.asarray(_t(sd[f"{prefix}.weight"]).T),
                "bias": jnp.asarray(_t(sd[f"{prefix}.bias"]))}

    def styled(prefix):
        return {
            "weight": conv_w(f"{prefix}.conv.weight"),
            "mod": lin(f"{prefix}.conv.modulation"),
            "noise_weight": jnp.asarray(_t(sd[f"{prefix}.noise.weight"]).reshape(())),
            "bias": jnp.asarray(_t(sd[f"{prefix}.activate.bias"])),
        }

    def torgb(prefix):
        return {
            "weight": conv_w(f"{prefix}.conv.weight"),
            "mod": lin(f"{prefix}.conv.modulation"),
            "bias": jnp.asarray(_t(sd[f"{prefix}.bias"]).reshape(-1)),
        }

    params = {
        "mapping": [lin(f"style.{i + 1}") for i in range(config.n_mlp)],
        "const": jnp.asarray(_t(sd["input.input"])[0].transpose(1, 2, 0)),
        "conv1": styled("conv1"),
        "to_rgb1": torgb("to_rgb1"),
        "convs": [styled(f"convs.{i}") for i in range((config.log_size - 2) * 2)],
        "to_rgbs": [torgb(f"to_rgbs.{i}") for i in range(config.log_size - 2)],
        "w_avg": jnp.asarray(_t(sd["latent_avg"]).reshape(-1)) if "latent_avg" in sd
        else jnp.zeros((config.style_dim,)),
    }
    return params


def save_npz(path: str, params: dict) -> None:
    import jax

    flat = {}
    leaves, treedef = jax.tree.flatten_with_path(params) if hasattr(jax.tree, "flatten_with_path") else (None, None)
    if leaves is None:
        raise RuntimeError("jax.tree.flatten_with_path unavailable")
    for kp, leaf in leaves:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_npz(path: str) -> dict:
    import jax.numpy as jnp

    data = np.load(path)
    params: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = params
        for i, p in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            if p.isdigit():
                p = int(p)
            if isinstance(node, dict):
                node = node.setdefault(p, [] if nxt.isdigit() else {})
            else:  # list
                while len(node) <= p:
                    node.append([] if nxt.isdigit() else {})
                node = node[p]
        last = parts[-1]
        if last.isdigit():
            last = int(last)
            while len(node) <= last:
                node.append(None)
            node[last] = jnp.asarray(data[key])
        else:
            node[last] = jnp.asarray(data[key])
    return params
