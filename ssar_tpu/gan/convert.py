"""Checkpoint converters: rosinality .pt / native .npz -> our param pytree.

The reference loads both NVIDIA ``.pkl`` pickles (via maua) and rosinality
``.pt`` state dicts (ssar/supervised/test.py:191, SURVEY.md §2.9).  Here:

- rosinality ``.pt``: full fidelity conversion (torch CPU load; weights
  transposed to our (kh, kw, in, out) NHWC layout).  Note the transposed-conv
  layers store weights identically to regular convs in rosinality
  (the transpose happens at call time), so no extra flip is needed here.
- native ``.npz``: flat `path -> array` dict of our own pytree.
- NVIDIA ``.pkl`` (stylegan2-ada-pytorch): stub unpickler reconstructs
  torch_utils.persistence objects as metadata dicts (no embedded-source
  execution) and maps ada naming/layouts onto our pytree
  (``load_nvidia_pkl``).
"""
from __future__ import annotations

import numpy as np

from .stylegan2 import StyleGAN2Config


def _t(w) -> np.ndarray:  # torch tensor (or array) -> numpy
    if isinstance(w, np.ndarray):
        return w
    return w.detach().cpu().numpy()


def load_rosinality_pt(path: str, config: StyleGAN2Config) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("g_ema", ckpt.get("g", ckpt)) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_rosinality_sd(sd, config)


def convert_rosinality_sd(sd: dict, config: StyleGAN2Config) -> dict:
    """rosinality Generator state_dict -> native params tree (also the
    decoder subtree of pSp checkpoints, gan/psp.py)."""
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

    def _arr(key):
        a = data[key]
        # f16 is a storage compression (half-size committable checkpoints);
        # compute params are always f32
        return jnp.asarray(a.astype(np.float32) if a.dtype == np.float16 else a)

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
            node[last] = _arr(key)
        else:
            node[last] = _arr(key)
    return params


# ---------------------------------------------------------- NVIDIA .pkl --
def _unpickle_nvidia(path: str) -> dict:
    """Unpickle an stylegan2-ada-pytorch network snapshot WITHOUT executing
    the embedded source code: torch_utils.persistence objects are
    reconstructed as plain metadata dicts (class_name + state)."""
    import io
    import pickle

    import torch

    class _Stub(dict):
        pass

    def _reconstruct(meta):  # torch_utils.persistence._reconstruct_persistent_obj
        return _Stub(meta)

    class _U(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith("torch_utils") or module.startswith("dnnlib"):
                if name == "_reconstruct_persistent_obj":
                    return _reconstruct
                return _Stub  # EasyDict and friends
            return super().find_class(module, name)

        def persistent_load(self, pid):  # legacy TF pickles
            raise pickle.UnpicklingError("TF-era NVIDIA pickles are not supported")

    with open(path, "rb") as f:
        data = f.read()
    # torch tensors inside use torch's zipfile or legacy storage; route
    # through torch.load with our unpickler when it is a zip archive
    try:
        return torch.load(io.BytesIO(data), map_location="cpu", weights_only=False,
                          pickle_module=type("M", (), {"Unpickler": _U, "load": lambda *a, **k: _U(*a, **k).load()}))
    except Exception:
        return _U(io.BytesIO(data)).load()


def load_nvidia_pkl(path: str, config: StyleGAN2Config, key: str = "G_ema") -> dict:
    """NVIDIA stylegan2-ada-pytorch ``.pkl`` -> our param pytree.

    The snapshot's persistent objects carry ``state`` dicts with the module
    parameters under ada naming (mapping.fc{i}, synthesis.b{res}.conv{0,1} /
    torgb).  ada and rosinality share the equalized-lr convention (raw
    weights, runtime 1/sqrt(fan_in) gain), so only layout transposes are
    needed.  Fidelity caveat: validated structurally (no real NVIDIA
    checkpoints in-image); torgb output accumulates without ada's 1/sqrt(2)
    skip gain difference because both formulations bake it into weights.
    """
    import jax.numpy as jnp

    snap = _unpickle_nvidia(path)
    obj = snap[key] if isinstance(snap, dict) and key in snap else snap

    def state_of(o):
        # persistence meta: {"state": {...}} possibly nested
        if isinstance(o, dict):
            if "state" in o and isinstance(o["state"], dict):
                return o["state"]
            return o
        return o

    state = state_of(obj)
    # flatten: persistence state holds _parameters/_buffers/_modules trees
    flat: dict[str, np.ndarray] = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k in ("_parameters", "_buffers"):
                for name, v in (node.get(k) or {}).items():
                    if v is not None:
                        flat[f"{prefix}{name}"] = _t(v)
            for name, v in (node.get("_modules") or {}).items():
                walk(f"{prefix}{name}.", state_of(v))
            for name, v in node.items():
                if name.startswith("_"):
                    continue
                if hasattr(v, "numpy") or isinstance(v, np.ndarray):
                    flat[f"{prefix}{name}"] = _t(v)
                elif isinstance(v, dict):
                    walk(f"{prefix}{name}.", state_of(v))

    walk("", state)

    def conv_w(k):  # ada (out, in, kh, kw) -> (kh, kw, in, out)
        return jnp.asarray(flat[k].transpose(2, 3, 1, 0))

    def lin(prefix):
        return {"weight": jnp.asarray(flat[f"{prefix}.weight"].T),
                "bias": jnp.asarray(flat[f"{prefix}.bias"])}

    def styled(prefix):
        return {"weight": conv_w(f"{prefix}.weight"),
                "mod": lin(f"{prefix}.affine"),
                "noise_weight": jnp.asarray(flat[f"{prefix}.noise_strength"].reshape(())),
                "bias": jnp.asarray(flat[f"{prefix}.bias"])}

    def torgb(prefix):
        return {"weight": conv_w(f"{prefix}.weight"),
                "mod": lin(f"{prefix}.affine"),
                "bias": jnp.asarray(flat[f"{prefix}.bias"].reshape(-1))}

    log = config.log_size
    convs, torgbs = [], []
    for i in range(3, log + 1):
        res = 2**i
        convs.append(styled(f"synthesis.b{res}.conv0"))
        convs.append(styled(f"synthesis.b{res}.conv1"))
        torgbs.append(torgb(f"synthesis.b{res}.torgb"))
    params = {
        "mapping": [lin(f"mapping.fc{i}") for i in range(config.n_mlp)],
        "const": jnp.asarray(flat["synthesis.b4.const"].transpose(1, 2, 0)),
        "conv1": styled("synthesis.b4.conv1"),
        "to_rgb1": torgb("synthesis.b4.torgb"),
        "convs": convs,
        "to_rgbs": torgbs,
        "w_avg": jnp.asarray(flat["mapping.w_avg"].reshape(-1)) if "mapping.w_avg" in flat
        else jnp.zeros((config.style_dim,), jnp.float32),
    }
    return params
