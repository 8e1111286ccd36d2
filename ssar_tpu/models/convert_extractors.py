"""Offline torch-checkpoint -> native flax param converters for extractors.

The reference downloads pretrained VGGish / SlowFast / torchvision zoos at
runtime (ssar/models/vggish.py:158-311, ssar/models/slowfast.py:50-366,
ssar/ood.py:100-206); this image is zero-egress, so conversion happens
OFFLINE on any machine with the checkpoint, producing an .npz the native
extractors load directly:

    python -m ssar_tpu.models.convert_extractors vggish.pt out.npz --arch vggish
    ...
    VggishExtractor(params=load_converted("out.npz"))

Supported layouts:
- ``vggish``: the torchvggish/AudioSet state_dict (features.{0,3,6,8,11,13}
  Conv2d + embeddings.{0,2,4} Linear) -> models.extractors.VGGish.
- ``slowfast``: a state_dict shape-matching models.extractors.SlowFastVideo
  (a lightweight two-pathway family for random-feature use).
- ``slowfast_r50``: the REAL facebook-slowfast SLOWFAST_8x8_R50 layout
  (s1.pathway{p}_stem / s{k}_fuse / s{k}.pathway{p}_res{j}) ->
  models.slowfast_r50, the faithful LayerSlowFast extractor.
- ``resnet50``: a torchvision-layout ResNet-50 trunk (conv1/bn1/layer{1..4})
  — SwAV checkpoints included (module./backbone. prefixes stripped) ->
  models.resnet.resnet50_features, the OOD FID/KID/PRDC extractor.

Conventions: torch Conv2d kernels are OIHW -> flax HWIO; Conv3d OIDHW ->
DHWIO; Linear (out, in) -> (in, out).  The first Linear after a flatten is
additionally permuted from torch's channels-first flatten order (C, H, W)
to flax's channels-last (H, W, C).
"""
from __future__ import annotations

import sys

import numpy as np


def _conv2d(w):  # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _conv3d(w):  # OIDHW -> DHWIO
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _linear(w):  # (out, in) -> (in, out)
    return np.transpose(np.asarray(w), (1, 0))


def _linear_after_flatten(w, chw):
    """First Linear after flatten: permute input dim from torch (C,H,W)
    flatten order to flax (H,W,C)."""
    C, H, W = chw
    w = np.asarray(w).reshape(-1, C, H, W)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(w.shape[0], H * W * C)
    return np.transpose(w, (1, 0))


def convert_vggish(state_dict: dict) -> dict:
    """torchvggish state_dict -> flax tree for models.extractors.VGGish."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    conv_idx = [0, 3, 6, 8, 11, 13]
    params = {}
    for i, ci in enumerate(conv_idx):
        params[f"Conv_{i}"] = {
            "kernel": _conv2d(sd[f"features.{ci}.weight"]).astype(np.float32),
            "bias": sd[f"features.{ci}.bias"].astype(np.float32),
        }
    # embeddings: Linear(512*6*4 -> 4096), Linear(4096 -> 4096), Linear(4096 -> 128)
    # VGGish input is (96, 64) mel patches -> after 4 pools (6, 4) spatial, 512 ch
    params["Dense_0"] = {
        "kernel": _linear_after_flatten(sd["embeddings.0.weight"], (512, 6, 4)).astype(np.float32),
        "bias": sd["embeddings.0.bias"].astype(np.float32),
    }
    for j, ei in enumerate([2, 4], start=1):
        params[f"Dense_{j}"] = {
            "kernel": _linear(sd[f"embeddings.{ei}.weight"]).astype(np.float32),
            "bias": sd[f"embeddings.{ei}.bias"].astype(np.float32),
        }
    return {"params": params}


def convert_slowfast(state_dict: dict) -> dict:
    """Shape-matching torch state_dict -> flax tree for SlowFastVideo.

    Expected torch module names: {slow,fast}_stem, {slow,fast}_b{0,1,2}
    (Conv3d), head (Linear) — i.e. a torch re-statement of the native
    simplified two-pathway family."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {}
    for name in ["slow_stem", "fast_stem"] + [f"{p}_b{i}" for p in ("slow", "fast") for i in range(3)]:
        params[name] = {
            "kernel": _conv3d(sd[f"{name}.weight"]).astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32),
        }
    params["Dense_0"] = {
        "kernel": _linear(sd["head.weight"]).astype(np.float32),
        "bias": sd["head.bias"].astype(np.float32),
    }
    return {"params": params}


def convert_resnet50(state_dict: dict) -> dict:
    """torchvision/SwAV ResNet-50 state_dict -> models.resnet tree."""
    from .resnet import BLOCKS

    sd = {}
    for k, v in state_dict.items():
        for pre in ("module.", "backbone.", "encoder."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = np.asarray(v)

    def bn(prefix):
        return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
                "bias": sd[f"{prefix}.bias"].astype(np.float32),
                "mean": sd[f"{prefix}.running_mean"].astype(np.float32),
                "var": sd[f"{prefix}.running_var"].astype(np.float32)}

    params = {"stem": {"kernel": _conv2d(sd["conv1.weight"]).astype(np.float32)},
              "bn1": bn("bn1")}
    for li in range(4):
        blocks = {}
        for bi in range(BLOCKS[li]):
            pre = f"layer{li + 1}.{bi}"
            bp = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _conv2d(sd[f"{pre}.conv{ci}.weight"]).astype(np.float32)}
                bp[f"bn{ci}"] = bn(f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                bp["downsample"] = {"kernel": _conv2d(sd[f"{pre}.downsample.0.weight"]).astype(np.float32)}
                bp["downsample_bn"] = bn(f"{pre}.downsample.1")
            blocks[str(bi)] = bp
        params[f"layer{li + 1}"] = blocks
    return params


def convert_slowfast_r50(state_dict: dict) -> dict:
    """facebook-slowfast SLOWFAST_8x8_R50 state_dict (s1.pathway{p}_stem /
    s{k}_fuse / s{k}.pathway{p}_res{j}.branch{1,2} / head.projection) ->
    models.slowfast_r50 tree.  The classification head is dropped — the
    extractor surface is the per-layer features."""
    sd = {}
    for k, v in state_dict.items():
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = np.asarray(v)

    def bn(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"],
                "mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}

    # depths derived from the keys so non-R50 trunks convert too
    depths = []
    for stage in range(4):
        j = 0
        while f"s{stage + 2}.pathway0_res{j}.branch2.a.weight" in sd:
            j += 1
        depths.append(j)

    tree: dict = {"stem": {str(p): {"conv": _conv3d(sd[f"s1.pathway{p}_stem.conv.weight"]),
                                    "bn": bn(f"s1.pathway{p}_stem.bn")}
                           for p in range(2)}}
    tree["fuse"] = {str(k - 1): {"conv": _conv3d(sd[f"s{k}_fuse.conv_f2s.weight"]),
                                 "bn": bn(f"s{k}_fuse.bn")}
                    for k in range(1, 5)}
    stages: dict = {}
    for stage, depth in enumerate(depths):
        per_path: dict = {}
        for p in range(2):
            blocks: dict = {}
            for j in range(depth):
                pre = f"s{stage + 2}.pathway{p}_res{j}"
                b = {part: {"conv": _conv3d(sd[f"{pre}.branch2.{part}.weight"]),
                            "bn": bn(f"{pre}.branch2.{part}_bn")}
                     for part in ("a", "b", "c")}
                if f"{pre}.branch1.weight" in sd:
                    b["branch1"] = {"conv": _conv3d(sd[f"{pre}.branch1.weight"]),
                                    "bn": bn(f"{pre}.branch1_bn")}
                blocks[str(j)] = b
            per_path[str(p)] = blocks
        stages[str(stage)] = per_path
    tree["stages"] = stages
    return tree


def flatten_tree(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_converted(tree: dict, out_path: str) -> None:
    np.savez(out_path, **flatten_tree(tree))


def load_converted(path: str) -> dict:
    with np.load(path) as z:
        return unflatten_tree({k: z[k] for k in z.files})


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt", help="torch checkpoint (.pt/.pth state_dict)")
    p.add_argument("out", help="output .npz")
    p.add_argument("--arch", choices=["vggish", "slowfast", "slowfast_r50", "resnet50"],
                   default="vggish")
    args = p.parse_args(argv)

    import torch

    sd = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}

    tree = {"vggish": convert_vggish, "slowfast": convert_slowfast,
            "slowfast_r50": convert_slowfast_r50, "resnet50": convert_resnet50}[args.arch](sd)
    save_converted(tree, args.out)
    n = sum(v.size for v in flatten_tree(tree).values())
    print(f"wrote {args.out}: {n:,} parameters ({args.arch})")


if __name__ == "__main__":
    main(sys.argv[1:])
