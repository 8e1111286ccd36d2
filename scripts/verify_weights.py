"""One-command fetch -> convert -> verify flow for real pretrained weights.

The build/test image has zero egress, so the repo's converter parity tests
run against synthetic torch state_dicts at the real layer widths
(tests/test_psp.py, tests/test_slowfast.py, tests/test_extended.py). This
script is the runbook's executable half for machines WITH egress: it
downloads (or takes a local path to) the real checkpoint the reference
uses, sha256-checks it, converts it with the repo's offline converters,
runs a deterministic fixture input through the converted JAX model, and —
when the upstream torch package is importable — through the original torch
model too, asserting allclose.

    python scripts/verify_weights.py vggish   [--ckpt path.pt] [--fetch]
    python scripts/verify_weights.py slowfast_r50 --ckpt SLOWFAST_8x8_R50.pyth
    python scripts/verify_weights.py resnet50 --ckpt swav_800ep_pretrain.pth.tar
    python scripts/verify_weights.py psp      --ckpt psp_ffhq_encode.pt
    python scripts/verify_weights.py stylegan --ckpt stylegan2-ffhq.pt

Reference weight sources (see docs/WEIGHTS.md for checksums):
  vggish       torch.hub harritaylor/torchvggish (ssar/models/vggish.py:69)
  slowfast_r50 facebookresearch/SlowFast zoo, Kinetics/c2/SLOWFAST_8x8_R50
               (ssar/models/slowfast.py:60,238-273)
  resnet50     facebookresearch/swav 800ep pretrain (ssar/ood.py:107 SwAV)
  psp          eladrich/pixel2style2pixel psp_ffhq_encode.pt
  stylegan     rosinality stylegan2-pytorch .pt / NVIDIA .pkl
"""
from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# sha256 of the upstream artifacts at the recorded zoo URLs; fill in / update
# when a real fetch is possible (the files are versionless zoo blobs).
KNOWN_SHA256 = {
    # "vggish.pt": "...",
}


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _report(name: str, ours: np.ndarray, ref: np.ndarray | None):
    print(f"{name}: converted output shape {ours.shape}, "
          f"mean {ours.mean():+.6f}, std {ours.std():.6f}, "
          f"checksum {float(np.abs(ours).sum()):.6f}")
    if ref is not None:
        diff = np.abs(ours - ref)
        print(f"{name}: |torch - jax| max {diff.max():.3e}, mean {diff.mean():.3e}")
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)
        print(f"{name}: PARITY OK")
    else:
        print(f"{name}: upstream torch model unavailable — stats only "
              f"(compare against the values recorded in docs/WEIGHTS.md)")


def verify_vggish(ckpt: str | None, fetch: bool):
    import torch

    from ssar_tpu.models.convert_extractors import convert_vggish
    from ssar_tpu.models.extractors import VGGish

    torch_model = None
    if ckpt:
        sd = torch.load(ckpt, map_location="cpu", weights_only=True)
    elif fetch:
        torch_model = torch.hub.load("harritaylor/torchvggish", "vggish")
        torch_model.postprocess = False
        torch_model.preprocess = False
        torch_model.eval()
        sd = torch_model.state_dict()
    else:
        raise SystemExit("pass --ckpt or --fetch")
    params = convert_vggish({k: v.numpy() for k, v in sd.items()})
    x = np.random.RandomState(0).randn(4, 96, 64).astype(np.float32)
    ours = np.asarray(VGGish().apply(params, x))
    ref = None
    if torch_model is not None:
        with torch.inference_mode():
            ref = torch_model(torch.from_numpy(x)[:, None]).numpy()
    _report("vggish", ours, ref)


def verify_slowfast_r50(ckpt: str, fetch: bool):
    import torch

    from ssar_tpu.models.convert_extractors import convert_slowfast_r50
    from ssar_tpu.models.slowfast_r50 import SlowFastConfig, slowfast_embed

    from ssar_tpu.models.slowfast_r50 import slowfast_features

    blob = torch.load(ckpt, map_location="cpu", weights_only=False)
    sd = blob.get("model_state", blob) if isinstance(blob, dict) else blob
    sd = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}
    params = convert_slowfast_r50({k: v.numpy() for k, v in sd.items()})
    cfg = SlowFastConfig()
    # 64px fixture: every layer runs its real channel widths/temporal kernels
    # while the CPU torch oracle stays tractable (same trade as the full-width
    # parity test, tests/test_slowfast.py:160).
    x = np.random.RandomState(0).rand(1, 32, 64, 64, 3).astype(np.float32) * 2 - 1
    ours_feats = slowfast_features(params, x[:, :: cfg.alpha], x, cfg)
    ours = np.asarray(slowfast_embed(params, x[:, :: cfg.alpha], x, cfg))
    ref = None
    # Oracle: the in-repo functional torch replica of LayerSlowFast._forward
    # (tests/test_slowfast.py), which consumes exactly the facebook-slowfast
    # `model_state` key naming the converter expects — unlike pytorchvideo's
    # hub model (`blocks.*` names), which strict=False would silently skip.
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_slowfast import _torch_forward

    fast_t = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    try:
        with torch.inference_mode():
            ref_feats = _torch_forward(sd, cfg, fast_t[:, :, :: cfg.alpha], fast_t)
    except KeyError as e:
        print(f"slowfast_r50: oracle forward missing checkpoint key {e} — "
              "is this a facebook-slowfast SLOWFAST_8x8_R50 model_state?")
        ref_feats = None
    if ref_feats is not None:
        for i, (o, r) in enumerate(zip(ours_feats, ref_feats)):
            d = np.abs(np.asarray(o) - r.numpy())
            print(f"slowfast_r50 layer {i}: max|diff| {d.max():.3e} mean {d.mean():.3e}")
        np.testing.assert_allclose(np.asarray(ours_feats[-1]), ref_feats[-1].numpy(),
                                   atol=2e-3, rtol=1e-2)
        ref = ref_feats[-1].mean(1).numpy()  # slowfast_embed = time-mean of last layer
    _report("slowfast_r50", ours, ref)


def verify_resnet50(ckpt: str, fetch: bool):
    import torch

    from ssar_tpu.models.convert_extractors import convert_resnet50
    from ssar_tpu.models.resnet import resnet50_features

    blob = torch.load(ckpt, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}
    params = convert_resnet50(sd)
    x = np.random.RandomState(0).rand(2, 224, 224, 3).astype(np.float32)
    ours = np.asarray(resnet50_features(params, x))
    ref = None
    try:
        import torchvision

        m = torchvision.models.resnet50()
        m.fc = torch.nn.Identity()
        missing = m.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
        print(f"resnet50: torchvision oracle loaded ({len(missing.missing_keys)} missing keys)")
        m.eval()
        from ssar_tpu.models.resnet import IMAGENET_MEAN, IMAGENET_STD

        with torch.inference_mode():
            t = torch.from_numpy(np.transpose((x - IMAGENET_MEAN) / IMAGENET_STD,
                                              (0, 3, 1, 2)).astype(np.float32))
            ref = m(t).numpy()
    except ImportError:
        pass
    _report("resnet50", ours, ref)


def verify_psp(ckpt: str, fetch: bool):
    import torch

    from ssar_tpu.gan.psp import convert_psp, gradual_style_encoder

    blob = torch.load(ckpt, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    params = convert_psp({k: np.asarray(v) for k, v in sd.items()}, stages=50)
    x = np.random.RandomState(0).rand(1, 256, 256, 3).astype(np.float32) * 2 - 1
    ours = np.asarray(gradual_style_encoder(params["encoder"], x, 50))
    _report("psp", ours, None)


def verify_stylegan(ckpt: str, fetch: bool):
    from ssar_tpu.gan.stylegan2 import StyleGAN2Config
    from ssar_tpu.gan.wrapper import StyleGAN2

    G = StyleGAN2(model_file=ckpt, output_size=(1024, 1024))
    w = G.get_w_latents(seeds=[0, 1])
    frames = np.asarray(G.synthesizer(latents=w))
    _report("stylegan", frames, None)


VERIFIERS = {"vggish": verify_vggish, "slowfast_r50": verify_slowfast_r50,
             "resnet50": verify_resnet50, "psp": verify_psp,
             "stylegan": verify_stylegan}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("arch", choices=sorted(VERIFIERS))
    p.add_argument("--ckpt", default=None, help="local checkpoint path")
    p.add_argument("--fetch", action="store_true",
                   help="download via torch.hub / zoo URL (needs egress)")
    args = p.parse_args(argv)
    if args.ckpt:
        digest = _sha256(args.ckpt)
        known = KNOWN_SHA256.get(Path(args.ckpt).name)
        print(f"{Path(args.ckpt).name}: sha256 {digest}"
              + ("" if known is None else f" (expected {known}: "
                 + ("OK" if digest == known else "MISMATCH") + ")"))
        if known is not None and digest != known:
            raise SystemExit("checksum mismatch — refusing to convert")
    VERIFIERS[args.arch](args.ckpt, args.fetch)


if __name__ == "__main__":
    main()
