"""SlowFast R50: converter + native forward vs a hand-built torch oracle
(reference ssar/models/slowfast.py:50-189 — facebook-slowfast
SLOWFAST_8x8_R50 + the acav100m LayerSlowFast per-layer extractor)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ssar_tpu.models.convert_extractors import convert_slowfast_r50
from ssar_tpu.models.slowfast_r50 import (SlowFastConfig, SlowFastR50Extractor,
                                          init_random_params, slowfast_embed,
                                          slowfast_features)

# tiny config: same code path as the 8x8 R50, CPU-sized
TINY = SlowFastConfig(alpha=4, beta_inv=4, width=8, depths=(1, 1, 1, 1),
                      fusion_kernel=3, temp_kernels_slow=(1, 1, 3, 3),
                      temp_kernels_fast=(3, 3, 3, 3))


def _build_torch_sd(cfg):
    import torch

    g = torch.Generator().manual_seed(3)

    def t(*shape):
        # fan-in-scaled so activations stay O(1) even through the real
        # 16-block 2048-channel config (fixed scales explode to ~1e26,
        # where float32 noise swamps any parity tolerance)
        fan_in = int(np.prod(shape[1:]))
        return (1.5 / fan_in) ** 0.5 * torch.randn(*shape, generator=g)

    sd = {"s1.pathway0_stem.conv.weight": t(cfg.width, 3, 1, 7, 7),
          "s1.pathway1_stem.conv.weight": t(cfg.fast_width, 3, 5, 7, 7)}

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = 1 + 0.1 * torch.randn(c, generator=g)
        sd[f"{prefix}.bias"] = 0.1 * torch.randn(c, generator=g)
        sd[f"{prefix}.running_mean"] = 0.1 * torch.randn(c, generator=g)
        sd[f"{prefix}.running_var"] = (1 + 0.1 * torch.randn(c, generator=g)).abs()

    add_bn("s1.pathway0_stem.bn", cfg.width)
    add_bn("s1.pathway1_stem.bn", cfg.fast_width)

    f_in, fuse_out = cfg.fast_width, lambda c: c * cfg.fusion_ratio
    sd["s1_fuse.conv_f2s.weight"] = t(fuse_out(f_in), f_in, cfg.fusion_kernel, 1, 1)
    add_bn("s1_fuse.bn", fuse_out(f_in))
    s_in = cfg.width + fuse_out(f_in)
    slow_dims, fast_dims = cfg.stage_dims(0), cfg.stage_dims(1)
    for stage, depth in enumerate(cfg.depths):
        for p in range(2):
            inner, out = (slow_dims if p == 0 else fast_dims)[stage]
            cin = s_in if p == 0 else f_in
            tk = (cfg.temp_kernels_slow if p == 0 else cfg.temp_kernels_fast)[stage]
            for j in range(depth):
                ci = cin if j == 0 else out
                pre = f"s{stage + 2}.pathway{p}_res{j}"
                sd[f"{pre}.branch2.a.weight"] = t(inner, ci, tk, 1, 1)
                add_bn(f"{pre}.branch2.a_bn", inner)
                sd[f"{pre}.branch2.b.weight"] = t(inner, inner, 1, 3, 3)
                add_bn(f"{pre}.branch2.b_bn", inner)
                sd[f"{pre}.branch2.c.weight"] = t(out, inner, 1, 1, 1)
                add_bn(f"{pre}.branch2.c_bn", out)
                if j == 0 and (ci != out or cfg.spatial_strides[stage] > 1):
                    sd[f"{pre}.branch1.weight"] = t(out, ci, 1, 1, 1)
                    add_bn(f"{pre}.branch1_bn", out)
            if p == 0:
                s_in = out
            else:
                f_in = out
        if stage < len(cfg.depths) - 1:
            sd[f"s{stage + 2}_fuse.conv_f2s.weight"] = t(fuse_out(f_in), f_in,
                                                         cfg.fusion_kernel, 1, 1)
            add_bn(f"s{stage + 2}_fuse.bn", fuse_out(f_in))
            s_in = s_in + fuse_out(f_in)
    return sd


def _torch_forward(sd, cfg, slow, fast):
    """Functional torch replica of LayerSlowFast._forward."""
    import torch
    import torch.nn.functional as TF

    def t_bn(h, prefix):
        return TF.batch_norm(h, sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"],
                             sd[f"{prefix}.weight"], sd[f"{prefix}.bias"], training=False)

    def stem(x, p):
        w = sd[f"s1.pathway{p}_stem.conv.weight"]
        kt = w.shape[2]
        h = TF.conv3d(x, w, stride=(1, 2, 2), padding=(kt // 2, 3, 3))
        h = TF.relu(t_bn(h, f"s1.pathway{p}_stem.bn"))
        return TF.max_pool3d(h, (1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1))

    def fuse(s, f, k):
        w = sd[f"s{k}_fuse.conv_f2s.weight"]
        kt = w.shape[2]
        g = TF.conv3d(f, w, stride=(cfg.alpha, 1, 1), padding=(kt // 2, 0, 0))
        g = TF.relu(t_bn(g, f"s{k}_fuse.bn"))
        return torch.cat([s, g], dim=1)

    def block(x, pre, stride):
        st = (1, stride, stride)
        if f"{pre}.branch1.weight" in sd:
            sc = t_bn(TF.conv3d(x, sd[f"{pre}.branch1.weight"], stride=st),
                      f"{pre}.branch1_bn")
        else:
            sc = x
        wa = sd[f"{pre}.branch2.a.weight"]
        h = TF.relu(t_bn(TF.conv3d(x, wa, padding=(wa.shape[2] // 2, 0, 0)),
                         f"{pre}.branch2.a_bn"))
        h = TF.relu(t_bn(TF.conv3d(h, sd[f"{pre}.branch2.b.weight"], stride=st,
                                   padding=(0, 1, 1)), f"{pre}.branch2.b_bn"))
        h = t_bn(TF.conv3d(h, sd[f"{pre}.branch2.c.weight"]), f"{pre}.branch2.c_bn")
        return TF.relu(h + sc)

    def get_pool(s, f):
        # LayerSlowFast.get_pool (slowfast.py:166-174)
        sp, fp = s.mean((3, 4)), f.mean((3, 4))  # BCT
        sp = TF.interpolate(sp, size=fp.shape[2])  # nearest
        return torch.cat([sp, fp], 1).permute(0, 2, 1)  # BTC

    s, f = stem(slow, 0), stem(fast, 1)
    s = fuse(s, f, 1)
    feats = [get_pool(s, f)]
    for stage, depth in enumerate(cfg.depths):
        for p in range(2):
            x = s if p == 0 else f
            for j in range(depth):
                x = block(x, f"s{stage + 2}.pathway{p}_res{j}",
                          cfg.spatial_strides[stage] if j == 0 else 1)
            if p == 0:
                s = x
            else:
                f = x
        if stage < len(cfg.depths) - 1:
            s = fuse(s, f, stage + 2)
        feats.append(get_pool(s, f))
    return feats


def test_slowfast_r50_matches_torch_forward():
    import torch

    cfg = TINY
    sd = _build_torch_sd(cfg)
    T, H = 8, 32
    x = np.random.RandomState(0).rand(2, T, H, H, 3).astype(np.float32) * 2 - 1
    fast_t = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    slow_t = fast_t[:, :, :: cfg.alpha]
    ref = _torch_forward(sd, cfg, slow_t, fast_t)

    params = convert_slowfast_r50({k: v.numpy() for k, v in sd.items()})
    ours = slowfast_features(params, jnp.asarray(x[:, :: cfg.alpha]), jnp.asarray(x), cfg)

    assert len(ours) == len(ref) == 5
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), atol=3e-4, rtol=3e-3)


@pytest.mark.slow
def test_slowfast_r50_full_width_matches_torch_forward():
    """Full-width converter parity (VERDICT r2 item 6): the real
    SLOWFAST_8x8_R50 config — width 64, depths (3, 4, 6, 3), alpha 4,
    channels up to 2048 — against the torch oracle. Spatial size reduced
    to 64px so the CPU oracle stays tractable; every layer runs its real
    channel widths and temporal kernels."""
    import torch

    cfg = SlowFastConfig()
    sd = _build_torch_sd(cfg)
    T, H = 32, 64
    x = np.random.RandomState(0).rand(1, T, H, H, 3).astype(np.float32) * 2 - 1
    fast_t = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    slow_t = fast_t[:, :, :: cfg.alpha]
    ref = _torch_forward(sd, cfg, slow_t, fast_t)

    params = convert_slowfast_r50({k: v.numpy() for k, v in sd.items()})
    ours = slowfast_features(params, jnp.asarray(x[:, :: cfg.alpha]), jnp.asarray(x), cfg)

    assert [f.shape[-1] for f in ours] == [88, 352, 704, 1408, 2304]
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), atol=2e-3, rtol=1e-2)


@pytest.mark.slow
def test_slowfast_r50_full_config_dims():
    """The real 8x8 R50 config produces LayerSlowFast's documented dims
    [88, 352, 704, 1408, 2304] (slowfast.py:147 output_dims)."""
    cfg = SlowFastConfig()
    params = init_random_params(0, cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 64, 64, 3).astype(np.float32))
    feats = slowfast_features(params, x[:, :: cfg.alpha], x, cfg)
    assert [f.shape[-1] for f in feats] == [88, 352, 704, 1408, 2304]
    assert all(f.shape[1] == 32 for f in feats)  # fast frame rate everywhere
    emb = slowfast_embed(params, x[:, :: cfg.alpha], x, cfg)
    assert emb.shape == (1, 2304) and np.isfinite(np.asarray(emb)).all()


def test_slowfast_r50_extractor_surface():
    ex = SlowFastR50Extractor(config=TINY, clip_len=8)
    video = np.random.RandomState(0).rand(20, 3, 32, 32).astype(np.float32)  # NCHW ok
    feats = ex(video)
    assert len(feats) == 5
    assert all(f.shape[0] == feats[0].shape[0] for f in feats)
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)
