"""pixel2style2pixel: converter + native forward vs a hand-built torch
oracle (the test pattern of test_extended.py's resnet50 parity test).

Reference architecture: ssar/models/pixel2style2pixel.py — GradualStyleEncoder
(:57-135), IntoW/IntoWPlus variants (:137-194), IR-SE bottlenecks (:360-419),
pSp wrapper (:203-317).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ssar_tpu.gan.psp import (ENCODERS, adaptive_avg_pool, convert_psp,
                              gradual_style_encoder, init_random_params,
                              invert_frames, psp_apply, stage_units)

# tiny IR config: stage 1 keeps in==depth (maxpool shortcut path),
# the rest exercise conv shortcuts
STAGES = ((8, 8, 1), (8, 12, 1), (12, 16, 1), (16, 24, 1))


def _build_torch_sd(n_styles=8, style_dim=16, input_res=32, wplus=False, stages=None):
    import torch

    stages = STAGES if stages is None else stages
    c0 = stages[0][0]
    g = torch.Generator().manual_seed(7)

    def t(*shape, scale=0.2):
        return scale * torch.randn(*shape, generator=g)

    sd = {"encoder.input_layer.0.weight": t(c0, 3, 3, 3),
          "encoder.input_layer.2.weight": 0.25 + 0.05 * torch.randn(c0, generator=g)}

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = 1 + 0.1 * torch.randn(c, generator=g)
        sd[f"{prefix}.bias"] = 0.1 * torch.randn(c, generator=g)
        sd[f"{prefix}.running_mean"] = 0.1 * torch.randn(c, generator=g)
        sd[f"{prefix}.running_var"] = (1 + 0.1 * torch.randn(c, generator=g)).abs()

    add_bn("encoder.input_layer.1", c0)
    for i, (in_c, depth, _) in enumerate(stage_units(stages)):
        pre = f"encoder.body.{i}"
        add_bn(f"{pre}.res_layer.0", in_c)
        sd[f"{pre}.res_layer.1.weight"] = t(depth, in_c, 3, 3)
        sd[f"{pre}.res_layer.2.weight"] = 0.25 + 0.05 * torch.randn(depth, generator=g)
        sd[f"{pre}.res_layer.3.weight"] = t(depth, depth, 3, 3)
        add_bn(f"{pre}.res_layer.4", depth)
        mid = max(1, depth // 16)
        sd[f"{pre}.res_layer.5.fc1.weight"] = t(mid, depth, 1, 1)
        sd[f"{pre}.res_layer.5.fc2.weight"] = t(depth, mid, 1, 1)
        if in_c != depth:
            sd[f"{pre}.shortcut_layer.0.weight"] = t(depth, in_c, 1, 1)
            add_bn(f"{pre}.shortcut_layer.1", depth)

    c3d = stages[-1][1]
    if wplus:
        add_bn("encoder.output_layer_2.0", c3d)
        sd["encoder.output_layer_2.3.weight"] = t(style_dim, c3d * 7 * 7)
        sd["encoder.output_layer_2.3.bias"] = t(style_dim)
        sd["encoder.linear.weight"] = t(style_dim * n_styles, style_dim, scale=1.0)
        sd["encoder.linear.bias"] = t(style_dim * n_styles)
        return sd

    # GradualStyleBlock heads: spatial = input_res / {16, 8, 4}
    for j in range(n_styles):
        sp = input_res // 16 if j < 3 else input_res // 8 if j < 7 else input_res // 4
        for k in range(int(np.log2(sp))):
            cin = c3d if k == 0 else style_dim
            sd[f"encoder.styles.{j}.convs.{2 * k}.weight"] = t(style_dim, cin, 3, 3)
            sd[f"encoder.styles.{j}.convs.{2 * k}.bias"] = t(style_dim)
        sd[f"encoder.styles.{j}.linear.weight"] = t(style_dim, style_dim, scale=1.0)
        sd[f"encoder.styles.{j}.linear.bias"] = t(style_dim)
    sd["encoder.latlayer1.weight"] = t(c3d, stages[2][1], 1, 1)
    sd["encoder.latlayer1.bias"] = t(c3d)
    sd["encoder.latlayer2.weight"] = t(c3d, stages[1][1], 1, 1)
    sd["encoder.latlayer2.bias"] = t(c3d)
    return sd


def _torch_body(sd, x, stages=None):
    """Functional torch forward of the shared IR-SE stem + body; returns
    the three scale taps (c1, c2, c3) = ends of stages 2, 3, 4."""
    import torch
    import torch.nn.functional as TF

    stages = STAGES if stages is None else stages
    ends = []
    i = -1
    for _, _, n in stages:
        i += n
        ends.append(i)

    def t_bn(h, prefix):
        return TF.batch_norm(h, sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"],
                             sd[f"{prefix}.weight"], sd[f"{prefix}.bias"], training=False)

    h = TF.conv2d(x, sd["encoder.input_layer.0.weight"], padding=1)
    h = TF.prelu(t_bn(h, "encoder.input_layer.1"), sd["encoder.input_layer.2.weight"])
    taps = []
    for i, (in_c, depth, stride) in enumerate(stage_units(stages)):
        pre = f"encoder.body.{i}"
        if in_c == depth:
            sc = TF.max_pool2d(h, 1, stride)
        else:
            sc = t_bn(TF.conv2d(h, sd[f"{pre}.shortcut_layer.0.weight"], stride=stride),
                      f"{pre}.shortcut_layer.1")
        r = t_bn(h, f"{pre}.res_layer.0")
        r = TF.prelu(TF.conv2d(r, sd[f"{pre}.res_layer.1.weight"], padding=1),
                     sd[f"{pre}.res_layer.2.weight"])
        r = t_bn(TF.conv2d(r, sd[f"{pre}.res_layer.3.weight"], stride=stride, padding=1),
                 f"{pre}.res_layer.4")
        s = r.mean(dim=(2, 3), keepdim=True)
        s = TF.relu(TF.conv2d(s, sd[f"{pre}.res_layer.5.fc1.weight"]))
        s = torch.sigmoid(TF.conv2d(s, sd[f"{pre}.res_layer.5.fc2.weight"]))
        h = r * s + sc
        taps.append(h)
    return taps[ends[1]], taps[ends[2]], taps[ends[3]]


def _torch_gradual_forward(sd, x, n_styles, stages=None):
    """Torch oracle of the full GradualStyleEncoder (body + FPN + map2style
    heads, pixel2style2pixel.py:57-135)."""
    import torch
    import torch.nn.functional as TF

    c1, c2, c3 = _torch_body(sd, x, stages)

    def style_block(j, f):
        k = 0
        while f"encoder.styles.{j}.convs.{k}.weight" in sd:
            f = TF.leaky_relu(TF.conv2d(f, sd[f"encoder.styles.{j}.convs.{k}.weight"],
                                        sd[f"encoder.styles.{j}.convs.{k}.bias"],
                                        stride=2, padding=1), 0.01)
            k += 2
        f = f.reshape(f.size(0), -1)
        scale = 1.0 / np.sqrt(f.size(1))
        return TF.linear(f, sd[f"encoder.styles.{j}.linear.weight"] * scale,
                         sd[f"encoder.styles.{j}.linear.bias"])

    lat = [style_block(j, c3) for j in range(3)]
    p2 = (TF.interpolate(c3, size=c2.shape[2:], mode="bilinear", align_corners=True)
          + TF.conv2d(c2, sd["encoder.latlayer1.weight"], sd["encoder.latlayer1.bias"]))
    lat += [style_block(j, p2) for j in range(3, 7)]
    p1 = (TF.interpolate(p2, size=c1.shape[2:], mode="bilinear", align_corners=True)
          + TF.conv2d(c1, sd["encoder.latlayer2.weight"], sd["encoder.latlayer2.bias"]))
    lat += [style_block(j, p1) for j in range(7, n_styles)]
    return torch.stack(lat, dim=1).numpy()


def test_psp_gradual_encoder_matches_torch_forward():
    import torch

    n_styles, style_dim = 8, 16
    sd = _build_torch_sd(n_styles, style_dim)
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1

    ref = _torch_gradual_forward(sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), n_styles)

    params = convert_psp({k: v.numpy() for k, v in sd.items()}, stages=STAGES)
    ours = np.asarray(gradual_style_encoder(params["encoder"], jnp.asarray(x), STAGES))

    assert ours.shape == (2, n_styles, style_dim)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_psp_ir_se50_full_width_matches_torch_forward():
    """Full-width converter parity (VERDICT r2 item 6): the real IR-SE-50
    trunk (64->512 channels, 3/4/14/3 units) with 18 512-dim style heads.
    Spatial size is reduced to 64px to keep the CPU oracle tractable; every
    layer runs its real channel widths."""
    import torch

    from ssar_tpu.gan.psp import IR_STAGES

    stages, n_styles, style_dim = IR_STAGES[50], 18, 512
    sd = _build_torch_sd(n_styles, style_dim, input_res=64, stages=stages)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 2 - 1

    ref = _torch_gradual_forward(sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                                 n_styles, stages)

    params = convert_psp({k: v.numpy() for k, v in sd.items()}, stages=stages)
    ours = np.asarray(gradual_style_encoder(params["encoder"], jnp.asarray(x), stages))

    assert ours.shape == (1, n_styles, style_dim)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=5e-3)


def test_psp_wplus_encoder_matches_torch_forward():
    import torch
    import torch.nn.functional as TF

    n_styles, style_dim = 5, 16
    sd = _build_torch_sd(n_styles, style_dim, wplus=True)
    x = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1

    c3 = _torch_body(sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))[-1]
    h = TF.batch_norm(c3, sd["encoder.output_layer_2.0.running_mean"],
                      sd["encoder.output_layer_2.0.running_var"],
                      sd["encoder.output_layer_2.0.weight"],
                      sd["encoder.output_layer_2.0.bias"], training=False)
    h = TF.adaptive_avg_pool2d(h, (7, 7)).reshape(2, -1)
    h = TF.linear(h, sd["encoder.output_layer_2.3.weight"], sd["encoder.output_layer_2.3.bias"])
    h = TF.linear(h, sd["encoder.linear.weight"] / np.sqrt(style_dim), sd["encoder.linear.bias"])
    ref = h.reshape(2, n_styles, style_dim).numpy()

    params = convert_psp({k: v.numpy() for k, v in sd.items()}, stages=STAGES)
    ours = np.asarray(
        ENCODERS["BackboneEncoderUsingLastLayerIntoWPlus"](params["encoder"], jnp.asarray(x), STAGES))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_adaptive_avg_pool_matches_torch():
    import torch
    import torch.nn.functional as TF

    for h in (2, 15, 16, 28):
        x = np.random.RandomState(h).rand(1, h, h, 3).astype(np.float32)
        ref = TF.adaptive_avg_pool2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), (7, 7))
        ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), 7))
        np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref.numpy(),
                                   atol=1e-6, rtol=1e-5)


def test_psp_full_forward_and_masking():
    import jax

    from ssar_tpu.gan.stylegan2 import StyleGAN2Config, init_generator

    cfg = StyleGAN2Config(resolution=64)
    enc = init_random_params(stages=STAGES, n_styles=cfg.n_latent, input_res=32)
    params = {"encoder": enc, "decoder": init_generator(jax.random.PRNGKey(0), cfg),
              "latent_avg": 0.1 * np.ones((cfg.n_latent, 512), np.float32)}
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)

    frames, codes = psp_apply(params, x, cfg, stages=STAGES)
    assert frames.shape == (2, 64, 64, 3) and codes.shape == (2, cfg.n_latent, 512)
    assert np.isfinite(np.asarray(frames)).all()

    inj = jnp.asarray(np.random.RandomState(1).randn(2, cfg.n_latent, 512).astype(np.float32))
    _, mixed = psp_apply(params, x, cfg, stages=STAGES,
                         latent_mask=[0, 1], inject_latent=inj, alpha=0.5)
    np.testing.assert_allclose(np.asarray(mixed[:, 0]),
                               np.asarray(0.5 * inj[:, 0] + 0.5 * codes[:, 0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mixed[:, 2]), np.asarray(codes[:, 2]), rtol=1e-5)

    _, zeroed = psp_apply(params, x, cfg, stages=STAGES, latent_mask=[3])
    assert np.abs(np.asarray(zeroed[:, 3])).max() == 0.0


def test_invert_frames_chunking():
    enc = init_random_params(stages=STAGES, n_styles=8, input_res=32, style_dim=16)
    params = {"encoder": enc, "latent_avg": np.zeros((8, 16), np.float32)}
    frames = jnp.asarray(np.random.RandomState(0).rand(7, 32, 32, 3).astype(np.float32))
    w = invert_frames(params, frames, stages=STAGES, batch_size=4)
    assert w.shape == (7, 8, 16)
    # chunk padding must not leak: per-frame encode is batch-independent
    w_single = invert_frames(params, frames, stages=STAGES, batch_size=1)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_single), atol=1e-5, rtol=1e-4)
