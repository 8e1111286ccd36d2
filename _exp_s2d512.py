"""Experiment: run the 512px level in s2d form too (d2s handoff to the 1024
level) vs the current full-res conv_transpose+blur path."""
import sys
import time
import jax, jax.numpy as jnp, numpy as np
from ssar_tpu.gan import stylegan2 as sg
from ssar_tpu.gan.s2d import depth_to_space


def synthesis_s2d512(params, latents, noises, config, dtype, prep):
    """Copy of sg.synthesis but every <128-channel level takes the s2d path."""
    B = latents.shape[0]
    x = jnp.broadcast_to(params["const"].astype(dtype), (B,) + params["const"].shape)
    x = sg.styled_conv(params["conv1"], x, latents[:, 0], noises[0], dtype=dtype, prep=prep["conv1"])
    skip = sg.to_rgb(params["to_rgb1"], x, latents[:, 1], dtype=dtype, prep=prep["to_rgb1"])
    i = 1
    for level, (conv_up, conv) in enumerate(zip(params["convs"][::2], params["convs"][1::2])):
        res = 2 ** (level + 3)
        out_ch = conv["weight"].shape[-1]
        if out_ch < 128:  # 512 and 1024 levels both in s2d
            h, rgb_s2d = sg._final_level_s2d(conv_up, conv, params["to_rgbs"][level], x,
                                             latents[:, i], latents[:, i + 1], latents[:, i + 2],
                                             noises[i], noises[i + 1], skip,
                                             config.blur_kernel, dtype, prep=prep["final"][res])
            skip = depth_to_space(rgb_s2d)
            if res == config.resolution:
                i += 2
                break
            x = depth_to_space(h)
            i += 2
            continue
        x = sg.styled_conv(conv_up, x, latents[:, i], noises[i], up=True, dtype=dtype,
                           prep=prep["convs"][2 * level])
        x = sg.styled_conv(conv, x, latents[:, i + 1], noises[i + 1], dtype=dtype,
                           prep=prep["convs"][2 * level + 1])
        skip = sg.to_rgb(params["to_rgbs"][level], x, latents[:, i + 2], skip, dtype=dtype,
                         prep=prep["to_rgbs"][level])
        i += 2
    return skip.astype(jnp.float32)


if sys.argv[1] == "correct":
    # small config where TWO levels qualify for s2d: cm=1, res=512 -> 256:64ch, 512:32ch
    cfg = sg.StyleGAN2Config(resolution=512, channel_multiplier=1)
    params = sg.init_generator(jax.random.PRNGKey(0), cfg)
    prep32 = jax.jit(lambda p: sg.prepare_synthesis(p, cfg, jnp.float32))(params)
    B = 2
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.n_latent, 512))
    noi = [jax.random.normal(jax.random.PRNGKey(i), (B, h, w, 1))
           for i, (h, w) in enumerate(cfg.noise_shapes())]
    a = sg.synthesis(params, lat, noi, cfg, dtype=jnp.float32, prep=prep32)
    b = synthesis_s2d512(params, lat, noi, cfg, jnp.float32, prep32)
    print("levels in s2d:", [2 ** (l + 3) for l, c in enumerate(params["convs"][1::2])
                             if c["weight"].shape[-1] < 128])
    print("max abs diff:", float(jnp.max(jnp.abs(a - b))))
    check_scale()
else:
    cfg = sg.StyleGAN2Config(resolution=1024)
    params = sg.init_generator(jax.random.PRNGKey(0), cfg)
    prep = jax.jit(lambda p: sg.prepare_synthesis(p, cfg, jnp.bfloat16))(params)
    B = 64
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.n_latent, 512))
    noi = [jax.random.normal(jax.random.PRNGKey(i), (B, h, w, 1), jnp.bfloat16)
           for i, (h, w) in enumerate(cfg.noise_shapes())]

    if sys.argv[1] == "base":
        @jax.jit
        def step(p, pre, l, n):
            f = (sg.synthesis(p, l, n, cfg, dtype=jnp.bfloat16, prep=pre) + 1.) / 2.
            return (jnp.clip(f, 0., 1.) * 255. + .5).astype(jnp.uint8)[0, 0, 0, 0]
    else:
        @jax.jit
        def step(p, pre, l, n):
            f = (synthesis_s2d512(p, l, n, cfg, jnp.bfloat16, pre) + 1.) / 2.
            return (jnp.clip(f, 0., 1.) * 255. + .5).astype(jnp.uint8)[0, 0, 0, 0]

    np.asarray(step(params, prep, lat, noi))
    iters = 12
    t0 = time.time(); pend = step(params, prep, lat, noi)
    for _ in range(iters - 1):
        nxt = step(params, prep, lat, noi); np.asarray(pend); pend = nxt
    np.asarray(pend)
    dt = (time.time() - t0) / iters
    print(f"{sys.argv[1]}: {dt*1e3:.1f} ms/batch  {B/dt:.1f} fps")

def check_scale():
    cfg = sg.StyleGAN2Config(resolution=512, channel_multiplier=1)
    params = sg.init_generator(jax.random.PRNGKey(0), cfg)
    prep32 = jax.jit(lambda p: sg.prepare_synthesis(p, cfg, jnp.float32))(params)
    B = 2
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.n_latent, 512))
    noi = [jax.random.normal(jax.random.PRNGKey(i), (B, h, w, 1))
           for i, (h, w) in enumerate(cfg.noise_shapes())]
    a = sg.synthesis(params, lat, noi, cfg, dtype=jnp.float32, prep=prep32)       # current (final s2d)
    plain = sg.synthesis(params, lat, noi, cfg, dtype=jnp.float32, prep=prep32,
                         return_features=True)[0]                                  # return_features disables s2d gate
    b = synthesis_s2d512(params, lat, noi, cfg, jnp.float32, prep32)
    import numpy as np
    print("out scale: max|a| =", float(jnp.max(jnp.abs(a))))
    print("plain vs current:", float(jnp.max(jnp.abs(plain - a))))
    print("plain vs s2d512 :", float(jnp.max(jnp.abs(plain - b))))
