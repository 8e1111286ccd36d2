import jax, jax.numpy as jnp
from ssar_tpu.gan import stylegan2 as sg
from _exp_s2d512 import synthesis_s2d512  # noqa

cfg = sg.StyleGAN2Config(resolution=512, channel_multiplier=1)
params = sg.init_generator(jax.random.PRNGKey(0), cfg)
prep32 = jax.jit(lambda p: sg.prepare_synthesis(p, cfg, jnp.float32))(params)
B = 2
lat = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.n_latent, 512))
noi = [jax.random.normal(jax.random.PRNGKey(i), (B, h, w, 1))
       for i, (h, w) in enumerate(cfg.noise_shapes())]
a = sg.synthesis(params, lat, noi, cfg, dtype=jnp.float32, prep=prep32)
plain = sg.synthesis(params, lat, noi, cfg, dtype=jnp.float32, prep=prep32,
                     return_features=True)[0]
b = synthesis_s2d512(params, lat, noi, cfg, jnp.float32, prep32)
print("out scale: max|a| =", float(jnp.max(jnp.abs(a))))
print("plain vs current:", float(jnp.max(jnp.abs(plain - a))))
print("plain vs s2d512 :", float(jnp.max(jnp.abs(plain - b))))
