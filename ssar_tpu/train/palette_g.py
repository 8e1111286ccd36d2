"""In-environment calibration generator: train the StyleGAN2 synthesis
network so W latents acquire distinct, palette-like visual identity.

Why this exists (docs/STUDY.md r4 diagnosis #1): the study's video scorer
was measurably blind to palette-mixing reactivity when scoring through a
RANDOM-weight G — yet palette mixing is the channel every reactive
paradigm uses, and the one the reference's own metric calibration relies
on (ssar/metrics/generate.py:80-89).  This zero-egress image has no real
pretrained checkpoint (docs/WEIGHTS.md), so we *make* a non-degenerate G:
a short committed training run of the in-repo generator + discriminator
(gan/{stylegan2,discriminator}.py) on procedurally generated structured
color images whose palette is a smooth deterministic function of W.

Design decisions:

- **The mapping network stays frozen at its seeded random init**, so the
  W distribution that every already-trained artifact targets (the record
  grid's reactors, the patch system's palettes, ssopt's palette mapping)
  is unchanged — only the latent->pixel decoder learns.  Freezing needs no
  optimizer masking: W enters the synthesis loss through
  ``stop_gradient``, so mapping gradients are identically zero.
- **Targets are functions of W, not of z** — no inversion of the random
  mapping MLP is needed.  ``u = tanh(2 P w)`` with a fixed seeded
  projection P drives two palette colors, stripe frequency/phase, and a
  blob center; color identity is therefore (squashed-)linear in W, and
  convex palette mixtures (the chroma recipe's einsum,
  metrics/generate.py:high_chroma_correlation) render as intermediate
  palettes — exactly the property the calibration needs the G to have.
- **MSE carries palette identity; a small hinge-adversarial term against
  the in-repo Discriminator (+ R1) sharpens texture.**  The MSE anchor
  keeps the minimax stable at these short horizons.
- The trained G is **narrowed** (``StyleGAN2Config(max_channels=...)``)
  so the checkpoint-of-record is a committable artifact.

TPU shape: one jitted ``lax.scan`` chunk fuses `chunk` (D step, G step)
pairs per device dispatch — the same tunnel-round-trip amortization as
generate/optimize.py's fused driver.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..gan import stylegan2 as sg
from ..gan.discriminator import Discriminator


def target_basis(style_dim: int = 512, seed: int = 123) -> jax.Array:
    """Fixed seeded projection W -> 12 pattern controls."""
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.randn(12, style_dim) / np.sqrt(style_dim), jnp.float32)


def procedural_targets(w: jax.Array, P: jax.Array, size: int = 256) -> jax.Array:
    """W (B, 512) -> structured color images (B, size, size, 3) in [-1, 1].

    Two palette colors, a stripe field (frequency/phase from W) mixing
    them, and a Gaussian blob locally pushing the mix — all smooth in W.
    """
    u = jnp.tanh(2.0 * w @ P.T)  # (B, 12) in (-1, 1)
    c1, c2 = 0.9 * u[:, 0:3], 0.9 * u[:, 3:6]
    fx = 1.0 + 2.0 * (0.5 + 0.5 * u[:, 6])
    fy = 1.0 + 2.0 * (0.5 + 0.5 * u[:, 7])
    ph = jnp.pi * u[:, 8]
    cx, cy = 0.5 + 0.3 * u[:, 9], 0.5 + 0.3 * u[:, 10]
    rad = 0.15 + 0.1 * (0.5 + 0.5 * u[:, 11])
    ys, xs = jnp.meshgrid(jnp.linspace(0.0, 1.0, size), jnp.linspace(0.0, 1.0, size),
                          indexing="ij")
    grid = 2 * jnp.pi * (fx[:, None, None] * xs + fy[:, None, None] * ys) + ph[:, None, None]
    m = 0.5 + 0.5 * jnp.sin(grid)
    blob = jnp.exp(-(((xs - cx[:, None, None]) ** 2 + (ys - cy[:, None, None]) ** 2)
                     / (2 * rad[:, None, None] ** 2)))
    m = jnp.clip(m + blob, 0.0, 1.0)
    return c1[:, None, None, :] * m[..., None] + c2[:, None, None, :] * (1 - m[..., None])


def palette_identity_spread(params: dict, config: sg.StyleGAN2Config, n: int = 16,
                            seed: int = 7) -> float:
    """Mean pairwise distance between the mean colors of n rendered random
    latents.  NOTE: a random-init G already scores high here (it renders
    *varied* colors — they are just not a consistent function of W), so
    this is a diagnostic, not the training criterion; see
    palette_target_alignment."""
    z = jax.random.normal(jax.random.PRNGKey(seed), (n, config.style_dim))
    w = sg.mapping(params, z, config)
    img = sg.synthesis(params, sg.w_to_wplus(w, config), None, config, dtype=jnp.bfloat16)
    mean_col = jnp.mean(img, axis=(1, 2))  # (n, 3)
    d = jnp.linalg.norm(mean_col[:, None] - mean_col[None], axis=-1)
    return float(jnp.sum(d) / (n * (n - 1)))


def palette_target_alignment(params: dict, config: sg.StyleGAN2Config, n: int = 32,
                             seed: int = 7) -> float:
    """Correlation between rendered mean colors and the procedural target's
    mean colors over n random latents — THE property the chroma channel
    needs: color identity as a consistent, predictable function of W.
    ~0 for a random-init G (colors vary but carry no W structure), -> 1 as
    the G learns the palette map."""
    P = target_basis(config.style_dim)
    z = jax.random.normal(jax.random.PRNGKey(seed), (n, config.style_dim))
    w = sg.mapping(params, z, config)
    img = sg.synthesis(params, sg.w_to_wplus(w, config), None, config, dtype=jnp.bfloat16)
    got = np.asarray(jnp.mean(img, axis=(1, 2)), np.float64).ravel()
    want = np.asarray(jnp.mean(procedural_targets(w, P, config.resolution), axis=(1, 2)),
                      np.float64).ravel()
    got = got - got.mean()
    want = want - want.mean()
    denom = np.linalg.norm(got) * np.linalg.norm(want) + 1e-12
    return float(np.dot(got, want) / denom)


def train_calibration_g(config: sg.StyleGAN2Config, n_steps: int = 2000,
                        batch_size: int = 16, lr: float = 2e-3,
                        lambda_adv: float = 0.05, r1_gamma: float = 1.0,
                        seed: int = 0, chunk: int = 25, progress: bool = True):
    """Train synthesis (mapping frozen) to render procedural palette targets.

    Returns (params, d_params, losses) where losses = {"mse": [...],
    "d_loss": [...], "g_adv": [...]} sampled once per step.
    """
    P = target_basis(config.style_dim)
    params = jax.jit(sg.init_generator, static_argnums=1)(jax.random.PRNGKey(seed), config)

    # lambda_adv == 0 -> pure regression: no discriminator is built at all
    # (keeps the CPU test path cheap; the committed run uses the default)
    D = d_params = d_state = None
    d_opt = optax.adam(lr, b1=0.0, b2=0.99)
    if lambda_adv:
        D = Discriminator(resolution=config.resolution, channel_multiplier=1)
        dummy = jnp.zeros((2, config.resolution, config.resolution, 3), jnp.float32)
        d_params = D.init(jax.random.PRNGKey(seed + 1), dummy)
        d_state = d_opt.init(d_params)

    g_opt = optax.adam(lr, b1=0.0, b2=0.99)
    g_state = g_opt.init(params)
    base_key = jax.random.PRNGKey(seed + 2)

    def render(gp, w):
        wp = sg.w_to_wplus(jax.lax.stop_gradient(w), config)  # mapping frozen
        return sg.synthesis(gp, wp, None, config, dtype=jnp.bfloat16)

    def d_step(dp, ds, gp, z, zr):
        w = sg.mapping(gp, z, config)
        fake = jax.lax.stop_gradient(render(gp, w))
        real = procedural_targets(sg.mapping(gp, zr, config), P, config.resolution)

        def loss_fn(dpp):
            d_real = D.apply(dpp, real)
            d_fake = D.apply(dpp, fake)
            loss = jnp.mean(jax.nn.relu(1.0 - d_real)) + jnp.mean(jax.nn.relu(1.0 + d_fake))
            if r1_gamma:
                g_img = jax.grad(lambda im: jnp.sum(D.apply(dpp, im)))(real)
                loss = loss + 0.5 * r1_gamma * jnp.mean(jnp.sum(g_img**2, axis=(1, 2, 3)))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(dp)
        updates, ds = d_opt.update(grads, ds, dp)
        return optax.apply_updates(dp, updates), ds, loss

    def g_step(gp, gs, dp, z):
        def loss_fn(gpp):
            w = sg.mapping(gpp, z, config)
            img = render(gpp, w)
            tgt = procedural_targets(jax.lax.stop_gradient(w), P, config.resolution)
            mse = jnp.mean((img - tgt) ** 2)
            adv = -jnp.mean(D.apply(dp, img)) if lambda_adv else 0.0
            return mse + lambda_adv * adv, (mse, adv)

        (_, (mse, adv)), grads = jax.value_and_grad(loss_fn, has_aux=True)(gp)
        updates, gs = g_opt.update(grads, gs, gp)
        return optax.apply_updates(gp, updates), gs, mse, adv

    @partial(jax.jit, static_argnames="k", donate_argnums=(0, 1, 2, 3))
    def run_chunk(gp, dp, gs, ds, start, k):
        def body(carry, i):
            gp, dp, gs, ds = carry
            key = jax.random.fold_in(base_key, start + i)
            z = jax.random.normal(key, (batch_size, config.style_dim))
            if lambda_adv:
                zr = jax.random.normal(jax.random.fold_in(key, 1),
                                       (batch_size, config.style_dim))
                dp, ds, dl = d_step(dp, ds, gp, z, zr)
            else:
                dl = jnp.zeros(())
            gp, gs, mse, adv = g_step(gp, gs, dp, z)
            return (gp, dp, gs, ds), (mse, dl, adv)

        (gp, dp, gs, ds), (mses, dls, advs) = jax.lax.scan(
            body, (gp, dp, gs, ds), jnp.arange(k))
        return gp, dp, gs, ds, mses, dls, advs

    losses = {"mse": [], "d_loss": [], "g_adv": []}
    it = 0
    while it < n_steps:
        k = min(chunk, n_steps - it)
        params, d_params, g_state, d_state, mses, dls, advs = run_chunk(
            params, d_params, g_state, d_state, it, k)
        losses["mse"] += np.asarray(mses).tolist()
        losses["d_loss"] += np.asarray(dls).tolist()
        losses["g_adv"] += np.asarray(advs).tolist()
        it += k
        if progress:
            print(f"step {it}: mse {losses['mse'][-1]:.4f} d {losses['d_loss'][-1]:.4f} "
                  f"adv {losses['g_adv'][-1]:.4f}", flush=True)
    return params, d_params, losses
