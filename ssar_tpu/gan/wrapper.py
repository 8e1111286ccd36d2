"""maua-equivalent StyleGAN2 wrapper API (SURVEY.md §2.9).

Provides the call-surface the reference builds everything on:

- ``StyleGAN2Mapper(model_file)``: z -> W+  (maua usage: ssar/train.py:239-243)
- ``StyleGAN2Synthesizer(model_file, output_size, strategy, layer)``: callable
  with ``latents=(B, n_ws, 512)`` and ``noise0..noiseN`` kwargs
  (ssar/supervised/test.py:560-584)
- ``StyleGAN2``: mapper + synthesizer + ``get_w_latents`` + streaming
  ``render`` (ssar/comparison.py:48-52)
- ``make_noise_pyramid``: resize a base noise video to every layer size
  (ssar/metrics/rhythmic.py:152-154)

`model_file` may be a rosinality ``.pt`` (converted via gan/convert.py), an
``.npz`` of our native param pytree, or ``None`` for random init.  Noise
tensors are accepted in the reference's NCHW (B, 1, H, W) layout and moved
to NHWC internally.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import stylegan2 as sg


def _nchw_to_nhwc(n):
    return jnp.transpose(jnp.asarray(n), (0, 2, 3, 1))


def load_params(model_file: str | None, config: sg.StyleGAN2Config, seed: int = 0):
    if model_file is None:
        # ONE jitted init program: eager init dispatches hundreds of small
        # individually-compiled ops, which costs minutes on a remote-compile
        # runtime (config is a frozen dataclass, so it can be static)
        return jax.jit(sg.init_generator, static_argnums=1)(jax.random.PRNGKey(seed), config)
    if str(model_file).endswith(".pt"):
        from .convert import load_rosinality_pt

        return load_rosinality_pt(model_file, config)
    if str(model_file).endswith(".npz"):
        from .convert import load_npz

        return load_npz(model_file)
    if str(model_file).endswith(".pkl"):
        from .convert import load_nvidia_pkl

        return load_nvidia_pkl(model_file, config)
    raise ValueError(f"unsupported checkpoint format: {model_file}")


class StyleGAN2Mapper:
    """z (B, 512) -> W+ (B, n_latent, 512)."""

    def __init__(self, model_file: str | None = None, inference: bool = False,
                 config: sg.StyleGAN2Config | None = None, seed: int = 0):
        self.config = config or sg.StyleGAN2Config()
        self.params = load_params(model_file, self.config, seed)
        self._fwd = jax.jit(lambda p, z: sg.w_to_wplus(sg.mapping(p, z, self.config), self.config))

    def __call__(self, z) -> jax.Array:
        return self._fwd(self.params, jnp.asarray(z, dtype=jnp.float32))

    def mean_latent(self, n_samples: int = 4096, seed: int = 0) -> jax.Array:
        """Monte-Carlo mean W+ latent — the truncation anchor (reference
        ssar/models/stylegan2.py:552-556 `truncation_latent`)."""
        z = jax.random.normal(jax.random.PRNGKey(seed), (n_samples, self.config.style_dim))
        return self._fwd(self.params, z).mean(axis=0, keepdims=True)


class StyleGAN2Synthesizer:
    """W+ latents + noise pyramid -> frames.

    `strategy="stretch"` with an `output_size` below the native resolution
    early-exits the synthesis network at the nearest power of two and
    bilinearly resizes to the target (TPU-friendly preview path); at native
    size it is exact.
    """

    def __init__(self, model_file: str | None = None, inference: bool = False,
                 output_size: tuple[int, int] | None = None, strategy: str = "stretch",
                 layer: int = 0, config: sg.StyleGAN2Config | None = None, seed: int = 0,
                 dtype=jnp.bfloat16):
        self.config = config or sg.StyleGAN2Config()
        self.params = load_params(model_file, self.config, seed)
        self.output_size = output_size
        self.dtype = dtype

        native = self.config.resolution
        if output_size is None:
            self.synth_res = native
        else:
            m = max(output_size)
            self.synth_res = min(native, 1 << int(np.ceil(np.log2(max(m, 4)))))

        self.bends: dict = {}
        self.bend_mods: dict = {}  # level -> full-track (T, ...) modulation
        # weight-derived synthesis constants (scaled/cast/s2d-composed
        # kernels, demod Grams): per-checkpoint work hoisted out of the hot
        # program (prepare_synthesis docstring; ~90 ms/step at 1024px)
        self._prep = jax.jit(lambda p: sg.prepare_synthesis(p, self.config, self.dtype))(self.params)
        self._fwd = self._make_fwd()

    def _make_fwd(self):
        bends = dict(self.bends)  # captured at trace time; set_bends re-jits

        @partial(jax.jit, static_argnames=())
        def _fwd(params, prep, latents, noises, bend_mods):
            img = sg.synthesis(params, latents, noises, self.config, dtype=self.dtype,
                               output_size=self.synth_res, bends=bends,
                               bend_mods=bend_mods, prep=prep)
            if self.output_size is not None and (img.shape[1], img.shape[2]) != tuple(self.output_size[::-1]):
                h, w = self.output_size[1], self.output_size[0]
                img = jax.image.resize(img, (img.shape[0], h, w, 3), method="bilinear")
            return img

        return _fwd

    def set_bends(self, bends) -> None:
        """Install network bends: either a {level: transform} dict or the
        reference's list of {"layer": int, "transform": callable[,
        "modulation": (T, ...) array]} (ssar/patches/examples/01_intro.py:
        101-107).  Transforms are traceable NHWC functions applied to that
        feature level's activations; with a "modulation" array the transform
        is called as ``transform(x, modulation[frames])`` and the caller
        passes ``frame_idx`` per batch (animated bends,
        tauceti.py:93-140)."""
        mods = {}
        if isinstance(bends, (list, tuple)):
            mods = {int(b["layer"]): jnp.asarray(b["modulation"], jnp.float32)
                    for b in bends if b.get("modulation") is not None}
            bends = {int(b["layer"]): b["transform"] for b in bends}
        self.bends = dict(bends or {})
        self.bend_mods = mods
        self._fwd = self._make_fwd()

    @property
    def n_noises_used(self) -> int:
        """Number of noise layers actually consumed at the synthesis resolution."""
        log = int(np.log2(self.synth_res))
        return (log - 2) * 2 + 1

    def __call__(self, latents, params=None, frame_idx=None, prep=None, **noise_kwargs) -> jax.Array:
        """latents (B, n_ws, 512); noise via noise0..noiseN kwargs (NCHW) or
        `noises=[...]`. Returns (B, H, W, 3) in [-1, 1] (unclamped).

        `params` overrides the stored weights — pass it when calling from
        inside an outer jit so the weights are traced arguments rather than
        120 MB of embedded HLO constants (see generate/sample.py).  When
        overriding, pass the matching `prep` (synthesizer._prep for the
        stored weights) or the per-call kernel preparation is recomputed.

        `frame_idx` (B,) absolute frame numbers of this batch — required
        only when animated bends (set_bends with "modulation") are
        installed; each bend gets modulation[frame_idx] as a traced arg."""
        latents = jnp.asarray(latents, jnp.float32)
        mod_chunks = {}
        if self.bend_mods:
            if frame_idx is None:
                frame_idx = jnp.arange(latents.shape[0])
            fi = jnp.asarray(frame_idx)
            mod_chunks = {lvl: m[jnp.clip(fi, 0, m.shape[0] - 1)]
                          for lvl, m in self.bend_mods.items()}
        noises = noise_kwargs.pop("noises", None)
        if noises is None and noise_kwargs:
            idx = sorted(int(k.replace("noise", "")) for k in noise_kwargs)
            noises = [_nchw_to_nhwc(noise_kwargs[f"noise{i}"]) for i in idx]
        if noises is not None:
            # store noise in the synthesis dtype: it is cast there anyway,
            # and bf16 pyramids halve their HBM reads (220 -> 240 fps at
            # 1024px B=64 measured; noise is random texture)
            # None entries (patch returned no noise for that scale) fall
            # through to the synthesizer's stored per-layer noise
            noises = [jnp.asarray(n, self.dtype) if n is not None else None for n in noises]
            n_used = self.n_noises_used
            noises = list(noises[:n_used]) + [None] * max(0, n_used - len(noises))
            pad = [None] * (self.config.num_layers - len(noises))
            noises = noises + pad
        if params is None:
            params, prep = self.params, self._prep
        return self._fwd(params, prep, latents, noises, mod_chunks)


class StyleGAN2:
    """Combined wrapper mirroring maua's `StyleGAN2` (SURVEY.md §2.9)."""

    def __init__(self, model_file: str | None = None, inference: bool = False,
                 output_size: tuple[int, int] | None = None, strategy: str = "stretch",
                 layer: int = 0, config: sg.StyleGAN2Config | None = None, seed: int = 0):
        self.config = config or sg.StyleGAN2Config()
        self.mapper = StyleGAN2Mapper(model_file, config=self.config, seed=seed)
        self.synthesizer = StyleGAN2Synthesizer(model_file, output_size=output_size,
                                                strategy=strategy, layer=layer,
                                                config=self.config, seed=seed)
        # share params between mapper and synthesizer (avoid double load)
        self.synthesizer.params = self.mapper.params

    def get_w_latents(self, seeds) -> jax.Array:
        if isinstance(seeds, str):
            seeds = [int(s) for s in seeds.split(",")]
        zs = jnp.stack([jax.random.normal(jax.random.PRNGKey(s), (self.config.style_dim,)) for s in seeds])
        return self.mapper(zs)

    def render(self, inputs, batch_size: int = 8, postprocess_fn=None):
        """Streaming frame generator over (latents, noises) inputs.

        `inputs`: dict with "latents" (T, n_ws, 512) and optional "noise"
        list of (T, 1, H, W).  Yields uint8-ready f32 frames in [0, 1].
        """
        latents = jnp.asarray(inputs["latents"], jnp.float32)
        noise_seq = inputs.get("noise")
        T = latents.shape[0]

        def _pad(x):  # static-shape pad so every batch hits one compiled shape
            if x.shape[0] < batch_size:
                x = jnp.concatenate([x, jnp.repeat(x[-1:], batch_size - x.shape[0], axis=0)])
            return x

        def synth(i):
            L = _pad(latents[i : i + batch_size])
            kw = {}
            if noise_seq is not None:
                kw["noises"] = [_nchw_to_nhwc(_pad(n[i : i + batch_size])) for n in noise_seq]
            frames = (self.synthesizer(L, **kw) + 1.0) / 2.0
            frames = jnp.clip(frames, 0.0, 1.0)
            if postprocess_fn is not None:
                frames = postprocess_fn(frames)
            return frames

        # double buffer: batch i+1 synthesises on device while batch i is
        # fetched and consumed on the host (SURVEY.md §7 choreography)
        starts = list(range(0, T, batch_size))
        if not starts:
            return
        pending = synth(starts[0])
        for j, i in enumerate(starts):
            nxt = synth(starts[j + 1]) if j + 1 < len(starts) else None
            host = np.asarray(pending)
            for f in host[: min(batch_size, T - i)]:
                yield f
            pending = nxt


def make_noise_pyramid(noise, layers: int | None = None, config: sg.StyleGAN2Config | None = None):
    """(T, 1, H, W) base noise -> list of per-layer (T, 1, h, w) resized noises
    (maua API; used by ssar/metrics/rhythmic.py:152-154)."""
    config = config or sg.StyleGAN2Config()
    noise = jnp.asarray(noise, jnp.float32)
    shapes = config.noise_shapes()
    if layers is not None:
        shapes = shapes[:layers]
    out = []
    for h, w in shapes:
        n = jax.image.resize(noise, (noise.shape[0], noise.shape[1], h, w), method="bilinear")
        std = jnp.std(n) + 1e-8
        out.append(n / std)
    return out
