"""Lazily-evaluated noise-module algebra for patch composition.

Equivalent of ssar/random/noise.py:4-140: noise for each StyleGAN2 layer is
a small expression tree (Loop / Blend / Multiply composed by Average /
Modulate / ScaleBias) evaluated per render chunk — only ``(i, b)`` frame
windows are ever materialised, so a full-track 1024x1024 noise video never
exists in memory.  Randomness is jax.random key-threaded.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _win(x: jax.Array, i, b: int) -> jax.Array:
    """Length-``b`` window of ``x`` starting at ``i`` along axis 0.

    ``i`` may be a tracer (the whole per-chunk render — noise tree +
    synthesis — is traced as ONE program; see generate/sample.py), so this
    is a dynamic_slice, not python slicing.  ``b`` must be static.  Out-of
    -range starts clamp (XLA semantics); render loops keep i <= length-b."""
    return jax.lax.dynamic_slice_in_dim(x, i, b, axis=0)


class Noise:
    def __init__(self, length: int, size: tuple[int, int]):
        self.length = length
        self.size = size

    def __call__(self, i: int, b: int) -> jax.Array:
        raise NotImplementedError

    def forward(self, i: int, b: int) -> jax.Array:  # torch-style alias
        return self(i, b)


class Blend(Noise):
    """Two fixed noise banks mixed by the modulating feature (noise.py:11-27)."""

    def __init__(self, key, length, size, modulator):
        super().__init__(length, size)
        self.noise = jax.random.normal(key, (2, modulator.shape[1], size[0], size[1]))
        self.modulator = modulator  # (T, M)

    def __call__(self, i, b):
        mod = _win(self.modulator, i, b).reshape(-1, self.modulator.shape[1])
        left = jnp.einsum("MHW,BM->BHW", self.noise[0], mod)
        right = jnp.einsum("MHW,BM->BHW", self.noise[1], 1 - mod)
        return left + right


class Multiply(Noise):
    def __init__(self, key, length, size, modulator):
        super().__init__(length, size)
        self.noise = jax.random.normal(key, (modulator.shape[1], size[0], size[1]))
        self.modulator = modulator

    def __call__(self, i, b):
        mod = _win(self.modulator, i, b).reshape(-1, self.modulator.shape[1])
        return jnp.einsum("MHW,BM->BHW", self.noise, mod)


class Loop(Noise):
    """Smoothly looping procedural noise (noise.py:43-56)."""

    def __init__(self, key, length, size, n_loops: float = 1.0, sigma: float = 5.0):
        super().__init__(length, size)
        self.sigma = sigma
        self.noise = jax.random.normal(key, (3, size[0], size[1]))
        self.idx = jnp.linspace(0, float(n_loops) * 2 * jnp.pi, length)

    def __call__(self, i, b):
        freqs = jnp.cos(_win(self.idx, i, b)[:, None, None] + self.noise[0:1]) / (self.sigma / 50)
        out = jnp.sin(freqs + self.noise[1:2]) * self.noise[2:3]
        rms = jnp.sqrt(jnp.mean(out**2, axis=(1, 2), keepdims=True))
        return out / (rms + jnp.finfo(out.dtype).eps)


class Average(Noise):
    def __init__(self, left, right):
        super().__init__(left.length, left.size)
        self.left, self.right = left, right

    def __call__(self, i, b):
        return (self.left(i, b) + self.right(i, b)) / 2


class Modulate(Noise):
    def __init__(self, left, right, modulator):
        super().__init__(left.length, left.size)
        self.left, self.right = left, right
        self.modulator = jnp.mean(modulator, axis=1)  # (T,)

    def __call__(self, i, b):
        mod = _win(self.modulator, i, b)[:, None, None]
        return self.left(i, b) * mod + self.right(i, b) * (1 - mod)


class ScaleBias(Noise):
    def __init__(self, base, scale: float, bias: float):
        super().__init__(base.length, base.size)
        self.base, self.scale, self.bias = base, scale, bias

    def __call__(self, i, b):
        return self.scale * self.base(i, b) + self.bias


# Noise trees are registered as pytrees so a whole expression tree can be a
# jit ARGUMENT (generate/sample.py passes the per-layer modules straight into
# the fused chunk program).  Without this the banks — up to (2, M, 1024,
# 1024) f32 on the top layers — would be embedded in the HLO as constants,
# which bloats the program past what compile services accept and duplicates
# HBM.  Numeric fields are children (tracers; value changes don't retrace),
# structure is aux data.
def _register(cls, leaf_fields: tuple, child_fields: tuple = ()):
    fields = leaf_fields + child_fields

    def flatten(m):
        return tuple(getattr(m, f) for f in fields), (m.length, m.size)

    def unflatten(aux, children):
        m = cls.__new__(cls)
        m.length, m.size = aux
        for f, v in zip(fields, children):
            setattr(m, f, v)
        return m

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


_register(Blend, ("noise", "modulator"))
_register(Multiply, ("noise", "modulator"))
_register(Loop, ("noise", "idx", "sigma"))
_register(Average, (), ("left", "right"))
_register(Modulate, ("modulator",), ("left", "right"))
_register(ScaleBias, ("scale", "bias"), ("base",))


NOISE_DEPTH_RANGES = {
    "low": range(0, 6), "mid": range(6, 12), "high": range(12, 17),
    "lowmid": range(0, 12), "midhigh": range(6, 17), "all": range(0, 17),
}


def noise_patch(key, noise, features, tempo, fps, *, patch_type, loop_bars, seq_feat,
                seq_feat_weight, mod_feat, mod_feat_weight, merge_type, merge_depth,
                noise_mean, noise_std):
    """Compose one random noise subpatch over the chosen layer band
    (ssar/random/noise.py:89-140)."""
    lays = NOISE_DEPTH_RANGES[merge_depth]
    feature = seq_feat_weight * features[seq_feat]

    for n in lays:
        key, sub = jax.random.split(key)
        if patch_type == "blend":
            new_noise = Blend(sub, feature.shape[0], noise[n].size, feature)
        elif patch_type == "multiply":
            new_noise = Multiply(sub, feature.shape[0], noise[n].size, feature)
        elif patch_type == "loop":
            n_loops = feature.shape[0] / fps / 60 / tempo / 4 / loop_bars
            new_noise = Loop(sub, feature.shape[0], noise[n].size, n_loops=float(n_loops))
        else:
            raise ValueError(patch_type)

        if merge_type == "average":
            noise[n] = Average(noise[n], new_noise)
        elif merge_type == "modulate":
            noise[n] = Modulate(noise[n], new_noise, mod_feat_weight * features[mod_feat])
        else:
            noise[n] = new_noise

        noise[n] = ScaleBias(noise[n], scale=noise_std, bias=noise_mean)
    return noise
