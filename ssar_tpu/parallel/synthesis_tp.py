"""Tensor-parallel StyleGAN2 synthesis over a (data, tp) device mesh.

SURVEY.md §2.8: the reference is single-GPU; the TPU framework adds
*optional channel-dim tensor parallelism* for 1024 px synthesis on top of
the default frame/batch data parallelism.

Design (GSPMD, not hand-written collectives): conv kernels are annotated
with their output-channel axis sharded over ``tp`` and the 4x4 const input
over its channel axis; latents/noises are sharded over ``data`` on the
batch axis.  XLA's SPMD partitioner propagates the shardings through the
modulate->conv->demodulate graph and inserts the all-gathers/reduces on
ICI — the jax-idiomatic formulation of Megatron-style conv TP.

Channels <= 3 (to_rgb) and vector params stay replicated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gan import stylegan2 as sg


def shard_generator_params(params: dict, mesh: Mesh, tp_axis: str = "tp") -> dict:
    """Place generator params on the mesh: conv kernels (kh, kw, cin, cout)
    and the const input sharded on their channel axis over ``tp_axis``;
    everything else replicated."""
    tp = mesh.shape[tp_axis]

    def place(x):
        if getattr(x, "ndim", 0) >= 3 and x.shape[-1] > 3 and x.shape[-1] % tp == 0:
            spec = P(*([None] * (x.ndim - 1)), tp_axis)
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, params)


def synthesize_tp(params: dict, latents: jax.Array, noises, config: sg.StyleGAN2Config,
                  mesh: Mesh, *, dtype=jnp.bfloat16, data_axis: str = "data",
                  tp_axis: str = "tp", output_size: int | None = None) -> jax.Array:
    """TP+DP synthesis: latents (B, n_latent, 512) with B divisible by the
    ``data`` mesh axis.  Returns (B, R, R, 3) sharded over ``data``."""
    params = shard_generator_params(params, mesh, tp_axis)
    batch_sh = NamedSharding(mesh, P(data_axis))
    latents = jax.device_put(latents, batch_sh)
    if noises is not None:
        noises = [jax.device_put(n, batch_sh) for n in noises]

    fn = jax.jit(
        lambda p, l, n: sg.synthesis(p, l, n, config, dtype=dtype, output_size=output_size),
        out_shardings=batch_sh,
    )
    return fn(params, latents, noises)
