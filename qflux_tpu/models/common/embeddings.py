"""Timestep / projection embeddings shared by all MMDiT families.

Matches diffusers' Timesteps + TimestepEmbedding stack the reference models
are built on (sinusoidal-256 → Linear → SiLU → Linear), with
flip_sin_to_cos=True and downscale_freq_shift=0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from qflux_tpu.ops.layers import dense, mlp_init


def sinusoidal_embedding(t: jax.Array, dim: int = 256, max_period: float = 10000.0,
                         time_factor: float = 1000.0) -> jax.Array:
    """t [B] (0..1 model time) → [B, dim] float32, cos-first (flip_sin_to_cos)."""
    t = t.astype(jnp.float32) * time_factor
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def mlp_silu(p, x: jax.Array) -> jax.Array:
    """Linear → SiLU → Linear (diffusers TimestepEmbedding / text projection)."""
    return dense(p["out"], jax.nn.silu(dense(p["in"], x)))


def timestep_embedder_init(key, dim: int, in_dim: int = 256, dtype=jnp.float32):
    return mlp_init(key, in_dim, dim, out_dim=dim, dtype=dtype)


__all__ = ["sinusoidal_embedding", "mlp_silu", "timestep_embedder_init", "dense"]
