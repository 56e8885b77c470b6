"""Normalization + AdaLN modulation primitives (pure functions).

Matches the diffusers building blocks the reference's MMDiTs are made of:
RMSNorm (qk-norm), LayerNorm-no-affine, AdaLayerNormZero (6-way modulation),
AdaLayerNormZeroSingle (3-way), AdaLayerNormContinuous (output norm).
All stats in float32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qflux_tpu.ops.layers import dense, dense_init


def rms_norm(x: jax.Array, scale: jax.Array | None = None, eps: float = 1e-6) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm without learnable affine (elementwise_affine=False)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """x * (1 + scale) + shift, broadcasting [B, D] mods over [B, S, D]."""
    return x * (1.0 + scale[:, None, :].astype(x.dtype)) + shift[:, None, :].astype(x.dtype)


# -- AdaLN param init -------------------------------------------------------

def ada_ln_init(key, dim: int, n_mods: int, dtype=jnp.float32):
    """Linear(dim → n_mods*dim) applied to SiLU(temb)."""
    return {"proj": dense_init(key, dim, n_mods * dim, dtype=dtype)}


def ada_ln_mods(p, temb: jax.Array, n_mods: int) -> list[jax.Array]:
    """SiLU(temb) → Linear → n_mods chunks of [B, D] (float32).

    The projection output is a named remat save point ("mod_out"): it is a
    tiny [B, n_mods·D] vector, but recomputing it in backward sweeps the
    full [D, n_mods·D] weight from HBM again (the GEMV is bandwidth-bound;
    ~5 ms/step across the 19+38 FLUX blocks — docs/PERF.md round 3)."""
    from qflux_tpu.ops.layers import named_checkpoint

    m = dense(p["proj"], jax.nn.silu(temb.astype(jnp.float32)))
    return list(jnp.split(named_checkpoint(m, "mod_out"), n_mods, axis=-1))
