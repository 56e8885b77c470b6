"""Synthetic model inputs for benchmarks, dry runs, and memory planning.

Value-independent: shapes/dtypes match the FLUX-Kontext cache output
(trainer/flux_kontext.py encode path; reference flux_kontext_trainer.py
cache_step) so jitted steps compile identically to real data.
"""

from __future__ import annotations

import numpy as np


def flux_inputs(cfg, batch: int, grid_h: int, grid_w: int, txt_len: int, dtype):
    """Packed FLUX-Kontext batch: target + control latents, text embeds,
    RoPE id tables (target coords at frame 0, control at frame 1)."""
    import jax
    import jax.numpy as jnp

    from qflux_tpu.ops.rope import flux_image_ids, flux_text_ids

    s = grid_h * grid_w
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    return {
        "image_latents": jax.random.normal(ks[0], (batch, s, cfg.in_channels), dtype),
        "control_latents": jax.random.normal(ks[1], (batch, s, cfg.in_channels), dtype),
        "prompt_embeds": jax.random.normal(
            ks[2], (batch, txt_len, cfg.joint_attention_dim), dtype),
        "pooled_prompt_embeds": jax.random.normal(
            ks[3], (batch, cfg.pooled_projection_dim), dtype),
        "img_ids": jnp.asarray(np.concatenate([
            flux_image_ids(grid_h, grid_w, 0), flux_image_ids(grid_h, grid_w, 1)])),
        "txt_ids": jnp.asarray(flux_text_ids(txt_len)),
    }
