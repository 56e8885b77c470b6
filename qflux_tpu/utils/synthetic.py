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


def flux_multicontrol_inputs(cfg, batch: int, target_grid, control_grids,
                             txt_len: int, dtype):
    """Multi-control FLUX-Kontext batch (the reference's character-composition
    workload, reference configs/examples/
    example_fluxkontext_fp16_character_composition.yaml: one target +
    N control images of DIFFERENT sizes, control latents concatenated along
    the sequence with set-index ids — control i gets ids[..., 0] = i + 1,
    reference flux_kontext_trainer.py:400,419)."""
    import jax
    import jax.numpy as jnp

    from qflux_tpu.ops.rope import flux_image_ids, flux_text_ids

    th, tw = target_grid
    s_tgt = th * tw
    s_ctl = sum(h * w for h, w in control_grids)
    ks = jax.random.split(jax.random.PRNGKey(13), 4)
    ids = [flux_image_ids(th, tw, 0)]
    for i, (h, w) in enumerate(control_grids):
        ids.append(flux_image_ids(h, w, i + 1))
    return {
        "image_latents": jax.random.normal(ks[0], (batch, s_tgt, cfg.in_channels), dtype),
        "control_latents": jax.random.normal(ks[1], (batch, s_ctl, cfg.in_channels), dtype),
        "prompt_embeds": jax.random.normal(
            ks[2], (batch, txt_len, cfg.joint_attention_dim), dtype),
        "pooled_prompt_embeds": jax.random.normal(
            ks[3], (batch, cfg.pooled_projection_dim), dtype),
        "img_ids": jnp.asarray(np.concatenate(ids)),
        "txt_ids": jnp.asarray(flux_text_ids(txt_len)),
    }


def flux_multires_inputs(cfg, grids, txt_len: int, dtype):
    """Mixed-resolution PADDED batch (the multi-res fallback path): one sample
    per (grid_h, grid_w), each a target+control pair, padded to the largest
    joint sequence with per-sample [B, S, 3] ids and segment_ids (0 = padding)
    — exactly what the trainer's padded/segment-masked path feeds the DiT
    (trainer/flux_kontext.py predict_velocity; reference multi-res loss,
    flux_kontext_trainer.py:579-796)."""
    import jax
    import jax.numpy as jnp

    from qflux_tpu.ops.rope import flux_image_ids, flux_text_ids

    b = len(grids)
    s_img_max = 2 * max(h * w for h, w in grids)
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    img_lat = jax.random.normal(ks[0], (b, s_img_max // 2, cfg.in_channels), dtype)
    ctl_lat = jax.random.normal(ks[1], (b, s_img_max // 2, cfg.in_channels), dtype)
    ids = np.zeros((b, s_img_max, 3), np.float32)
    seg = np.zeros((b, txt_len + s_img_max), np.int32)
    seg[:, :txt_len] = 1
    for i, (h, w) in enumerate(grids):
        s = h * w
        ids[i, :s] = flux_image_ids(h, w, 0)
        ids[i, s_img_max // 2:s_img_max // 2 + s] = flux_image_ids(h, w, 1)
        seg[i, txt_len:txt_len + s] = 1                              # target
        seg[i, txt_len + s_img_max // 2:txt_len + s_img_max // 2 + s] = 1  # ctl
    return {
        "image_latents": img_lat,
        "control_latents": ctl_lat,
        "prompt_embeds": jax.random.normal(
            ks[2], (b, txt_len, cfg.joint_attention_dim), dtype),
        "pooled_prompt_embeds": jnp.zeros((b, cfg.pooled_projection_dim), dtype),
        "img_ids": jnp.asarray(ids),
        "txt_ids": jnp.asarray(np.broadcast_to(flux_text_ids(txt_len),
                                               (b, txt_len, 3)).copy()),
        "segment_ids": jnp.asarray(seg),
    }
