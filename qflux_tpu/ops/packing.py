"""Latent 2×2 patch packing/unpacking (pure reshapes — free under XLA).

The FLUX/Qwen latent packing quarters the sequence length by folding each
2×2 latent patch into the channel dim (reference
trainer/flux_kontext_trainer.py:842-867, _pack_latents/_unpack_latents).
Layout convention here is NHWC ([B, H, W, C]) — the natural TPU layout with C
on the 128-lane dim — vs the reference's NCHW.
"""

from __future__ import annotations

import jax


def pack_latents(latents: jax.Array) -> jax.Array:
    """[B, H, W, C] → [B, (H/2)*(W/2), C*4].

    Channel order of each packed token matches the reference's
    (c, dy, dx)-major layout so ported weights see identical inputs.
    """
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, H/2, W/2, C, 2, 2]
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(packed: jax.Array, height: int, width: int) -> jax.Array:
    """[B, (H/2)*(W/2), C*4] → [B, H, W, C] (latent-space H, W)."""
    b, _, c4 = packed.shape
    c = c4 // 4
    x = packed.reshape(b, height // 2, width // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, H/2, 2, W/2, 2, C]
    return x.reshape(b, height, width, c)


def pixel_to_latent_hw(height: int, width: int, vae_scale: int = 8) -> tuple[int, int]:
    """Pixel H/W → packed-latent grid H/W (the reference's pixel→latent shape
    conversion, base_trainer.py:183-243): H/(vae_scale*2) per side."""
    return height // (vae_scale * 2), width // (vae_scale * 2)
