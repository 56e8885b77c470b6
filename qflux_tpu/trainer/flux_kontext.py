"""FLUX.1-Kontext model adapter: wires the FLUX MMDiT into the shared train
step and sampler.

The reference's FluxKontextLoraTrainer (reference
trainer/flux_kontext_trainer.py:29-1828) owns the torch train loop, device
juggling, and sampling; here the trainer-specific surface shrinks to pure
functions over an embeddings batch:

  batch keys (what the cache pass / encoders produce — mirrors the cached
  embedding set of reference cache_step, flux_kontext_trainer.py:431-468):
    image_latents          [B, S_img, 64]   packed target VAE latents
    control_latents        [B, S_ctl, 64]   packed control latents (≥1 image)
    prompt_embeds          [B, S_txt, 4096] T5 sequence embeds
    pooled_prompt_embeds   [B, 768]         CLIP pooled embeds
    img_ids                [S_img+S_ctl, 3] (or [B, …, 3] per-sample)
    txt_ids                [S_txt, 3]
    guidance               [B] optional (defaults 1.0 — Kontext-dev convention)
    segment_ids            [B, S_txt+S_img+S_ctl] optional (multi-res padding)
    edit_mask / attention_mask — consumed by the criterion, not the model
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from qflux_tpu.models.flux import transformer as flux


@dataclasses.dataclass(frozen=True)
class FluxKontextAdapter:
    cfg: flux.FluxConfig
    attn_impl: str = "auto"
    remat: bool = True

    def predict_velocity(self, params, batch, latents, sigma):
        """Shared signature for train_step and sampler: DiT forward over
        [noisy_target, control] concat, sliced back to target tokens
        (reference _compute_loss, flux_kontext_trainer.py:530-567)."""
        ctrl = batch["control_latents"].astype(latents.dtype)
        inp = jnp.concatenate([latents, ctrl], axis=1)
        s_img = latents.shape[1]
        guidance = batch.get("guidance")
        if guidance is None and self.cfg.guidance_embeds:
            guidance = jnp.ones_like(sigma)
        pred = flux.forward(
            params, self.cfg, inp,
            batch["prompt_embeds"].astype(latents.dtype),
            batch["pooled_prompt_embeds"].astype(latents.dtype),
            sigma,
            batch["img_ids"], batch["txt_ids"],
            guidance=guidance,
            segment_ids=batch.get("segment_ids"),
            attn_impl=self.attn_impl,
            remat=self.remat,
        )
        return pred[:, :s_img]
