"""Pure-function losses over packed latent sequences.

Same math as the reference's loss layer, as stateless callables usable inside
the jitted train step:

  * MseLoss — weighted MSE, per-sample-mean-then-batch-mean reduction
    (reference losses/mse_loss.py:46-84)
  * MaskEditLoss — foreground/background-weighted MSE over edit regions
    (reference losses/edit_mask_loss.py:39-90)
  * AttentionMaskMseLoss — channel-invariant token loss for multi-resolution
    padded batches (math spec in reference losses/attention_mask_loss.py:11-69)
  * map_mask_to_latent — image-space mask → packed-latent token weights
    (reference losses/edit_mask_loss.py:7-36)

All losses accept the full kwargs set (weighting / edit_mask / attention_mask)
and ignore what they don't use, mirroring the reference's kwargs-tolerant
dispatch (reference base_trainer.py:478-506).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def map_mask_to_latent(image_mask: jnp.ndarray, vae_scale: int = 8) -> jnp.ndarray:
    """[B, H, W] binary image mask → [B, seq] packed-latent token weights.

    avg-pool vae_scale× (VAE downsampling) then max over each 2×2 packing patch
    (max keeps thin edit regions alive).
    """
    b, h, w = image_mask.shape
    lh, lw = h // vae_scale, w // vae_scale
    m = image_mask.astype(jnp.float32)
    m = m[:, : lh * vae_scale, : lw * vae_scale]
    m = m.reshape(b, lh, vae_scale, lw, vae_scale).mean(axis=(2, 4))  # [B, lh, lw]
    m = m.reshape(b, lh // 2, 2, lw // 2, 2).max(axis=(2, 4))          # [B, lh/2, lw/2]
    return m.reshape(b, (lh // 2) * (lw // 2))


def _sample_mean(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dims, then over batch (reference reduction)."""
    return x.reshape(x.shape[0], -1).mean(axis=1).mean()


@dataclasses.dataclass(frozen=True)
class MseLoss:
    reduction: str = "mean"

    def __call__(self, model_pred, target, weighting=None, **_):
        err = (model_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if weighting is not None:
            err = weighting.astype(jnp.float32) * err
            if self.reduction == "mean":
                return _sample_mean(err)
        if self.reduction == "none":
            return err
        if self.reduction == "sum":
            return err.sum()
        return err.mean()


@dataclasses.dataclass(frozen=True)
class MaskEditLoss:
    foreground_weight: float = 2.0
    background_weight: float = 1.0
    reduction: str = "mean"

    def __call__(self, model_pred, target, weighting=None, edit_mask=None, **_):
        err = (model_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if weighting is not None:
            err = weighting.astype(jnp.float32) * err
        if edit_mask is None:
            edit_mask = jnp.ones(model_pred.shape[:2], dtype=jnp.float32)
        em = edit_mask.astype(jnp.float32)
        w = em * self.foreground_weight + (1.0 - em) * self.background_weight
        err = err * w[..., None]
        if self.reduction == "none":
            return err
        if self.reduction == "sum":
            return err.sum()
        return _sample_mean(err)


@dataclasses.dataclass(frozen=True)
class AttentionMaskMseLoss:
    """Channel-invariant token loss: channel-mean per token, then average over
    attention-mask-valid tokens only.  The workhorse for padded multi-res
    batches — padding tokens contribute exactly zero."""

    foreground_weight: float = 2.0
    background_weight: float = 1.0
    eps: float = 1e-12
    reduction: str = "mean"

    def __call__(self, model_pred, target, attention_mask=None, edit_mask=None,
                 weighting=None, **_):
        err = (model_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if weighting is not None:
            err = weighting.astype(jnp.float32) * err
        if edit_mask is not None:
            em = edit_mask.astype(jnp.float32)
            w = em * self.foreground_weight + (1.0 - em) * self.background_weight
            err = err * w[..., None]
        token_loss = err.mean(axis=-1)  # [B, T] channel mean
        if attention_mask is None:
            attention_mask = jnp.ones(token_loss.shape, dtype=jnp.float32)
        a = attention_mask.astype(jnp.float32)
        if self.reduction == "none":
            return token_loss * a
        if self.reduction == "sum":
            return (token_loss * a).sum()
        return (token_loss * a).sum() / (a.sum() + self.eps)
