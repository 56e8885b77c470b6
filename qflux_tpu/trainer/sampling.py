"""Jitted flow-match Euler sampling loop (lax.scan over a static plan).

Replaces the reference's Python-loop samplers (reference
flux_kontext_trainer.py:902-976 `sampling_from_embeddings` and the Qwen
variant qwen_image_edit_trainer.py:1116-1289): the whole denoising loop
compiles to ONE XLA program — sigmas ride along as a scanned array, the DiT
weights stay resident, and there is no host↔device round-trip per step.

Supports true-CFG (second unconditional pass, mixed as
neg + s·(pos − neg)) and the Qwen norm-rescaled guidance variant
(reference qwen_image_edit_trainer.py:1271-1275).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from qflux_tpu.scheduler.flow_match import FlowMatchScheduler, SamplerPlan

# predict_velocity(params, batch, latents, sigma) -> [B, S_img, C]
PredictFn = Callable[[Any, dict, jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    num_inference_steps: int = 20
    true_cfg_scale: float = 1.0
    guidance_rescale: bool = False  # Qwen norm-rescale of the CFG output


def make_sampler(predict_velocity: PredictFn, cfg: SamplingConfig = SamplingConfig(),
                 param_formats=None):
    """Returns jitted `sample(params, batch, latents0, sigmas) -> latents`.

    batch must contain the conditioning embeddings; for true-CFG it must also
    hold the negative embeddings under "neg_…"-prefixed keys (the adapter's
    predict_velocity receives the whole batch and picks what it needs via the
    `negative=` kwarg convention below).

    param_formats: optional pytree of jax Formats matching `params` — pass
    the committed formats when the frozen base was relaid into XLA-preferred
    entry layouts (train_step.relayout_base_params); without the pin, jit
    lowers for default layouts and the runtime re-transposes the whole tree
    on every call (measured 3× step cost on the 12 GB tree; docs/PERF.md).
    """
    use_cfg = cfg.true_cfg_scale > 1.0
    jit_kw = ({"in_shardings": (param_formats, None, None, None)}
              if param_formats is not None else {})

    @functools.partial(jax.jit, **jit_kw)
    def sample(params, batch, latents, sigmas):
        def body(lat, sig_pair):
            sigma, sigma_next = sig_pair
            t = jnp.full((lat.shape[0],), sigma, lat.dtype)
            v = predict_velocity(params, batch, lat, t)
            if use_cfg:
                neg_batch = {**batch}
                for key in list(batch):
                    if key.startswith("neg_"):
                        neg_batch[key[4:]] = batch[key]
                v_neg = predict_velocity(params, neg_batch, lat, t)
                v_cfg = v_neg + cfg.true_cfg_scale * (v - v_neg)
                if cfg.guidance_rescale:
                    # rescale so ||v_cfg|| matches the conditional pass
                    norm_pos = jnp.linalg.norm(v.astype(jnp.float32), axis=-1, keepdims=True)
                    norm_cfg = jnp.linalg.norm(v_cfg.astype(jnp.float32), axis=-1, keepdims=True)
                    v_cfg = (v_cfg.astype(jnp.float32) * (norm_pos / (norm_cfg + 1e-8))).astype(v.dtype)
                v = v_cfg
            lat = FlowMatchScheduler.step(lat.astype(jnp.float32), v, sigma, sigma_next)
            return lat.astype(latents.dtype), None

        sig_pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
        out, _ = jax.lax.scan(body, latents, sig_pairs)
        return out

    return sample


def run_sampler(sampler, params, batch, latents, plan: SamplerPlan):
    return sampler(params, batch, latents, jnp.asarray(plan.sigmas))
