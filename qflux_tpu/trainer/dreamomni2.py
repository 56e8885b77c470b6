"""DreamOmni2 adapter: FLUX-Kontext + cumulative-RoPE multi-image
conditioning + optional VLM prompt rewriting.

Re-design of the reference DreamOmni2Trainer (reference
trainer/dreamomni2_trainer.py:18-336 + models/pipeline_dreamomni2.py):

  * base transformer = FLUX-Kontext with the DreamOmni2 edit-LoRA FUSED into
    the base weights at load (reference models/flux_kontext_loader.py:184-198)
    — ops.layers.fuse_lora;
  * multi-image conditioning uses CUMULATIVE RoPE offsets: reference image i
    gets set_id i+1 and h/w offsets accumulated over previous images so
    images never overlap in RoPE space (reference pipeline_dreamomni2.py:
    676-711) — ops.rope.dreamomni2_control_ids;
  * optional VLM prompt optimizer: the Qwen2.5-VL encoder stack (already in
    models/qwen/vl_encoder.py) rewrites the instruction given the reference
    images at cache/predict time (reference dreamomni2_trainer.py:94-149).
    Autoregressive generation is host-driven greedy decoding over the JAX LM.
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from qflux_tpu.ops.rope import dreamomni2_control_ids, flux_image_ids
from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter, ModelBundle


@dataclasses.dataclass(frozen=True)
class DreamOmni2Adapter(FluxKontextAdapter):
    use_vlm_prompt_enhancer: bool = False

    @classmethod
    def load(cls, config, dtype=jnp.bfloat16):
        adapter, bundle = FluxKontextAdapter.load.__func__(cls, config, dtype)
        # fuse the DreamOmni2 edit-LoRA into the base weights when provided
        edit_lora = getattr(config.model, "pretrained_embeddings", None)
        if edit_lora:
            from qflux_tpu.ops.layers import fuse_lora
            from qflux_tpu.utils.lora_io import load_lora_safetensors

            try:
                tree = load_lora_safetensors(edit_lora, adapter.lora_tree_path_fn)
                bundle.dit_params = fuse_lora(
                    bundle.dit_params, jax.tree.map(jnp.asarray, tree))
                logging.info("fused DreamOmni2 edit-LoRA from %s", edit_lora)
            except Exception as e:
                logging.warning("edit-LoRA fuse failed: %s", e)
        if config.model.use_vlm_prompt_enhancer:
            adapter = dataclasses.replace(adapter, use_vlm_prompt_enhancer=True)
        return adapter, bundle

    def prepare_embeddings(self, bundle: ModelBundle, batch: dict,
                           max_sequence_length: int = 512) -> dict:
        """Same encode path as FLUX-Kontext but with cumulative-offset control
        ids instead of plain set-indexed ids."""
        out = FluxKontextAdapter.prepare_embeddings(self, bundle, batch,
                                                    max_sequence_length)
        shapes = []
        images = np.asarray(batch["image"])
        gh, gw = self.latent_grid(images.shape[1], images.shape[2])
        ctl_keys = [k for k in ("control",) if k in batch]
        ctl_keys += sorted(k for k in batch if k.startswith("control_") and k != "control")
        for key in ctl_keys:
            ctl = np.asarray(batch[key])
            shapes.append(self.latent_grid(ctl.shape[1], ctl.shape[2]))
        if shapes:
            ids = np.concatenate([flux_image_ids(gh, gw, 0),
                                  dreamomni2_control_ids(shapes)])
            out["img_ids"] = jnp.asarray(ids)
        return out

    # ------------------------------------------------------------------
    # VLM prompt rewriting (cache/predict-time, host-side)

    def enhance_prompt(self, vl_bundle, prompt: str,
                       images: list[np.ndarray], max_new_tokens: int = 64) -> str:
        """Greedy-decode a rewritten instruction from a Qwen2.5-VL bundle
        (reference dreamomni2_trainer.py:94-149).  vl_bundle must carry the
        VL encoder params (models/qwen/vl_encoder) plus an lm_head."""
        if not self.use_vlm_prompt_enhancer or vl_bundle is None:
            return prompt
        from qflux_tpu.models.qwen import vl_encoder as vl

        vcfg = vl_bundle.text_cfgs["vision"]
        tcfg = vl_bundle.text_cfgs["text"]
        toks = vl_bundle.text_cfgs["tokens"]
        tok = vl_bundle.tokenizers["vl"]
        if "lm_head" not in vl_bundle.text_params:
            logging.warning("no lm_head in VL bundle; skipping prompt rewrite")
            return prompt

        patches, grids = [], []
        for im in images:
            p, g = vl.preprocess_image(np.asarray(im), vcfg)
            patches.append(p)
            grids.append(g)
        msz2 = vcfg.spatial_merge_size ** 2
        n_tok = [g[0] * g[1] * g[2] // msz2 for g in grids]
        text = "".join("<|vision_start|><|image_pad|><|vision_end|>" for _ in images)
        text += f"Rewrite this instruction precisely for image editing: {prompt}"
        ids = list(tok([text])[0]) if hasattr(tok, "max_length") else \
            tok(text, add_special_tokens=False)["input_ids"]
        # greedy loop (recompute; cache/predict-time only so latency is fine)
        import jax

        vis = vl.vision_forward(vl_bundle.text_params["vision"], vcfg,
                                jnp.asarray(np.concatenate(patches)), grids)
        generated: list[int] = []
        for _ in range(max_new_tokens):
            cur = np.asarray([ids + generated])
            embeds = jnp.asarray(vl_bundle.text_params["text"]["embed_tokens"])[jnp.asarray(cur)]
            mask = cur[0] == toks.image_token_id
            if mask.any():
                embeds = embeds.at[0, jnp.asarray(mask)].set(vis.astype(embeds.dtype))
            pos = vl.get_rope_index(cur, grids, vcfg.spatial_merge_size, toks)
            hidden = vl.text_forward(vl_bundle.text_params["text"], tcfg, embeds, pos)
            logits = hidden[0, -1] @ vl_bundle.text_params["lm_head"]["kernel"]
            nxt = int(jnp.argmax(logits))
            if nxt in (0,):
                break
            generated.append(nxt)
        if hasattr(tok, "decode"):
            return tok.decode(generated, skip_special_tokens=True)
        return prompt  # hash tokenizer cannot decode — keep the original

