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
            cls._load_vlm(config, bundle)
        return adapter, bundle

    @staticmethod
    def _load_vlm(config, bundle: ModelBundle) -> None:
        """Attach the Qwen2.5-VL stack + lm_head used for prompt rewriting
        (reference dreamomni2_trainer.py:94-121 load_vlm_model)."""
        from qflux_tpu.models.qwen import vl_encoder as vl
        from qflux_tpu.trainer.flux_kontext import SimpleTokenizer

        if config.model.variant == "test":
            key = jax.random.PRNGKey(11)
            vcfg, tcfg = vl.VLVisionConfig.tiny(), vl.VLTextConfig.tiny()
            bundle.text_cfgs.update({
                "vision": vcfg, "text": tcfg,
                "tokens": vl.VLSpecialTokens(500, 502, 503, (1,))})
            bundle.text_params.update({
                "vision": vl.vision_init(key, vcfg),
                "text": vl.text_init(jax.random.fold_in(key, 1), tcfg),
                "lm_head": {"kernel": 0.05 * jax.random.normal(
                    jax.random.fold_in(key, 2),
                    (tcfg.hidden_size, tcfg.vocab_size), jnp.float32)},
            })
            bundle.tokenizers["vl"] = SimpleTokenizer(tcfg.vocab_size, 512)
            return
        vlm_path = config.model.vlm_path
        if not vlm_path:
            logging.warning("use_vlm_prompt_enhancer set but model.vlm_path "
                            "missing; prompts will pass through unchanged")
            return
        from pathlib import Path

        from qflux_tpu.models.porting import load_safetensors
        from qflux_tpu.models.qwen.porting import (
            convert_vl_lm_head,
            convert_vl_text,
            convert_vl_vision,
        )

        sd: dict = {}
        for f in sorted(Path(vlm_path).glob("*.safetensors")):
            sd.update(load_safetensors(str(f)))
        if not sd:
            raise FileNotFoundError(f"no safetensors under {vlm_path}")
        vcfg, tcfg = vl.VLVisionConfig(), vl.VLTextConfig()
        bundle.text_cfgs.update({"vision": vcfg, "text": tcfg,
                                 "tokens": vl.VLSpecialTokens()})
        bundle.text_params.update({
            "vision": jax.tree.map(jnp.asarray, convert_vl_vision(sd, vcfg.depth)),
            "text": jax.tree.map(jnp.asarray, convert_vl_text(sd, tcfg.num_layers)),
            "lm_head": jax.tree.map(jnp.asarray, convert_vl_lm_head(sd)),
        })
        try:
            from transformers import AutoTokenizer

            bundle.tokenizers["vl"] = AutoTokenizer.from_pretrained(vlm_path)
        except Exception as e:  # pragma: no cover
            logging.warning("VLM tokenizer unavailable (%s); hash fallback", e)
            bundle.tokenizers["vl"] = SimpleTokenizer(tcfg.vocab_size, 1024)

    def prepare_embeddings(self, bundle: ModelBundle, batch: dict,
                           max_sequence_length: int = 512) -> dict:
        """Same encode path as FLUX-Kontext but with cumulative-offset control
        ids instead of plain set-indexed ids; prompts are VLM-rewritten first
        when the enhancer is enabled (predict + fit-without-cache stages,
        reference dreamomni2_trainer.py:123-149 _should_use_vlm_for_stage)."""
        batch = self._rewrite_batch_prompts(bundle, batch)
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
    # VLM prompt rewriting (cache/predict-time, host-side greedy loop over
    # jitted prefill + KV-cached decode steps)

    def _vl_tokenize(self, bundle: ModelBundle, text: str,
                     n_image_tokens: list[int]) -> list[int]:
        """Expand <|vision_start|><|image_pad|><|vision_end|> markers."""
        import re

        toks = bundle.text_cfgs["tokens"]
        tok = bundle.tokenizers["vl"]
        ids: list[int] = []
        img_i = 0
        for part in re.split(r"(<\|vision_start\|>|<\|image_pad\|>|<\|vision_end\|>)",
                             text):
            if not part:
                continue
            if part == "<|image_pad|>":
                ids.extend([toks.image_token_id] * n_image_tokens[img_i])
                img_i += 1
            elif part == "<|vision_start|>":
                ids.append(toks.vision_start_token_id)
            elif part == "<|vision_end|>":
                ids.append(toks.vision_end_token_id)
            elif hasattr(tok, "max_length"):  # SimpleTokenizer
                ids.extend(int(i) for i in tok([part])[0] if i != 0)
            else:
                ids.extend(tok(part, add_special_tokens=False)["input_ids"])
        return ids

    def enhance_prompt(self, bundle: ModelBundle, prompt: str,
                       images: list[np.ndarray], max_new_tokens: int = 128) -> str:
        """Rewrite an edit instruction with the Qwen2.5-VL model given the
        reference images (reference dreamomni2_trainer.py:218-286
        optimize_prompt_with_vlm; decoding = greedy, matching do_sample=False).

        Prefill compiles once per prompt-length bucket; every generated token
        reuses ONE compiled KV-cached decode step."""
        if not self.use_vlm_prompt_enhancer:
            return prompt
        tp = bundle.text_params
        if "vision" not in tp or "text" not in tp or "lm_head" not in tp:
            logging.warning("VL stack/lm_head not loaded; keeping original prompt")
            return prompt
        from qflux_tpu.models.qwen import vl_encoder as vl

        vcfg, tcfg = bundle.text_cfgs["vision"], bundle.text_cfgs["text"]
        toks = bundle.text_cfgs["tokens"]
        tok = bundle.tokenizers["vl"]

        patches, grids = [], []
        for im in images:
            p, g = vl.preprocess_image(np.asarray(im), vcfg)
            patches.append(p)
            grids.append(g)
        msz2 = vcfg.spatial_merge_size ** 2
        n_tok = [g[0] * g[1] * g[2] // msz2 for g in grids]

        # Qwen chat layout with the reference's editing-task suffix
        text = ("<|im_start|>user\n"
                + "".join("<|vision_start|><|image_pad|><|vision_end|>" for _ in images)
                + f"{prompt} It is editing task.<|im_end|>\n<|im_start|>assistant\n")
        ids = self._vl_tokenize(bundle, text, n_tok)
        cur = np.asarray([ids])

        vis = vl.vision_forward(tp["vision"], vcfg,
                                jnp.asarray(np.concatenate(patches)), grids)
        embed_table = jnp.asarray(tp["text"]["embed_tokens"])
        embeds = embed_table[jnp.asarray(cur)]
        img_mask = cur[0] == toks.image_token_id
        if img_mask.any():
            embeds = embeds.at[0, jnp.asarray(img_mask)].set(vis.astype(embeds.dtype))
        pos = vl.get_rope_index(cur, grids, vcfg.spatial_merge_size, toks)

        max_len = len(ids) + max_new_tokens
        cache = vl.make_kv_cache(tcfg, 1, max_len, embeds.dtype)
        hidden, cache = vl.text_prefill_jit(tp["text"], tcfg, embeds,
                                            jnp.asarray(pos), cache)
        head = jnp.asarray(tp["lm_head"]["kernel"])
        nxt = int(jnp.argmax(hidden[0, len(ids) - 1] @ head))
        pos_base = int(pos.max()) + 1

        generated: list[int] = []
        eos = set(toks.eos_token_ids)
        for step in range(max_new_tokens):
            if nxt in eos:
                break
            generated.append(nxt)
            step_pos = jnp.full((3, 1, 1), pos_base + step, jnp.int32)
            emb = embed_table[jnp.asarray([[nxt]])]
            hidden, cache = vl.text_decode_step_jit(
                tp["text"], tcfg, emb, step_pos, cache,
                jnp.asarray(len(ids) + step, jnp.int32))
            nxt = int(jnp.argmax(hidden[0] @ head))
        if not generated or not hasattr(tok, "decode"):
            return prompt
        out = tok.decode(generated, skip_special_tokens=True).strip()
        return out or prompt

    def _rewrite_batch_prompts(self, bundle: ModelBundle, batch: dict) -> dict:
        """Apply the VLM enhancer to every prompt in a pixel batch, using the
        control images as visual context (reference
        dreamomni2_trainer.py:300-330)."""
        if not self.use_vlm_prompt_enhancer or "prompt" not in batch:
            return batch
        prompts = batch["prompt"]
        single = isinstance(prompts, str)
        prompts = [prompts] if single else list(prompts)
        from qflux_tpu.utils.tensors import numeric_suffix_key

        ctl_keys = [k for k in ("control",) if k in batch]
        ctl_keys += sorted((k for k in batch if k.startswith("control_")
                            and not k.startswith("control_latents")),
                           key=numeric_suffix_key)
        new_prompts = []
        for bi, p in enumerate(prompts):
            imgs = [np.asarray(batch[k][bi]) for k in ctl_keys]
            # an EMPTY prompt means conditioning dropout picked this sample —
            # rewriting it would train the "unconditional" branch on a VLM
            # caption (reference enhances only real instructions,
            # dreamomni2_trainer.py:300-330)
            new_prompts.append(self.enhance_prompt(bundle, p, imgs)
                               if (imgs and p) else p)
        out = dict(batch)
        out["prompt"] = new_prompts[0] if single else new_prompts
        return out



