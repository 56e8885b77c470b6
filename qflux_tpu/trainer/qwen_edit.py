"""Qwen-Image-Edit model adapter.

Re-design of the reference QwenImageEditTrainer (reference
trainer/qwen_image_edit_trainer.py:38-1308):

  * conditioning: Qwen2.5-VL hidden states over a chat template embedding the
    control image(s) (reference :946-993 — template format, hidden_states[-1],
    drop_idx prefix removal, per-sample mask trim + re-pad);
  * latents: 3D VAE (single-frame video) with per-channel mean/std
    normalization (reference :863-889), 2×2-packed to 64-channel tokens;
  * img_shapes [(1, h/2, w/2), …] drive the DiT's RoPE (reference :827-836);
  * sampling: true-CFG with norm-rescaled guidance (reference :1271-1275).
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path


import jax
import jax.numpy as jnp
import numpy as np

from qflux_tpu.config import Config
from qflux_tpu.models.qwen import transformer as qwen_dit
from qflux_tpu.models.qwen import vae as qwen_vae
from qflux_tpu.models.qwen import vl_encoder as vl
from qflux_tpu.ops.packing import pack_latents, unpack_latents
from qflux_tpu.trainer.flux_kontext import (ModelBundle, SimpleTokenizer,
                                             attn_impl_from_config,
                                             remat_policy_from_config)

# diffusers QwenImageEditPipeline template (drop_idx = 64 template-prefix tokens)
EDIT_TEMPLATE = (
    "<|im_start|>system\nDescribe the key features of the input image "
    "(color, shape, size, texture, objects, background), then explain how the "
    "user's text instruction should alter or modify the image. Generate a new "
    "image that meets the user's requirements while maintaining consistency "
    "with the original input where appropriate.<|im_end|>\n"
    "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>{}<|im_end|>\n"
    "<|im_start|>assistant\n"
)
EDIT_DROP_IDX = 64


def _qwen_module_name(path: tuple[str, ...], layer: int | None) -> str | None:
    """Our tree path → diffusers QwenImageTransformer2DModel module name."""
    mapping = {
        ("attn", "to_q"): "attn.to_q", ("attn", "to_k"): "attn.to_k",
        ("attn", "to_v"): "attn.to_v", ("attn", "to_out"): "attn.to_out.0",
        ("attn", "add_q"): "attn.add_q_proj", ("attn", "add_k"): "attn.add_k_proj",
        ("attn", "add_v"): "attn.add_v_proj", ("attn", "add_out"): "attn.to_add_out",
        ("img_mlp", "in"): "img_mlp.net.0.proj", ("img_mlp", "out"): "img_mlp.net.2",
        ("txt_mlp", "in"): "txt_mlp.net.0.proj", ("txt_mlp", "out"): "txt_mlp.net.2",
        ("img_mod", "proj"): "img_mod.1", ("txt_mod", "proj"): "txt_mod.1",
    }
    if path[0] == "blocks":
        sub = mapping.get(tuple(path[1:]))
        return None if sub is None else f"transformer_blocks.{layer}.{sub}"
    return ".".join(path)


def _qwen_tree_path(module: str):
    parts = module.split(".")
    if parts[0] == "transformer_blocks":
        layer = int(parts[1])
        rest = ".".join(parts[2:])
        inv = {
            "attn.to_q": ("attn", "to_q"), "attn.to_k": ("attn", "to_k"),
            "attn.to_v": ("attn", "to_v"), "attn.to_out.0": ("attn", "to_out"),
            "attn.add_q_proj": ("attn", "add_q"), "attn.add_k_proj": ("attn", "add_k"),
            "attn.add_v_proj": ("attn", "add_v"), "attn.to_add_out": ("attn", "add_out"),
            "img_mlp.net.0.proj": ("img_mlp", "in"), "img_mlp.net.2": ("img_mlp", "out"),
            "txt_mlp.net.0.proj": ("txt_mlp", "in"), "txt_mlp.net.2": ("txt_mlp", "out"),
            "img_mod.1": ("img_mod", "proj"), "txt_mod.1": ("txt_mod", "proj"),
        }
        sub = inv.get(rest)
        return None if sub is None else (("blocks",) + sub, layer)
    return tuple(parts), None


@dataclasses.dataclass(frozen=True)
class QwenImageEditAdapter:
    cfg: qwen_dit.QwenImageConfig
    attn_impl: str = "auto"
    remat: bool = True
    remat_policy: str = "dots"
    vae_scale: int = 8
    template: str = EDIT_TEMPLATE
    drop_idx: int = EDIT_DROP_IDX

    lora_module_name_fn = staticmethod(_qwen_module_name)
    lora_tree_path_fn = staticmethod(_qwen_tree_path)
    default_lora_targets = (
        r"attn/(to_q|to_k|to_v|to_out|add_q|add_k|add_v|add_out)",
    )

    # ======================================================================

    @classmethod
    def load(cls, config: Config, dtype=jnp.bfloat16):
        variant = config.model.variant
        remat = config.mesh.remat != "none"
        policy = remat_policy_from_config(config.mesh.remat)
        impl = attn_impl_from_config(config)
        if variant == "test":
            dit_cfg = qwen_dit.QwenImageConfig.tiny()
            key = jax.random.PRNGKey(0)
            vcfg = vl.VLVisionConfig.tiny()
            tcfg = vl.VLTextConfig.tiny()
            # tiny VL: joint_attention_dim must match text hidden size
            dit_cfg = dataclasses.replace(dit_cfg, joint_attention_dim=tcfg.hidden_size)
            vae_cfg = qwen_vae.QwenVAEConfig.tiny()
            dit_cfg = dataclasses.replace(
                dit_cfg, in_channels=vae_cfg.z_dim * 4, out_channels=vae_cfg.z_dim)
            bundle = ModelBundle(
                dit_cfg=dit_cfg,
                dit_params=qwen_dit.init(key, dit_cfg, dtype=dtype),
                vae_cfg=vae_cfg,
                vae_params=qwen_vae.init(jax.random.fold_in(key, 1), vae_cfg),
                text_cfgs={"vision": vcfg, "text": tcfg,
                           "tokens": vl.VLSpecialTokens(500, 502, 503)},
                text_params={
                    "vision": vl.vision_init(jax.random.fold_in(key, 2), vcfg),
                    "text": vl.text_init(jax.random.fold_in(key, 3), tcfg),
                },
                tokenizers={"vl": SimpleTokenizer(480, 512)},
            )
            adapter = cls(dit_cfg, attn_impl=impl, remat=remat, remat_policy=policy,
                          vae_scale=vae_cfg.downscale)
            return adapter, bundle

        from qflux_tpu.models.porting import load_safetensors
        from qflux_tpu.models.qwen.porting import (
            convert_qwen_image_transformer,
            convert_vl_text,
            convert_vl_vision,
        )

        root = Path(config.model.pretrained_model_name_or_path or ".")
        dit_cfg = qwen_dit.QwenImageConfig()
        adapter = cls(dit_cfg, attn_impl=impl, remat=remat, remat_policy=policy)

        def _load_dir(p: Path) -> dict[str, np.ndarray]:
            sd: dict[str, np.ndarray] = {}
            files = sorted(Path(p).glob("*.safetensors")) if Path(p).is_dir() else [Path(p)]
            for f in files:
                sd.update(load_safetensors(str(f)))
            if not sd:
                raise FileNotFoundError(f"no safetensors under {p}")
            return sd

        dit_sd = _load_dir(config.model.dit_path or root / "transformer")
        bundle = ModelBundle(
            dit_cfg=dit_cfg,
            dit_params=jax.tree.map(lambda x: jnp.asarray(x, dtype),
                                    convert_qwen_image_transformer(dit_sd, dit_cfg.num_layers)),
            vae_cfg=qwen_vae.QwenVAEConfig(),
        )
        vae_path = config.model.vae_path or root / "vae"
        if Path(vae_path).exists():
            from qflux_tpu.models.qwen.porting import convert_qwen_vae

            vcfg = bundle.vae_cfg
            bundle.vae_params = jax.tree.map(
                jnp.asarray, convert_qwen_vae(
                    _load_dir(vae_path),
                    num_res_blocks=vcfg.num_res_blocks,
                    levels=len(vcfg.dim_mult)))
        te_path = config.model.text_encoder_path or root / "text_encoder"
        if Path(te_path).exists():
            vl_sd = _load_dir(te_path)
            vcfg, tcfg = vl.VLVisionConfig(), vl.VLTextConfig()
            bundle.text_cfgs = {"vision": vcfg, "text": tcfg,
                                "tokens": vl.VLSpecialTokens()}
            bundle.text_params = {
                "vision": jax.tree.map(jnp.asarray, convert_vl_vision(vl_sd, vcfg.depth)),
                "text": jax.tree.map(jnp.asarray, convert_vl_text(vl_sd, tcfg.num_layers)),
            }
        try:
            from transformers import AutoTokenizer

            bundle.tokenizers = {"vl": AutoTokenizer.from_pretrained(Path(config.model.tokenizer_path or root / "tokenizer"))}
        except Exception as e:  # pragma: no cover
            logging.warning("tokenizer unavailable (%s); using hash fallback", e)
            bundle.tokenizers = {"vl": SimpleTokenizer(140000, 1024)}
        return adapter, bundle

    # ======================================================================
    # prompt + image encoding

    def _tokenize_with_images(self, bundle: ModelBundle, text: str,
                              n_image_tokens: list[int]) -> np.ndarray:
        """Template text containing <|image_pad|> markers → ids with the
        marker expanded to each image's token count."""
        toks: vl.VLSpecialTokens = bundle.text_cfgs["tokens"]
        tok = bundle.tokenizers["vl"]
        special = {
            "<|vision_start|>": toks.vision_start_token_id,
            "<|image_pad|>": None,  # expands
            "<|vision_end|>": toks.vision_end_token_id,
        }
        import re

        parts = re.split(r"(<\|vision_start\|>|<\|image_pad\|>|<\|vision_end\|>)", text)
        ids: list[int] = []
        img_i = 0
        for part in parts:
            if not part:
                continue
            if part == "<|image_pad|>":
                ids.extend([toks.image_token_id] * n_image_tokens[img_i])
                img_i += 1
            elif part in special:
                ids.append(special[part])
            elif isinstance(tok, SimpleTokenizer):
                ids.extend(int(i) for i in tok([part])[0] if i != 0)
            else:  # HF tokenizer
                ids.extend(tok(part, add_special_tokens=False)["input_ids"])
        return np.asarray(ids, np.int64)

    def encode_prompt(self, bundle: ModelBundle, prompts: list[str],
                      vl_images: list[list[np.ndarray]],
                      max_sequence_length: int = 1024):
        """→ (prompt_embeds [B, L, D], prompt_embeds_mask [B, L])."""
        vcfg: vl.VLVisionConfig = bundle.text_cfgs["vision"]
        tcfg: vl.VLTextConfig = bundle.text_cfgs["text"]
        toks: vl.VLSpecialTokens = bundle.text_cfgs["tokens"]
        msz2 = vcfg.spatial_merge_size ** 2

        per_sample = []
        for prompt, images in zip(prompts, vl_images):
            patches_list, grids = [], []
            for im in images:
                p, g = vl.preprocess_image(np.asarray(im), vcfg)
                patches_list.append(p)
                grids.append(g)
            n_img_tokens = [g[0] * g[1] * g[2] // msz2 for g in grids]
            text = self.format_prompt(prompt, len(images))
            ids = self._tokenize_with_images(bundle, text, n_img_tokens)
            per_sample.append((ids, patches_list, grids))

        max_len = max(len(s[0]) for s in per_sample)
        b = len(per_sample)
        input_ids = np.zeros((b, max_len), np.int64)
        attn = np.zeros((b, max_len), np.int64)
        for i, (ids, _, _) in enumerate(per_sample):
            input_ids[i, : len(ids)] = ids
            attn[i, : len(ids)] = 1

        embeds = jnp.asarray(bundle.text_params["text"]["embed_tokens"])[jnp.asarray(input_ids)]
        all_grids: list[tuple[int, int, int]] = []
        for i, (ids, patches_list, grids) in enumerate(per_sample):
            if patches_list:
                vis = vl.vision_forward_jit(
                    bundle.text_params["vision"], vcfg,
                    jnp.asarray(np.concatenate(patches_list)), tuple(grids))
                mask = input_ids[i] == toks.image_token_id
                embeds = embeds.at[i, jnp.asarray(mask)].set(vis.astype(embeds.dtype))
            all_grids.extend(grids)

        grids_per_image = [g for (_, _, gs) in per_sample for g in gs]
        pos = vl.get_rope_index(input_ids, grids_per_image, vcfg.spatial_merge_size,
                                toks, attention_mask=attn)
        hidden = vl.text_forward_jit(bundle.text_params["text"], tcfg, embeds,
                                     jnp.asarray(pos),
                                     attention_mask=jnp.asarray(attn))

        # drop template prefix + per-sample re-pack (reference :983-993).
        # drop_idx=64 counts REAL-tokenizer template tokens; with the hash
        # fallback the prefix length differs, so measure it directly.
        drop = self.drop_idx
        if isinstance(bundle.tokenizers["vl"], SimpleTokenizer):
            prefix = self.template.split("<|vision_start|>")[0]
            drop = len(self._tokenize_with_images(bundle, prefix, []))
        outs, masks = [], []
        for i in range(b):
            n_valid = int(attn[i].sum())
            h = np.asarray(hidden[i, drop:n_valid])
            outs.append(h)
            masks.append(np.ones(len(h), np.int64))
        L = min(max(len(o) for o in outs), max_sequence_length)
        pe = np.zeros((b, L, hidden.shape[-1]), np.float32)
        pm = np.zeros((b, L), np.int64)
        for i, (o, m) in enumerate(zip(outs, masks)):
            n = min(len(o), L)
            pe[i, :n] = o[:n]
            pm[i, :n] = 1
        return jnp.asarray(pe), jnp.asarray(pm)

    def format_prompt(self, prompt: str, n_images: int) -> str:
        return self.template.format(prompt)

    # ======================================================================
    # VAE

    def encode_vae_image(self, bundle: ModelBundle, images: np.ndarray) -> jax.Array:
        x = jnp.asarray(images, jnp.float32) / 127.5 - 1.0
        lat = qwen_vae.encode_jit(bundle.vae_params, bundle.vae_cfg, x)
        return pack_latents(lat)

    def latent_grid(self, height: int, width: int) -> tuple[int, int]:
        return (height // (self.vae_scale * 2), width // (self.vae_scale * 2))

    # ======================================================================
    # embeddings

    def prepare_embeddings(self, bundle: ModelBundle, batch: dict,
                           max_sequence_length: int = 1024) -> dict:
        images = np.asarray(batch["image"])
        b, H, W = images.shape[0], images.shape[1], images.shape[2]
        gh, gw = self.latent_grid(H, W)

        ctl_keys = [k for k in ("control",) if k in batch]
        ctl_keys += sorted(k for k in batch if k.startswith("control_") and k != "control")
        vl_images = [[np.asarray(batch[k][i]) for k in ctl_keys] for i in range(b)]
        prompt_embeds, prompt_mask = self.encode_prompt(
            bundle, list(batch["prompt"]), vl_images, max_sequence_length)

        image_latents = self.encode_vae_image(bundle, images)
        img_shapes = [(1, gh, gw)]
        controls = []
        for k in ctl_keys:
            ctl = np.asarray(batch[k])
            ch, cw = self.latent_grid(ctl.shape[1], ctl.shape[2])
            controls.append(self.encode_vae_image(bundle, ctl))
            img_shapes.append((1, ch, cw))

        if not controls:
            img_shapes = img_shapes[:1]
        out = {
            "image_latents": image_latents,
            "prompt_embeds": prompt_embeds,
            "prompt_embeds_mask": prompt_mask,
            "img_shapes_arr": np.asarray(img_shapes, np.int32),
        }
        if controls:
            out["control_latents"] = jnp.concatenate(controls, axis=1)
        else:
            out["control_latents"] = jnp.zeros((b, 0, image_latents.shape[-1]),
                                               image_latents.dtype)
        # RoPE tables are shape-static → precompute on host (python int shapes
        # cannot ride through the jitted batch)
        out.update(self.rope_for(img_shapes, int(prompt_embeds.shape[1])))
        if "edit_mask" in batch:
            out["edit_mask"] = jnp.asarray(batch["edit_mask"])
        return out

    def rope_for(self, img_shapes, txt_len: int) -> dict:
        from qflux_tpu.ops.rope import qwen_rope

        vc, vs, tc, ts = qwen_rope([tuple(int(v) for v in s) for s in img_shapes],
                                   txt_len, self.cfg.axes_dims_rope,
                                   scale_rope=self.cfg.scale_rope)
        return {"rope_vid_cos": vc, "rope_vid_sin": vs,
                "rope_txt_cos": tc, "rope_txt_sin": ts}

    def prepare_cached_embeddings(self, emb: dict) -> dict:
        """Host-side completion of a cache-loaded batch: rebuild the RoPE
        tables from the cached img_shapes_arr (concrete values, pre-jit).

        Mixed-resolution batches get PER-SAMPLE [B, S, D] tables with
        identity-rotation (cos=1, sin=0) padding rows — the TPU analogue of
        the reference's QwenEmbedRopeBatched / identity-rotation padding
        (reference transformer_qwen_custom.py:72-150,
        transformer_flux_custom.py:144-155)."""
        if "rope_vid_cos" in emb:
            return emb
        arr = np.asarray(emb["img_shapes_arr"])
        txt_len = int(np.shape(emb["prompt_embeds"])[1])
        emb = dict(emb)
        if arr.ndim == 2 or bool((arr == arr[0]).all()):
            rows = arr[0] if arr.ndim == 3 else arr
            emb.update(self.rope_for([tuple(r) for r in rows], txt_len))
            return emb
        # multi-res: per-sample tables split into (target | control) sections
        # so they align with the independently-padded latent sections
        max_tgt = int(np.shape(emb["image_latents"])[1])
        max_ctl = int(np.shape(emb["control_latents"])[1])
        vt_cos, vt_sin, tx_cos, tx_sin = [], [], [], []
        for rows in arr:
            shapes = [tuple(int(v) for v in r) for r in rows if int(r[1]) > 0]
            r = self.rope_for(shapes, txt_len)
            s_tgt = shapes[0][0] * shapes[0][1] * shapes[0][2]
            vc, vs = np.asarray(r["rope_vid_cos"]), np.asarray(r["rope_vid_sin"])

            def pad_id(c, sn, n):
                d = c.shape[-1]
                cp = np.concatenate([c, np.ones((n - len(c), d), np.float32)])
                sp = np.concatenate([sn, np.zeros((n - len(sn), d), np.float32)])
                return cp, sp

            tc, ts = pad_id(vc[:s_tgt], vs[:s_tgt], max_tgt)
            cc, cs = pad_id(vc[s_tgt:], vs[s_tgt:], max_ctl)
            vt_cos.append(np.concatenate([tc, cc]))
            vt_sin.append(np.concatenate([ts, cs]))
            tx_cos.append(np.asarray(r["rope_txt_cos"]))
            tx_sin.append(np.asarray(r["rope_txt_sin"]))
        emb["rope_vid_cos"] = jnp.asarray(np.stack(vt_cos))
        emb["rope_vid_sin"] = jnp.asarray(np.stack(vt_sin))
        emb["rope_txt_cos"] = jnp.asarray(np.stack(tx_cos))
        emb["rope_txt_sin"] = jnp.asarray(np.stack(tx_sin))
        return emb

    def cache_embeddings(self, bundle: ModelBundle, item_batch: dict,
                         max_sequence_length: int = 1024):
        emb = self.prepare_embeddings(bundle, item_batch, max_sequence_length)
        # empty prompt for caption dropout (keeps the control image context)
        ctl_keys = [k for k in ("control",) if k in item_batch]
        vl_images = [[np.asarray(item_batch[k][0]) for k in ctl_keys]]
        empty_pe, empty_pm = self.encode_prompt(bundle, [" "], vl_images,
                                                max_sequence_length)
        h = item_batch["file_hashes"][0] if isinstance(item_batch["file_hashes"], list) \
            else item_batch["file_hashes"]
        arrays = {
            "image_latents": np.asarray(emb["image_latents"][0]),
            "control_latents": np.asarray(emb["control_latents"][0]),
            "prompt_embeds": np.asarray(emb["prompt_embeds"][0]),
            "prompt_embeds_mask": np.asarray(emb["prompt_embeds_mask"][0]),
            "empty_prompt_embeds": np.asarray(empty_pe[0]),
            "empty_prompt_embeds_mask": np.asarray(empty_pm[0]),
            "img_shapes_arr": np.asarray(emb["img_shapes_arr"], np.int32),
        }
        hash_keys = {
            "image_latents": h["image_hash"],
            "control_latents": h.get("controls_sum_hash", h["image_hash"]),
            "prompt_embeds": h.get("control_prompt_hash", h["prompt_hash"]),
            "prompt_embeds_mask": h.get("control_prompt_hash", h["prompt_hash"]),
            "empty_prompt_embeds": h.get("control_empty_prompt_hash", h["empty_prompt_hash"]),
            "empty_prompt_embeds_mask": h.get("control_empty_prompt_hash", h["empty_prompt_hash"]),
            "img_shapes_arr": h["main_hash"],
        }
        return arrays, hash_keys

    def prepare_multires_embeddings(self, bundle: ModelBundle,
                                    items: list[dict],
                                    max_sequence_length: int = 1024) -> dict:
        """Mixed-size inference batch → one padded+segment-masked embeddings
        dict (reuses the training path's per-sample identity-padded RoPE)."""
        singles = []
        for item in items:
            batch = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else [v])
                     for k, v in item.items()}
            singles.append(self.prepare_embeddings(bundle, batch, max_sequence_length))

        b = len(singles)
        s_txt = max(int(e["prompt_embeds"].shape[1]) for e in singles)
        s_tgt = max(int(e["image_latents"].shape[1]) for e in singles)
        s_ctl = max(int(e["control_latents"].shape[1]) for e in singles)
        n_planes = max(int(np.asarray(e["img_shapes_arr"]).shape[0]) for e in singles)

        def pad2(x, n):
            x = np.asarray(x)
            return np.pad(x, ((0, n - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))

        emb = {
            "image_latents": np.stack([pad2(e["image_latents"][0], s_tgt) for e in singles]),
            "control_latents": np.stack([pad2(e["control_latents"][0], s_ctl) for e in singles]),
            "prompt_embeds": np.stack([pad2(e["prompt_embeds"][0], s_txt) for e in singles]),
            "prompt_embeds_mask": np.stack([pad2(e["prompt_embeds_mask"][0], s_txt) for e in singles]),
            "img_shapes_arr": np.stack([pad2(np.asarray(e["img_shapes_arr"]), n_planes)
                                        for e in singles]),
        }
        emb = self.prepare_cached_embeddings(emb)  # builds padded rope tables
        segs = []
        for e in singles:
            n_tgt = int(e["image_latents"].shape[1])
            n_ctl = int(e["control_latents"].shape[1])
            pm = pad2(np.asarray(e["prompt_embeds_mask"][0]), s_txt).astype(np.int32)
            segs.append(np.concatenate([
                pm,
                (np.arange(s_tgt) < n_tgt).astype(np.int32),
                (np.arange(s_ctl) < n_ctl).astype(np.int32)]))
        emb["segment_ids"] = np.stack(segs)
        emb["sample_grids"] = [
            (int(np.asarray(e["img_shapes_arr"])[0][1]),
             int(np.asarray(e["img_shapes_arr"])[0][2])) for e in singles]
        return emb

    def negative_embeddings(self, bundle: ModelBundle, negative_prompt: str,
                            batch: dict, max_sequence_length: int = 1024) -> dict:
        """Negative embeds keep the control-image context (reference passes
        the same images with the negative text, qwen_image_edit_trainer.py:
        1180-1199)."""
        ctl_keys = [k for k in ("control",) if k in batch]
        ctl_keys += sorted(k for k in batch if k.startswith("control_") and k != "control")
        b = int(np.shape(batch[ctl_keys[0]])[0]) if ctl_keys else 1
        vl_images = [[np.asarray(batch[k][i]) for k in ctl_keys] for i in range(b)]
        pe, pm = self.encode_prompt(bundle, [negative_prompt] * b, vl_images,
                                    max_sequence_length)
        return {"neg_prompt_embeds": pe, "neg_prompt_embeds_mask": pm}

    # ======================================================================
    # model forward

    def predict_velocity(self, params, batch, latents, sigma):
        ctrl = batch["control_latents"].astype(latents.dtype)
        inp = jnp.concatenate([latents, ctrl], axis=1)
        s_img = latents.shape[1]
        rope = (batch["rope_vid_cos"], batch["rope_vid_sin"],
                batch["rope_txt_cos"], batch["rope_txt_sin"])
        seg = batch.get("segment_ids")
        if seg is None and "prompt_embeds_mask" in batch:
            # text padding masked out of the joint attention (the reference's
            # vendored processor silently attends padded text tokens; the
            # segment-id path masks them properly)
            pm = batch["prompt_embeds_mask"].astype(jnp.int32)
            seg = jnp.concatenate(
                [pm, jnp.ones((pm.shape[0], inp.shape[1]), jnp.int32)], axis=1)
        pred = qwen_dit.forward(
            params, self.cfg, inp,
            batch["prompt_embeds"].astype(latents.dtype),
            sigma,
            img_shapes=None,
            rope=rope,
            segment_ids=seg,
            attn_impl=self.attn_impl,
            remat=self.remat,
            remat_policy=self.remat_policy,
        )
        return pred[:, :s_img]

    # ======================================================================

    def decode_latents(self, bundle: ModelBundle, packed: jax.Array,
                       height: int, width: int) -> np.ndarray:
        gh, gw = self.latent_grid(height, width)
        lat = unpack_latents(packed, gh * 2, gw * 2)
        img = qwen_vae.decode_jit(bundle.vae_params, bundle.vae_cfg, lat.astype(jnp.float32))
        img = (jnp.clip(img, -1, 1) + 1) * 127.5
        return np.asarray(jnp.round(img)).astype(np.uint8)
