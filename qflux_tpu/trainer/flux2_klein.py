"""FLUX.2-Klein adapter.

Re-design of the reference Flux2KleinLoraTrainer (reference
trainer/flux2_klein_trainer.py:33-652):

  * text conditioning: Qwen3 causal LM, hidden states of layers (9, 18, 27)
    channel-concatenated → [B, L, 3·D]; pooled = sequence mean (reference
    :132-192) — models/flux2/text_encoder.py;
  * 4-axis position ids (t, h, w, l): latents get (set, h, w, 0), text gets
    (0, 0, 0, l) via cartesian product (reference :194-211, 268-284);
  * latents: AutoencoderKL encode → 2×2 patchify → BatchNorm-statistics
    normalization ((z − bn_mean)/bn_std on the 4·C packed channels,
    reference :286-309) → pack to [B, T, 4·C];
  * control images get set-index ids (ids[...,0] = i+1, reference :430-462).

The DiT reuses the FLUX MMDiT body (models/flux/transformer.py) with a
4-axis-RoPE, no-pooled-projection config; the released Flux2 layer counts are
set via Flux2Config and can be overridden from the checkpoint config.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from qflux_tpu.config import Config
from qflux_tpu.models.flux import transformer as flux
from qflux_tpu.models.flux import vae as flux_vae
from qflux_tpu.models.flux2 import text_encoder as qwen3
from qflux_tpu.ops.packing import pack_latents, unpack_latents
from qflux_tpu.trainer.flux_kontext import (ModelBundle, SimpleTokenizer,
                                             attn_impl_from_config,
                                             remat_policy_from_config)
from qflux_tpu.utils.lora_io import flux_module_name, flux_tree_path


def flux2_config(**overrides) -> flux.FluxConfig:
    """FLUX.2-Klein MMDiT topology: 4-axis RoPE, no pooled text projection.

    Layer counts default to the klein-4B release layout; override from the
    checkpoint's config.json when porting weights."""
    base = dict(num_layers=8, num_single_layers=24, attention_head_dim=128,
                num_attention_heads=24, joint_attention_dim=3 * 2560,
                pooled_projection_dim=0, guidance_embeds=True,
                axes_dims_rope=(32, 32, 32, 32))
    base.update(overrides)
    return flux.FluxConfig(**base)


def flux2_config_from_json(path) -> flux.FluxConfig:
    """Derive the DiT topology from the checkpoint's diffusers config.json
    instead of asserting the klein-4B defaults (the reference delegates this
    to diffusers from_pretrained, flux2_klein_loader.py:92-140).

    Unknown ARCHITECTURE keys are a hard error: the FLUX.2 block body is
    implemented from the FLUX.1 MMDiT family (docs/PARITY.md "Flux2-Klein
    audit") and an unconsumed config knob (e.g. a hypothetical
    `parallel_blocks: true`) would mean the checkpoint encodes structure this
    forward does not implement — silently ignoring it would load weights into
    the wrong math. Set QFLUX_FLUX2_ALLOW_UNKNOWN=1 to downgrade to a
    warning after auditing the key."""
    import json
    import logging
    import os

    raw = json.loads(Path(path).read_text())
    keys = ("num_layers", "num_single_layers", "attention_head_dim",
            "num_attention_heads", "joint_attention_dim", "in_channels",
            "out_channels", "patch_size", "guidance_embeds")
    overrides = {k: raw[k] for k in keys if k in raw and raw[k] is not None}
    if raw.get("axes_dims_rope"):
        overrides["axes_dims_rope"] = tuple(raw["axes_dims_rope"])
    if raw.get("pooled_projection_dim") is not None:
        overrides["pooled_projection_dim"] = raw["pooled_projection_dim"]
    known = set(keys) | {"axes_dims_rope", "pooled_projection_dim",
                         "mlp_ratio"}
    unknown = sorted(k for k in raw
                     if k not in known and not k.startswith("_"))
    if unknown:
        msg = (f"flux2 config.json carries architecture keys this "
               f"implementation does not consume: {unknown} — refusing to "
               f"load (see docs/PARITY.md, Flux2-Klein audit). Audit each "
               f"key against models/flux/transformer.py and set "
               f"QFLUX_FLUX2_ALLOW_UNKNOWN=1 to proceed.")
        if os.environ.get("QFLUX_FLUX2_ALLOW_UNKNOWN") != "1":
            raise ValueError(msg)
        logging.warning(msg)
    if raw.get("mlp_ratio") is not None:
        overrides["mlp_ratio"] = raw["mlp_ratio"]
    return flux2_config(**overrides)


def latent_ids_4d(height: int, width: int, set_id: int = 0) -> np.ndarray:
    """[(h·w), 4] ids (t, h, w, l) — cartesian_prod layout (reference :268-284)."""
    ids = np.zeros((height, width, 4), np.float32)
    ids[..., 0] = set_id
    ids[..., 1] = np.arange(height)[:, None]
    ids[..., 2] = np.arange(width)[None, :]
    return ids.reshape(-1, 4)


def text_ids_4d(seq_len: int) -> np.ndarray:
    ids = np.zeros((seq_len, 4), np.float32)
    ids[:, 3] = np.arange(seq_len)
    return ids


@dataclasses.dataclass(frozen=True)
class Flux2KleinAdapter:
    cfg: flux.FluxConfig
    attn_impl: str = "auto"
    remat: bool = True
    remat_policy: str = "dots"
    vae_scale: int = 8
    hidden_states_layers: tuple[int, ...] = (9, 18, 27)

    lora_module_name_fn = staticmethod(flux_module_name)
    lora_tree_path_fn = staticmethod(flux_tree_path)
    default_lora_targets = (r"attn/(to_q|to_k|to_v|to_out|add_q|add_k|add_v|add_out)",)

    @classmethod
    def load(cls, config: Config, dtype=jnp.bfloat16):
        variant = config.model.variant
        remat = config.mesh.remat != "none"
        policy = remat_policy_from_config(config.mesh.remat)
        impl = attn_impl_from_config(config)
        if variant == "test":
            t5cfg = qwen3.Qwen3Config.tiny()
            vae_cfg = flux_vae.VAEConfig.tiny()
            dit_cfg = flux2_config(
                num_layers=2, num_single_layers=2, attention_head_dim=32,
                num_attention_heads=4, joint_attention_dim=3 * t5cfg.hidden_size,
                in_channels=vae_cfg.latent_channels * 4,
                out_channels=vae_cfg.latent_channels * 4,
                axes_dims_rope=(8, 8, 8, 8))
            key = jax.random.PRNGKey(0)
            bundle = ModelBundle(
                dit_cfg=dit_cfg,
                dit_params=flux.init(key, dit_cfg, dtype=dtype),
                vae_cfg=vae_cfg,
                vae_params=flux_vae.init(jax.random.fold_in(key, 1), vae_cfg),
                text_cfgs={"qwen3": t5cfg,
                           "hidden_states_layers": (1, 2, 3),
                           "bn_mean": np.zeros(vae_cfg.latent_channels * 4, np.float32),
                           "bn_std": np.ones(vae_cfg.latent_channels * 4, np.float32)},
                text_params={"qwen3": qwen3.init(jax.random.fold_in(key, 2), t5cfg)},
                tokenizers={"qwen3": SimpleTokenizer(t5cfg.vocab_size - 2, 64)},
            )
            adapter = cls(dit_cfg, attn_impl=impl, remat=remat, remat_policy=policy,
                          vae_scale=vae_cfg.downscale,
                          hidden_states_layers=(1, 2, 3))
            return adapter, bundle

        from qflux_tpu.models.porting import (
            convert_flux_transformer,
            convert_flux_vae,
            convert_with_coverage,
            load_safetensors,
        )

        root = Path(config.model.pretrained_model_name_or_path or ".")
        dit_dir = Path(config.model.dit_path or root / "transformer")
        cfg_json = (dit_dir if dit_dir.is_dir() else dit_dir.parent) / "config.json"
        dit_cfg = flux2_config_from_json(cfg_json) if cfg_json.exists() else flux2_config()
        adapter = cls(dit_cfg, attn_impl=impl, remat=remat, remat_policy=policy)

        def _load_dir(p):
            sd = {}
            files = sorted(Path(p).glob("*.safetensors")) if Path(p).is_dir() else [Path(p)]
            for f in files:
                sd.update(load_safetensors(str(f)))
            if not sd:
                raise FileNotFoundError(f"no safetensors under {p}")
            return sd

        dit_sd = _load_dir(dit_dir)
        dit_tree, _ = convert_with_coverage(
            convert_flux_transformer, dit_sd, dit_cfg.num_layers,
            dit_cfg.num_single_layers, head_dim=dit_cfg.attention_head_dim)
        bundle = ModelBundle(
            dit_cfg=dit_cfg,
            dit_params=jax.tree.map(lambda x: jnp.asarray(x, dtype), dit_tree),
        )
        vae_path = config.model.vae_path or root / "vae"
        if Path(vae_path).exists():
            vae_sd = _load_dir(vae_path)
            bundle.vae_cfg = flux_vae.VAEConfig()
            bundle.vae_params = jax.tree.map(jnp.asarray, convert_flux_vae(vae_sd))
            bundle.text_cfgs["bn_mean"] = vae_sd.get(
                "bn.running_mean", np.zeros(64, np.float32))
            bundle.text_cfgs["bn_std"] = np.sqrt(vae_sd.get(
                "bn.running_var", np.ones(64, np.float32)) + 1e-5)
        te_path = config.model.text_encoder_path or root / "text_encoder"
        if Path(te_path).exists():
            t5cfg = qwen3.Qwen3Config()
            bundle.text_cfgs["qwen3"] = t5cfg
            bundle.text_cfgs["hidden_states_layers"] = (9, 18, 27)
            bundle.text_params["qwen3"] = jax.tree.map(
                jnp.asarray, qwen3.convert_qwen3(_load_dir(te_path), t5cfg.num_layers))
        try:
            from transformers import AutoTokenizer

            bundle.tokenizers = {"qwen3": AutoTokenizer.from_pretrained(Path(config.model.tokenizer_path or root / "tokenizer"))}
        except Exception as e:  # pragma: no cover
            logging.warning("tokenizer unavailable (%s); hash fallback", e)
            bundle.tokenizers = {"qwen3": SimpleTokenizer(150000, 512)}
        return adapter, bundle

    # ------------------------------------------------------------------

    def encode_prompt(self, bundle: ModelBundle, prompts: list[str],
                      max_sequence_length: int = 512):
        tok = bundle.tokenizers["qwen3"]
        cfg3 = bundle.text_cfgs["qwen3"]
        if isinstance(tok, SimpleTokenizer):
            ids = tok(prompts, max_length=min(max_sequence_length, tok.max_length))
            mask = (ids != 0).astype(np.int64)
        else:
            texts = [tok.apply_chat_template(
                [{"role": "user", "content": p}], tokenize=False,
                add_generation_prompt=True, enable_thinking=False) for p in prompts]
            enc = tok(texts, padding="max_length", truncation=True,
                      max_length=max_sequence_length, return_tensors="np")
            ids, mask = enc["input_ids"], enc["attention_mask"]
        layers = bundle.text_cfgs.get("hidden_states_layers", self.hidden_states_layers)
        embeds = qwen3.encode(bundle.text_params["qwen3"], cfg3, jnp.asarray(ids),
                              attention_mask=jnp.asarray(mask),
                              hidden_states_layers=layers)
        pooled = embeds.mean(axis=1)  # reference :244 — sequence mean
        txt_ids = jnp.asarray(text_ids_4d(embeds.shape[1]))
        return embeds, pooled, txt_ids

    def encode_vae_image(self, bundle: ModelBundle, images: np.ndarray) -> jax.Array:
        x = jnp.asarray(images, jnp.float32) / 127.5 - 1.0
        lat = flux_vae.encode_jit(bundle.vae_params, bundle.vae_cfg, x)
        packed = pack_latents(lat)  # [B, T, 4C] — same channel order as patchify
        mean = jnp.asarray(bundle.text_cfgs["bn_mean"], packed.dtype)
        std = jnp.asarray(bundle.text_cfgs["bn_std"], packed.dtype)
        return (packed - mean) / std

    def latent_grid(self, height: int, width: int) -> tuple[int, int]:
        return (height // (self.vae_scale * 2), width // (self.vae_scale * 2))

    def prepare_embeddings(self, bundle: ModelBundle, batch: dict,
                           max_sequence_length: int = 512) -> dict:
        images = np.asarray(batch["image"])
        b, H, W = images.shape[:3]
        gh, gw = self.latent_grid(H, W)
        prompt_embeds, pooled, txt_ids = self.encode_prompt(
            bundle, list(batch["prompt"]), max_sequence_length)
        image_latents = self.encode_vae_image(bundle, images)

        ids = [latent_ids_4d(gh, gw, 0)]
        controls = []
        ctl_keys = [k for k in ("control",) if k in batch]
        ctl_keys += sorted(k for k in batch if k.startswith("control_") and k != "control")
        for i, key in enumerate(ctl_keys):
            ctl = np.asarray(batch[key])
            ch, cw = self.latent_grid(ctl.shape[1], ctl.shape[2])
            controls.append(self.encode_vae_image(bundle, ctl))
            ids.append(latent_ids_4d(ch, cw, i + 1))
        out = {
            "image_latents": image_latents,
            "prompt_embeds": prompt_embeds,
            "pooled_prompt_embeds": pooled,
            "txt_ids": txt_ids,
            "img_ids": jnp.asarray(np.concatenate(ids)),
        }
        if controls:
            out["control_latents"] = jnp.concatenate(controls, axis=1)
        else:
            out["control_latents"] = jnp.zeros((b, 0, image_latents.shape[-1]),
                                               image_latents.dtype)
            out["img_ids"] = jnp.asarray(ids[0])
        if "edit_mask" in batch:
            out["edit_mask"] = jnp.asarray(batch["edit_mask"])
        return out

    def cache_embeddings(self, bundle: ModelBundle, item_batch: dict,
                         max_sequence_length: int = 512):
        emb = self.prepare_embeddings(bundle, item_batch, max_sequence_length)
        empty_pe, empty_pooled, _ = self.encode_prompt(bundle, [""], max_sequence_length)
        h = item_batch["file_hashes"][0] if isinstance(item_batch["file_hashes"], list) \
            else item_batch["file_hashes"]
        arrays = {
            "image_latents": np.asarray(emb["image_latents"][0]),
            "control_latents": np.asarray(emb["control_latents"][0]),
            "prompt_embeds": np.asarray(emb["prompt_embeds"][0]),
            "pooled_prompt_embeds": np.asarray(emb["pooled_prompt_embeds"][0]),
            "empty_prompt_embeds": np.asarray(empty_pe[0]),
            "empty_pooled_prompt_embeds": np.asarray(empty_pooled[0]),
            "img_ids": np.asarray(emb["img_ids"]),
            "txt_ids": np.asarray(emb["txt_ids"]),
        }
        hash_keys = {
            "image_latents": h["image_hash"],
            "control_latents": h.get("controls_sum_hash", h["image_hash"]),
            "prompt_embeds": h["prompt_hash"],
            "pooled_prompt_embeds": h["prompt_hash"],
            "empty_prompt_embeds": h["empty_prompt_hash"],
            "empty_pooled_prompt_embeds": h["empty_prompt_hash"],
            "img_ids": h["main_hash"], "txt_ids": h["prompt_hash"],
        }
        return arrays, hash_keys

    def negative_embeddings(self, bundle: ModelBundle, negative_prompt: str,
                            batch: dict, max_sequence_length: int = 512) -> dict:
        b = len(batch["prompt"]) if "prompt" in batch else 1
        pe, pooled, _ = self.encode_prompt(bundle, [negative_prompt] * b,
                                           max_sequence_length)
        return {"neg_prompt_embeds": pe, "neg_pooled_prompt_embeds": pooled}

    def predict_velocity(self, params, batch, latents, sigma):
        ctrl = batch["control_latents"].astype(latents.dtype)
        inp = jnp.concatenate([latents, ctrl], axis=1)
        s_img = latents.shape[1]
        guidance = batch.get("guidance")
        if guidance is None and self.cfg.guidance_embeds:
            guidance = jnp.ones_like(sigma)
        pred = flux.forward(
            params, self.cfg, inp,
            batch["prompt_embeds"].astype(latents.dtype),
            None,  # no pooled text projection in FLUX.2
            sigma, batch["img_ids"], batch["txt_ids"],
            guidance=guidance,
            segment_ids=batch.get("segment_ids"),
            attn_impl=self.attn_impl, remat=self.remat,
            remat_policy=self.remat_policy,
        )
        return pred[:, :s_img]

    def decode_latents(self, bundle: ModelBundle, packed: jax.Array,
                       height: int, width: int) -> np.ndarray:
        gh, gw = self.latent_grid(height, width)
        mean = jnp.asarray(bundle.text_cfgs["bn_mean"], packed.dtype)
        std = jnp.asarray(bundle.text_cfgs["bn_std"], packed.dtype)
        packed = packed * std + mean
        lat = unpack_latents(packed, gh * 2, gw * 2)
        img = flux_vae.decode_jit(bundle.vae_params, bundle.vae_cfg, lat.astype(jnp.float32))
        img = (jnp.clip(img, -1, 1) + 1) * 127.5
        return np.asarray(jnp.round(img)).astype(np.uint8)
