"""FLUX.1-Kontext model adapter: model loading, encoding, velocity prediction
and decoding for the shared Trainer.

The reference's FluxKontextLoraTrainer (reference
trainer/flux_kontext_trainer.py:29-1828) owns the torch train loop, device
juggling, and sampling; here the trainer-specific surface is a pure-function
adapter over an embeddings batch:

  batch keys (the cached embedding set of reference cache_step,
  flux_kontext_trainer.py:431-468):
    image_latents          [B, S_img, 64]   packed target VAE latents
    control_latents        [B, S_ctl, 64]   packed control latents (≥1 image)
    prompt_embeds          [B, S_txt, 4096] T5 sequence embeds
    pooled_prompt_embeds   [B, 768]         CLIP pooled embeds
    img_ids                [S_img+S_ctl, 3] (or [B, …, 3] per-sample)
    txt_ids                [S_txt, 3]
    guidance               [B] optional (defaults 1.0 — Kontext-dev)
    segment_ids            [B, S_txt+S_img+S_ctl] optional (multi-res padding)
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from qflux_tpu.config import Config
from qflux_tpu.models.flux import transformer as flux
from qflux_tpu.models.flux import vae as flux_vae
from qflux_tpu.models.flux.text_encoders import (
    CLIPTextConfig,
    T5Config,
    clip_encode_jit,
    clip_init,
    t5_encode_jit,
    t5_init,
)
from qflux_tpu.ops.packing import pack_latents, unpack_latents
from qflux_tpu.ops.rope import flux_image_ids, flux_text_ids
from qflux_tpu.utils.lora_io import flux_module_name, flux_tree_path


@dataclasses.dataclass
class ModelBundle:
    """All model components of one family (the reference's per-trainer
    self.dit/self.vae/self.text_encoder/... attributes)."""

    dit_cfg: Any
    dit_params: Any
    vae_cfg: Any = None
    vae_params: Any = None
    text_cfgs: dict = dataclasses.field(default_factory=dict)
    text_params: dict = dataclasses.field(default_factory=dict)
    tokenizers: dict = dataclasses.field(default_factory=dict)


def remat_policy_from_config(remat_cfg: str) -> str:
    """mesh.remat YAML value → transformer remat_policy name."""
    return {"minimal": "dots", "full": "full", "flash": "flash",
            "flash_mlp": "flash_mlp", "flash_single": "flash_single",
            "flash_offload": "flash_offload"}.get(remat_cfg, "flash")


def attn_impl_from_config(config) -> str:
    """`model.quantize: {enabled: true, attention: true}` → int8 score GEMM
    inside the fused flash kernels (ops/attention.py:qk_norm_rope_attention)."""
    qz = config.model.quantize
    return "int8" if (qz and qz.enabled and qz.attention) else "auto"


class SimpleTokenizer:
    """Hash-based fallback tokenizer for offline/test runs (real runs load the
    HF tokenizers from the checkpoint directory)."""

    def __init__(self, vocab_size: int, max_length: int, eos_token_id: int | None = None):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.eos = eos_token_id

    def __call__(self, texts: list[str], max_length: int | None = None) -> np.ndarray:
        import zlib

        L = max_length or self.max_length
        out = np.zeros((len(texts), L), np.int32)
        for i, t in enumerate(texts):
            # crc32, not hash(): Python string hashing is salted per process,
            # which would give each multi-host process different token ids
            # (jax.device_put cross-process value check caught this)
            toks = [zlib.crc32(w.encode()) % (self.vocab_size - 2) + 1
                    for w in t.split()][: L - 1]
            out[i, : len(toks)] = toks
            if self.eos is not None:
                out[i, len(toks)] = self.eos
        return out

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        """Hashing is one-way; emit placeholder words so greedy-decode wiring
        (VLM prompt enhancer) stays testable offline."""
        return " ".join(f"tok{int(i)}" for i in ids if int(i) != 0)


@dataclasses.dataclass(frozen=True)
class FluxKontextAdapter:
    cfg: flux.FluxConfig
    attn_impl: str = "auto"
    remat: bool = True
    remat_policy: str = "dots"
    vae_scale: int = 8

    # -- identity used by the Trainer ---------------------------------------
    lora_module_name_fn = staticmethod(flux_module_name)
    lora_tree_path_fn = staticmethod(flux_tree_path)
    default_lora_targets = (
        r"attn/(to_q|to_k|to_v|to_out|add_q|add_k|add_v|add_out)",
    )

    # ======================================================================
    # loading

    @classmethod
    def load(cls, config: Config, dtype=jnp.bfloat16) -> tuple["FluxKontextAdapter", ModelBundle]:
        """Build configs + params.  variant="test" → tiny random init;
        otherwise load from local safetensors paths (dit_path/vae_path/…).

        Weight files follow the diffusers checkpoint layout the reference
        downloads from HF (reference models/flux_kontext_loader.py:145-181).
        """
        variant = config.model.variant
        remat = config.mesh.remat != "none"
        policy = remat_policy_from_config(config.mesh.remat)
        impl = attn_impl_from_config(config)
        if variant == "test":
            dit_cfg = flux.FluxConfig.tiny()
            adapter = cls(dit_cfg, attn_impl=impl, remat=remat, remat_policy=policy)
            key = jax.random.PRNGKey(0)
            bundle = ModelBundle(
                dit_cfg=dit_cfg,
                dit_params=flux.init(key, dit_cfg, dtype=dtype),
                vae_cfg=flux_vae.VAEConfig.tiny(),
                vae_params=flux_vae.init(jax.random.fold_in(key, 1),
                                         flux_vae.VAEConfig.tiny(), dtype=jnp.float32),
                text_cfgs={"clip": CLIPTextConfig.tiny(), "t5": T5Config.tiny()},
            )
            bundle.text_params = {
                "clip": clip_init(jax.random.fold_in(key, 2), bundle.text_cfgs["clip"]),
                "t5": t5_init(jax.random.fold_in(key, 3), bundle.text_cfgs["t5"]),
            }
            clip_cfg = bundle.text_cfgs["clip"]
            bundle.tokenizers = {
                "clip": SimpleTokenizer(clip_cfg.vocab_size, clip_cfg.max_position_embeddings,
                                        clip_cfg.eos_token_id),
                "t5": SimpleTokenizer(bundle.text_cfgs["t5"].vocab_size, 64),
            }
            # tiny VAE only downsamples 2x; tiny adapter keeps the real /8 ↔
            # pack conventions by treating its scale as the tiny VAE's
            adapter = cls(dit_cfg, attn_impl=impl, remat=remat, remat_policy=policy,
                          vae_scale=bundle.vae_cfg.downscale)
            return adapter, bundle

        from qflux_tpu.models.porting import (
            convert_clip_text,
            convert_flux_transformer,
            convert_flux_vae,
            load_safetensors,
            convert_t5_encoder,
        )

        root = Path(config.model.pretrained_model_name_or_path or ".")
        dit_cfg = flux.FluxConfig()
        adapter = cls(dit_cfg, attn_impl=impl, remat=remat, remat_policy=policy)

        def _load_dir(p: Path) -> dict[str, np.ndarray]:
            sd: dict[str, np.ndarray] = {}
            files = sorted(p.glob("*.safetensors")) if p.is_dir() else [p]
            if not files:
                raise FileNotFoundError(f"no safetensors under {p}")
            for f in files:
                sd.update(load_safetensors(str(f)))
            return sd

        dit_sd = _load_dir(Path(config.model.dit_path or root / "transformer"))
        bundle = ModelBundle(
            dit_cfg=dit_cfg,
            dit_params=jax.tree.map(
                lambda x: jnp.asarray(x, dtype),
                convert_flux_transformer(dit_sd, dit_cfg.num_layers, dit_cfg.num_single_layers)),
        )
        vae_path = config.model.vae_path or root / "vae"
        if Path(vae_path).exists():
            bundle.vae_cfg = flux_vae.VAEConfig()
            bundle.vae_params = jax.tree.map(
                jnp.asarray, convert_flux_vae(_load_dir(Path(vae_path))))
        te_path = config.model.text_encoder_path or root / "text_encoder"
        if Path(te_path).exists():
            bundle.text_cfgs["clip"] = CLIPTextConfig()
            bundle.text_params["clip"] = jax.tree.map(
                jnp.asarray, convert_clip_text(_load_dir(Path(te_path))))
        te2_path = config.model.text_encoder_2_path or root / "text_encoder_2"
        if Path(te2_path).exists():
            bundle.text_cfgs["t5"] = T5Config()
            bundle.text_params["t5"] = jax.tree.map(
                jnp.asarray, convert_t5_encoder(_load_dir(Path(te2_path))))
        try:
            from transformers import AutoTokenizer

            bundle.tokenizers = {
                "clip": AutoTokenizer.from_pretrained(Path(config.model.tokenizer_path or root / "tokenizer")),
                "t5": AutoTokenizer.from_pretrained(root / "tokenizer_2"),
            }
        except Exception as e:  # pragma: no cover
            logging.warning("tokenizers unavailable (%s); using hash fallback", e)
            bundle.tokenizers = {
                "clip": SimpleTokenizer(49408, 77, 49407),
                "t5": SimpleTokenizer(32128, 512),
            }
        return adapter, bundle

    # ======================================================================
    # encoding (cache pass / non-cached training)

    def encode_prompt(self, bundle: ModelBundle, prompts: list[str],
                      max_sequence_length: int = 512):
        """(prompt_embeds [B,S,4096], pooled [B,768], txt_ids) — dual-encoder
        scheme of reference flux_kontext_trainer.py:798-840."""
        tok_c, tok_t = bundle.tokenizers["clip"], bundle.tokenizers["t5"]
        clip_cfg = bundle.text_cfgs["clip"]
        if isinstance(tok_c, SimpleTokenizer):
            clip_ids = tok_c(prompts)
            t5_ids = tok_t(prompts, max_length=max_sequence_length)
        else:  # HF tokenizers
            clip_ids = np.asarray(tok_c(prompts, padding="max_length", truncation=True,
                                        max_length=77, return_tensors="np")["input_ids"])
            t5_ids = np.asarray(tok_t(prompts, padding="max_length", truncation=True,
                                      max_length=max_sequence_length,
                                      return_tensors="np")["input_ids"])
        _, pooled = clip_encode_jit(bundle.text_params["clip"], clip_cfg, jnp.asarray(clip_ids))
        prompt_embeds = t5_encode_jit(bundle.text_params["t5"], bundle.text_cfgs["t5"],
                                      jnp.asarray(t5_ids))
        txt_ids = jnp.asarray(flux_text_ids(prompt_embeds.shape[1]))
        return prompt_embeds, pooled, txt_ids

    def encode_vae_image(self, bundle: ModelBundle, images: np.ndarray) -> jax.Array:
        """uint8 NHWC [B,H,W,3] → packed latents [B, S, C*4]."""
        x = jnp.asarray(images, jnp.float32) / 127.5 - 1.0
        lat = flux_vae.encode_jit(bundle.vae_params, bundle.vae_cfg, x)  # [B,h,w,C]
        return pack_latents(lat)

    def latent_grid(self, height: int, width: int) -> tuple[int, int]:
        return (height // (self.vae_scale * 2), width // (self.vae_scale * 2))

    def prepare_embeddings(self, bundle: ModelBundle, batch: dict,
                           max_sequence_length: int = 512) -> dict:
        """Full encode of one pixel batch (the non-cached training path /
        cache pass, reference flux_kontext_trainer.py:313-429)."""
        images = np.asarray(batch["image"])
        b, H, W = images.shape[0], images.shape[1], images.shape[2]
        gh, gw = self.latent_grid(H, W)
        prompt_embeds, pooled, txt_ids = self.encode_prompt(
            bundle, list(batch["prompt"]), max_sequence_length)
        image_latents = self.encode_vae_image(bundle, images)

        controls, ids = [], [flux_image_ids(gh, gw, 0)]
        ctl_keys = [k for k in ("control",) if k in batch]
        ctl_keys += sorted(k for k in batch if k.startswith("control_"))
        for i, key in enumerate(ctl_keys):
            ctl = np.asarray(batch[key])
            cg_h, cg_w = self.latent_grid(ctl.shape[1], ctl.shape[2])
            controls.append(self.encode_vae_image(bundle, ctl))
            ids.append(flux_image_ids(cg_h, cg_w, i + 1))
        out = {
            "image_latents": image_latents,
            "prompt_embeds": prompt_embeds,
            "pooled_prompt_embeds": pooled,
            "txt_ids": txt_ids,
            "img_ids": jnp.asarray(np.concatenate(ids)),
        }
        if controls:
            out["control_latents"] = jnp.concatenate(controls, axis=1)
        else:  # control-free training degenerates to pure t2i
            out["control_latents"] = jnp.zeros((b, 0, image_latents.shape[-1]),
                                               image_latents.dtype)
            out["img_ids"] = jnp.asarray(ids[0])
        if "edit_mask" in batch:
            out["edit_mask"] = jnp.asarray(batch["edit_mask"])
        return out

    def cache_embeddings(self, bundle: ModelBundle, item_batch: dict,
                         max_sequence_length: int = 512) -> tuple[dict, dict]:
        """One sample (bs=1 cache pass): returns ({embedding_key: np.ndarray},
        {embedding_key: hash_key_name}) for EmbeddingCacheManager.save — the
        8-embedding set of reference cache_step (flux_kontext_trainer.py:431-468)."""
        emb = self.prepare_embeddings(bundle, item_batch, max_sequence_length)
        empty_pe, empty_pooled, _ = self.encode_prompt(bundle, [""], max_sequence_length)
        h = item_batch["file_hashes"][0] if isinstance(item_batch["file_hashes"], list) \
            else item_batch["file_hashes"]
        # target and control ids cached SEPARATELY: under multi-res batching
        # the latents pad independently, so a fused [tgt+ctl] id array would
        # misalign after padding (prepare_cached_embeddings re-concatenates)
        ids = np.asarray(emb["img_ids"])
        s_img = int(np.shape(emb["image_latents"])[1])
        arrays = {
            "image_latents": np.asarray(emb["image_latents"][0]),
            "control_latents": np.asarray(emb["control_latents"][0]),
            "prompt_embeds": np.asarray(emb["prompt_embeds"][0]),
            "pooled_prompt_embeds": np.asarray(emb["pooled_prompt_embeds"][0]),
            "empty_prompt_embeds": np.asarray(empty_pe[0]),
            "empty_pooled_prompt_embeds": np.asarray(empty_pooled[0]),
            "tgt_ids": ids[:s_img],
            "ctl_ids": ids[s_img:],
            "txt_ids": np.asarray(emb["txt_ids"]),
        }
        hash_keys = {
            "image_latents": h["image_hash"],
            "control_latents": h.get("controls_sum_hash", h["image_hash"]),
            "prompt_embeds": h["prompt_hash"],
            "pooled_prompt_embeds": h["prompt_hash"],
            "empty_prompt_embeds": h["empty_prompt_hash"],
            "empty_pooled_prompt_embeds": h["empty_prompt_hash"],
            "tgt_ids": h["image_hash"],
            "ctl_ids": h.get("controls_sum_hash", h["main_hash"]),
            "txt_ids": h["prompt_hash"],
        }
        return arrays, hash_keys

    def prepare_cached_embeddings(self, emb: dict) -> dict:
        """Rebuild img_ids from the separately-cached target/control ids.

        Single-res batches (identical shapes) collapse to shared 2D ids;
        mixed-resolution batches keep per-sample [B, S, 3] ids (the padded
        rows are segment-masked, so their zero ids are inert)."""
        if "img_ids" in emb or "tgt_ids" not in emb:
            return emb
        emb = dict(emb)
        tgt = np.asarray(emb.pop("tgt_ids"))
        ctl = np.asarray(emb.pop("ctl_ids"))
        txt = np.asarray(emb["txt_ids"]) if "txt_ids" in emb else None
        if tgt.ndim == 3:  # collated per-sample
            ids = np.concatenate([tgt, ctl], axis=1)
            same = bool((ids == ids[0]).all())
            emb["img_ids"] = jnp.asarray(ids[0] if same else ids)
            if txt is not None:
                emb["txt_ids"] = jnp.asarray(txt[0] if txt.ndim == 3 else txt)
        else:
            emb["img_ids"] = jnp.asarray(np.concatenate([tgt, ctl], axis=0))
            if txt is not None:
                emb["txt_ids"] = jnp.asarray(txt)
        return emb

    def prepare_multires_embeddings(self, bundle: ModelBundle,
                                    items: list[dict],
                                    max_sequence_length: int = 512) -> dict:
        """Mixed-size inference batch → ONE padded+segment-masked embeddings
        dict for a single sampler call (the reference's multi-res sampling
        loop with per-step re-pad, flux_kontext_trainer.py:1644-1828,
        re-expressed as static padding + segment ids).

        items: [{"image": HxWx3 target-size reference (zeros ok),
                 "control"/"control_i": control pixels, "prompt": str}, …]
        Returns embeddings + "sample_grids" [(gh, gw), …] for decoding.
        """
        singles = []
        for item in items:
            batch = {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else [v])
                     for k, v in item.items()}
            singles.append(self.prepare_embeddings(bundle, batch, max_sequence_length))

        b = len(singles)
        s_txt = max(int(e["prompt_embeds"].shape[1]) for e in singles)
        s_tgt = max(int(e["image_latents"].shape[1]) for e in singles)
        s_ctl = max(int(e["control_latents"].shape[1]) for e in singles)
        c = int(singles[0]["image_latents"].shape[-1])

        def pad2(x, n):
            x = np.asarray(x)
            return np.pad(x, ((0, n - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))

        out = {
            "image_latents": np.stack([pad2(e["image_latents"][0], s_tgt) for e in singles]),
            "control_latents": np.stack([pad2(e["control_latents"][0], s_ctl) for e in singles]),
            "prompt_embeds": np.stack([pad2(e["prompt_embeds"][0], s_txt) for e in singles]),
            "pooled_prompt_embeds": np.stack([np.asarray(e["pooled_prompt_embeds"][0]) for e in singles]),
            "txt_ids": np.asarray(singles[0]["txt_ids"]),
        }
        ids, segs = [], []
        for e in singles:
            n_tgt = int(e["image_latents"].shape[1])
            n_ctl = int(e["control_latents"].shape[1])
            full_ids = np.asarray(e["img_ids"])
            ids.append(np.concatenate([pad2(full_ids[:n_tgt], s_tgt),
                                       pad2(full_ids[n_tgt:], s_ctl)]))
            segs.append(np.concatenate([
                np.ones(s_txt, np.int32),
                (np.arange(s_tgt) < n_tgt).astype(np.int32),
                (np.arange(s_ctl) < n_ctl).astype(np.int32)]))
        out["img_ids"] = np.stack(ids)
        out["segment_ids"] = np.stack(segs)
        out["attention_mask"] = (np.arange(s_tgt)[None] <
                                 np.asarray([int(e["image_latents"].shape[1])
                                             for e in singles])[:, None]).astype(np.float32)
        out["sample_grids"] = [
            (int(np.asarray(e["img_ids"])[: int(e["image_latents"].shape[1]), 1].max()) + 1,
             int(np.asarray(e["img_ids"])[: int(e["image_latents"].shape[1]), 2].max()) + 1)
            for e in singles]
        return out

    def negative_embeddings(self, bundle: ModelBundle, negative_prompt: str,
                            batch: dict, max_sequence_length: int = 512) -> dict:
        """neg_*-prefixed embeddings for true-CFG sampling (reference
        sampling_from_embeddings negative branch,
        flux_kontext_trainer.py:963-975)."""
        b = len(batch["prompt"]) if "prompt" in batch else int(np.shape(batch["prompt_embeds"])[0])
        pe, pooled, _ = self.encode_prompt(bundle, [negative_prompt] * b,
                                           max_sequence_length)
        return {"neg_prompt_embeds": pe, "neg_pooled_prompt_embeds": pooled}

    # ======================================================================
    # model forward

    def predict_velocity(self, params, batch, latents, sigma):
        """DiT forward over [noisy_target, control] concat, sliced back to
        target tokens (reference _compute_loss, flux_kontext_trainer.py:530-567)."""
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
            remat_policy=self.remat_policy,
        )
        return pred[:, :s_img]

    # ======================================================================
    # decoding

    def decode_latents(self, bundle: ModelBundle, packed: jax.Array,
                       height: int, width: int) -> np.ndarray:
        """Packed latents → uint8 RGB images (reference decode_vae_latent,
        flux_kontext_trainer.py:978-986)."""
        gh, gw = self.latent_grid(height, width)
        lat = unpack_latents(packed, gh * 2, gw * 2)
        img = flux_vae.decode_jit(bundle.vae_params, bundle.vae_cfg, lat.astype(jnp.float32))
        img = (jnp.clip(img, -1, 1) + 1) * 127.5
        return np.asarray(jnp.round(img)).astype(np.uint8)
