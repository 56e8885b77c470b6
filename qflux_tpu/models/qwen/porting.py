"""Qwen-family checkpoint converters (Qwen2.5-VL encoder, Qwen-Image DiT,
Qwen 3D VAE)."""

from __future__ import annotations

from typing import Mapping

import numpy as np

from qflux_tpu.models.porting import (_lin, _lin_nobias, _permute_qk, _permute_qk_scale, _scale, _stack)


def _detect_prefix(sd: Mapping[str, np.ndarray], candidates: list[str]) -> str:
    for c in candidates:
        if any(k.startswith(c) for k in sd):
            return c
    return ""


# ---------------------------------------------------------------------------
# Qwen2.5-VL (HF Qwen2_5_VLForConditionalGeneration names)

def convert_vl_vision(sd: Mapping[str, np.ndarray], depth: int,
                      dtype=np.float32) -> dict:
    pre = _detect_prefix(sd, ["model.visual.", "visual."])
    p = {
        # Conv3d weight [D, C, tps, ps, ps] → [C·tps·ps², D] matmul kernel
        # (flatten order matches the HF processor's patch flattening)
        "patch_embed": {"kernel": np.ascontiguousarray(
            sd[f"{pre}patch_embed.proj.weight"].reshape(
                sd[f"{pre}patch_embed.proj.weight"].shape[0], -1).T).astype(dtype)},
        "merger": {
            "ln_q": _scale(sd, f"{pre}merger.ln_q", dtype),
            "mlp_0": _lin(sd, f"{pre}merger.mlp.0", dtype),
            "mlp_2": _lin(sd, f"{pre}merger.mlp.2", dtype),
        },
        "blocks": [],
    }
    for i in range(depth):
        b = f"{pre}blocks.{i}"
        p["blocks"].append({
            "norm1": _scale(sd, f"{b}.norm1", dtype),
            "norm2": _scale(sd, f"{b}.norm2", dtype),
            "attn": {"qkv": _lin(sd, f"{b}.attn.qkv", dtype),
                     "proj": _lin(sd, f"{b}.attn.proj", dtype)},
            "mlp": {"gate": _lin(sd, f"{b}.mlp.gate_proj", dtype),
                    "up": _lin(sd, f"{b}.mlp.up_proj", dtype),
                    "down": _lin(sd, f"{b}.mlp.down_proj", dtype)},
        })
    from qflux_tpu.models.qwen.vl_encoder import stack_layers
    p["blocks"] = stack_layers(p["blocks"])
    return p


def convert_vl_text(sd: Mapping[str, np.ndarray], num_layers: int,
                    dtype=np.float32) -> dict:
    pre = _detect_prefix(sd, ["model.language_model.", "language_model.model.", "model."])
    p = {
        "embed_tokens": sd[f"{pre}embed_tokens.weight"].astype(dtype),
        "norm": _scale(sd, f"{pre}norm", dtype),
        "layers": [],
    }
    for i in range(num_layers):
        b = f"{pre}layers.{i}"
        p["layers"].append({
            "input_layernorm": _scale(sd, f"{b}.input_layernorm", dtype),
            "post_attention_layernorm": _scale(sd, f"{b}.post_attention_layernorm", dtype),
            "attn": {"q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
                     "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
                     "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
                     "o": _lin_nobias(sd, f"{b}.self_attn.o_proj", dtype)},
            "mlp": {"gate": _lin_nobias(sd, f"{b}.mlp.gate_proj", dtype),
                    "up": _lin_nobias(sd, f"{b}.mlp.up_proj", dtype),
                    "down": _lin_nobias(sd, f"{b}.mlp.down_proj", dtype)},
        })
    from qflux_tpu.models.qwen.vl_encoder import stack_layers
    p["layers"] = stack_layers(p["layers"])
    return p


def convert_vl_lm_head(sd: Mapping[str, np.ndarray], dtype=np.float32) -> dict:
    """LM head for autoregressive decoding (VLM prompt enhancer).

    Qwen2.5-VL ships `lm_head.weight` [vocab, hidden]; smaller variants tie it
    to the token embedding — fall back to embed_tokens then."""
    for key in ("lm_head.weight", "model.lm_head.weight"):
        if key in sd:
            return {"kernel": np.ascontiguousarray(sd[key].T).astype(dtype)}
    pre = _detect_prefix(sd, ["model.language_model.", "language_model.model.", "model."])
    return {"kernel": np.ascontiguousarray(
        sd[f"{pre}embed_tokens.weight"].T).astype(dtype)}


# ---------------------------------------------------------------------------
# Qwen-Image MMDiT (diffusers QwenImageTransformer2DModel names,
# reference models/transformer_qwenimage.py:497-570)

def convert_qwen_image_transformer(sd: Mapping[str, np.ndarray], num_layers=60,
                                   dtype=np.float32, head_dim=128) -> dict:
    """q/k projections + norms permuted to the rotate-half rope layout
    (ops/rope.py:interleaved_to_half_perm; attention outputs invariant)."""
    p = {
        "img_in": _lin(sd, "img_in", dtype),
        "txt_in": _lin(sd, "txt_in", dtype),
        "txt_norm": _scale(sd, "txt_norm", dtype),
        "time_in": {"in": _lin(sd, "time_text_embed.timestep_embedder.linear_1", dtype),
                    "out": _lin(sd, "time_text_embed.timestep_embedder.linear_2", dtype)},
        "norm_out": {"proj": _lin(sd, "norm_out.linear", dtype)},
        "proj_out": _lin(sd, "proj_out", dtype),
    }
    blocks = []
    for i in range(num_layers):
        b = f"transformer_blocks.{i}"
        blocks.append({
            "img_mod": {"proj": _lin(sd, f"{b}.img_mod.1", dtype)},
            "txt_mod": {"proj": _lin(sd, f"{b}.txt_mod.1", dtype)},
            "attn": {
                "to_q": _permute_qk(_lin(sd, f"{b}.attn.to_q", dtype), head_dim),
                "to_k": _permute_qk(_lin(sd, f"{b}.attn.to_k", dtype), head_dim),
                "to_v": _lin(sd, f"{b}.attn.to_v", dtype),
                "to_out": _lin(sd, f"{b}.attn.to_out.0", dtype),
                "add_q": _permute_qk(_lin(sd, f"{b}.attn.add_q_proj", dtype), head_dim),
                "add_k": _permute_qk(_lin(sd, f"{b}.attn.add_k_proj", dtype), head_dim),
                "add_v": _lin(sd, f"{b}.attn.add_v_proj", dtype),
                "add_out": _lin(sd, f"{b}.attn.to_add_out", dtype),
                "norm_q": _permute_qk_scale(_scale(sd, f"{b}.attn.norm_q", dtype), head_dim),
                "norm_k": _permute_qk_scale(_scale(sd, f"{b}.attn.norm_k", dtype), head_dim),
                "norm_added_q": _permute_qk_scale(_scale(sd, f"{b}.attn.norm_added_q", dtype), head_dim),
                "norm_added_k": _permute_qk_scale(_scale(sd, f"{b}.attn.norm_added_k", dtype), head_dim),
            },
            "img_mlp": {"in": _lin(sd, f"{b}.img_mlp.net.0.proj", dtype),
                        "out": _lin(sd, f"{b}.img_mlp.net.2", dtype)},
            "txt_mlp": {"in": _lin(sd, f"{b}.txt_mlp.net.0.proj", dtype),
                        "out": _lin(sd, f"{b}.txt_mlp.net.2", dtype)},
        })
    p["blocks"] = _stack(blocks)
    return p


# ---------------------------------------------------------------------------
# Qwen 3D VAE (diffusers AutoencoderKLQwenImage — the WanVAE layout)

def _c3d(sd, name, dtype=np.float32):
    """CausalConv3d weight [cout, cin, kt, kh, kw] → kernel [kt, kh, kw, cin, cout]."""
    return {"kernel": np.asarray(sd[f"{name}.weight"], dtype).transpose(2, 3, 4, 1, 0),
            "bias": np.asarray(sd[f"{name}.bias"], dtype)}


def _c2d(sd, name, dtype=np.float32):
    """Conv2d weight [cout, cin, kh, kw] → kernel [kh, kw, cin, cout]."""
    return {"kernel": np.asarray(sd[f"{name}.weight"], dtype).transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"{name}.bias"], dtype)}


def _gamma(sd, name, dtype=np.float32):
    """WanRMS_norm gamma [c, 1, 1] (or [c]) → [c]."""
    return {"gamma": np.asarray(sd[f"{name}.gamma"], dtype).reshape(-1)}


def _conv1x1_lin(sd, name, dtype=np.float32):
    """1×1(×1) conv → linear over channels: kernel [cin, cout]."""
    w = np.asarray(sd[f"{name}.weight"], dtype)
    return {"kernel": w.reshape(w.shape[0], w.shape[1]).T.copy(),
            "bias": np.asarray(sd[f"{name}.bias"], dtype)}


def _wan_res(sd, base, dtype):
    p = {"norm1": _gamma(sd, f"{base}.norm1", dtype),
         "conv1": _c3d(sd, f"{base}.conv1", dtype),
         "norm2": _gamma(sd, f"{base}.norm2", dtype),
         "conv2": _c3d(sd, f"{base}.conv2", dtype)}
    if f"{base}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _c3d(sd, f"{base}.conv_shortcut", dtype)
    return p


def _wan_mid(sd, base, dtype):
    return {"res_0": _wan_res(sd, f"{base}.resnets.0", dtype),
            "attn": {"norm": _gamma(sd, f"{base}.attentions.0.norm", dtype),
                     "to_qkv": _conv1x1_lin(sd, f"{base}.attentions.0.to_qkv", dtype),
                     "proj": _conv1x1_lin(sd, f"{base}.attentions.0.proj", dtype)},
            "res_1": _wan_res(sd, f"{base}.resnets.1", dtype)}


def convert_qwen_vae(sd: Mapping[str, np.ndarray], num_res_blocks: int = 2,
                     levels: int = 4, dtype=np.float32) -> dict:
    """diffusers AutoencoderKLQwenImage state dict → models/qwen/vae tree.

    The Wan encoder/decoder store blocks as a FLAT ModuleList (residuals and
    resamples interleaved); this walks it back into the per-level layout.
    `time_conv` weights inside 3D resamples are intentionally skipped: the
    image pipeline runs T=1 frames, where the causal temporal conv reduces to
    identity semantics (only the trailing time slice of each kernel acts —
    models/qwen/vae.py:_conv3d_t1).  quant_conv / post_quant_conv become 1×1
    channel linears applied in encode_moments / decode.
    Reference consumes this model via diffusers (load_model.py:9-47)."""
    enc: dict = {"conv_in": _c3d(sd, "encoder.conv_in", dtype)}
    k = 0
    for i in range(levels):
        blk: dict = {}
        for j in range(num_res_blocks):
            blk[f"res_{j}"] = _wan_res(sd, f"encoder.down_blocks.{k}", dtype)
            k += 1
        if i < levels - 1:
            blk["down"] = _c2d(sd, f"encoder.down_blocks.{k}.resample.1", dtype)
            k += 1
        enc[f"down_{i}"] = blk
    enc["mid"] = _wan_mid(sd, "encoder.mid_block", dtype)
    enc["norm_out"] = _gamma(sd, "encoder.norm_out", dtype)
    enc["conv_out"] = _c3d(sd, "encoder.conv_out", dtype)
    if "quant_conv.weight" in sd:
        enc["quant_conv"] = _conv1x1_lin(sd, "quant_conv", dtype)

    dec: dict = {"conv_in": _c3d(sd, "decoder.conv_in", dtype),
                 "mid": _wan_mid(sd, "decoder.mid_block", dtype)}
    k = 0
    for i in range(levels):
        blk = {}
        for j in range(num_res_blocks + 1):
            blk[f"res_{j}"] = _wan_res(sd, f"decoder.up_blocks.{k}", dtype)
            k += 1
        if i < levels - 1:
            blk["up"] = _c2d(sd, f"decoder.up_blocks.{k}.resample.1", dtype)
            k += 1
        dec[f"up_{i}"] = blk
    dec["norm_out"] = _gamma(sd, "decoder.norm_out", dtype)
    dec["conv_out"] = _c3d(sd, "decoder.conv_out", dtype)
    if "post_quant_conv.weight" in sd:
        dec["post_quant_conv"] = _conv1x1_lin(sd, "post_quant_conv", dtype)
    return {"encoder": enc, "decoder": dec}
