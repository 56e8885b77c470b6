"""Torch/safetensors checkpoint → qflux_tpu pytree converters.

The reference loads weights through diffusers/transformers `from_pretrained`
(reference models/flux_kontext_loader.py, load_model.py).  Here checkpoints
are read as flat {name: ndarray} dicts (safetensors or torch state_dict) and
mechanically renamed/transposed into our functional param trees:

  * torch nn.Linear [out, in] → kernel [in, out]  (transpose)
  * torch conv OIHW → HWIO
  * per-layer torch modules  → stacked leaves [L, …] for lax.scan

Converters exist for: FLUX MMDiT, FLUX VAE (AutoencoderKL), CLIP text,
T5 encoder.  Qwen-family converters live in models/qwen/.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from qflux_tpu.ops.rope import interleaved_to_half_perm


def _qk_out_perm(out_dim: int, head_dim: int) -> np.ndarray:
    """Expand the per-head interleaved→rotate-half channel permutation to a
    full projection output dim (ours[..., j] = torch[..., perm[j]])."""
    perm = interleaved_to_half_perm(head_dim)
    return (np.arange(out_dim).reshape(-1, head_dim)[:, perm]).reshape(-1)


def _permute_qk(p: dict, head_dim: int) -> dict:
    """Permute a q/k projection param dict (kernel [..., in, out], bias [out])
    to the rotate-half head layout used by our DiTs (ops/rope.py)."""
    out = dict(p)
    idx = _qk_out_perm(p["kernel"].shape[-1], head_dim)
    out["kernel"] = np.ascontiguousarray(p["kernel"][..., idx])
    if "bias" in p:
        out["bias"] = np.ascontiguousarray(p["bias"][..., idx])
    return out


def _permute_qk_scale(p: dict, head_dim: int) -> dict:
    perm = interleaved_to_half_perm(head_dim)
    return {"scale": np.ascontiguousarray(p["scale"][..., perm])}


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    # pretrained-quantized checkpoints (the reference's fp4/NF4 repos,
    # data/config.py:806-820) become transparent here: bnb 4-bit weights are
    # dequantized so every converter sees a full-precision state dict
    from qflux_tpu.models.nf4 import import_bnb_4bit, is_bnb_4bit

    if is_bnb_4bit(out):
        out = import_bnb_4bit(out)
    return out


def load_torch_state_dict(sd) -> dict[str, np.ndarray]:
    """torch state_dict → numpy dict (host-side, no grad)."""
    return {k: np.asarray(v.detach().to("cpu").float().numpy()) for k, v in sd.items()}


def _lin(sd: Mapping[str, np.ndarray], name: str, dtype=np.float32) -> dict:
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T).astype(dtype)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"].astype(dtype)
    return p


def _lin_nobias(sd, name, dtype=np.float32) -> dict:
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T).astype(dtype)}


def _split_single_proj_out(lin: dict) -> dict:
    """FLUX single-block proj_out [d+hidden, d] → two partial GEMMs
    (models/flux/transformer._single_block): `proj_out` takes the attention
    rows [:d] (+ bias), `proj_out_mlp` the MLP rows [d:].  d is the output
    width — proj_out maps (d attn ‖ hidden mlp) → d."""
    k = lin["kernel"]
    d = k.shape[-1]
    out = {"proj_out": {"kernel": np.ascontiguousarray(k[:d])},
           "proj_out_mlp": {"kernel": np.ascontiguousarray(k[d:])}}
    if "bias" in lin:
        out["proj_out"]["bias"] = lin["bias"]
    return out


def _conv(sd, name, dtype=np.float32) -> dict:
    # OIHW → HWIO
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0)).astype(dtype),
            "bias": sd[f"{name}.bias"].astype(dtype)}


def _gn(sd, name, dtype=np.float32) -> dict:
    return {"scale": sd[f"{name}.weight"].astype(dtype), "bias": sd[f"{name}.bias"].astype(dtype)}


def _scale(sd, name, dtype=np.float32) -> dict:
    return {"scale": sd[f"{name}.weight"].astype(dtype)}


def _stack(trees: list) -> dict:
    """List of identical param dicts → one dict with stacked leaves."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


# ===========================================================================
# FLUX MMDiT (diffusers FluxTransformer2DModel names,
# reference models/transformer_flux.py:557-680)

def convert_flux_transformer(sd: Mapping[str, np.ndarray], num_layers=19,
                             num_single_layers=38, dtype=np.float32,
                             head_dim=128) -> dict:
    """NOTE: q/k projections and their RMS-norm scales are permuted to the
    rotate-half rope layout (attention outputs are invariant; see
    ops/rope.py:interleaved_to_half_perm)."""
    p = {
        "x_embedder": _lin(sd, "x_embedder", dtype),
        "context_embedder": _lin(sd, "context_embedder", dtype),
        "time_in": {"in": _lin(sd, "time_text_embed.timestep_embedder.linear_1", dtype),
                    "out": _lin(sd, "time_text_embed.timestep_embedder.linear_2", dtype)},
        "norm_out": {"proj": _lin(sd, "norm_out.linear", dtype)},
        "proj_out": _lin(sd, "proj_out", dtype),
    }
    if "time_text_embed.text_embedder.linear_1.weight" in sd:
        # absent on FLUX.2-Klein (pooled_projection_dim=0)
        p["pooled_in"] = {
            "in": _lin(sd, "time_text_embed.text_embedder.linear_1", dtype),
            "out": _lin(sd, "time_text_embed.text_embedder.linear_2", dtype)}
    if "time_text_embed.guidance_embedder.linear_1.weight" in sd:
        p["guidance_in"] = {
            "in": _lin(sd, "time_text_embed.guidance_embedder.linear_1", dtype),
            "out": _lin(sd, "time_text_embed.guidance_embedder.linear_2", dtype)}

    duals = []
    for i in range(num_layers):
        b = f"transformer_blocks.{i}"
        duals.append({
            "img_mod": {"proj": _lin(sd, f"{b}.norm1.linear", dtype)},
            "txt_mod": {"proj": _lin(sd, f"{b}.norm1_context.linear", dtype)},
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
            "img_mlp": {"in": _lin(sd, f"{b}.ff.net.0.proj", dtype),
                        "out": _lin(sd, f"{b}.ff.net.2", dtype)},
            "txt_mlp": {"in": _lin(sd, f"{b}.ff_context.net.0.proj", dtype),
                        "out": _lin(sd, f"{b}.ff_context.net.2", dtype)},
        })
    singles = []
    for i in range(num_single_layers):
        b = f"single_transformer_blocks.{i}"
        singles.append({
            "mod": {"proj": _lin(sd, f"{b}.norm.linear", dtype)},
            "attn": {
                "to_q": _permute_qk(_lin(sd, f"{b}.attn.to_q", dtype), head_dim),
                "to_k": _permute_qk(_lin(sd, f"{b}.attn.to_k", dtype), head_dim),
                "to_v": _lin(sd, f"{b}.attn.to_v", dtype),
                "norm_q": _permute_qk_scale(_scale(sd, f"{b}.attn.norm_q", dtype), head_dim),
                "norm_k": _permute_qk_scale(_scale(sd, f"{b}.attn.norm_k", dtype), head_dim),
            },
            "proj_mlp": _lin(sd, f"{b}.proj_mlp", dtype),
            **_split_single_proj_out(_lin(sd, f"{b}.proj_out", dtype)),
        })
    p["dual"] = _stack(duals)
    p["single"] = _stack(singles)
    return p


# ===========================================================================
# FLUX VAE (diffusers AutoencoderKL names)

def _resnet_sd(sd, base, dtype):
    p = {"norm1": _gn(sd, f"{base}.norm1", dtype), "conv1": _conv(sd, f"{base}.conv1", dtype),
         "norm2": _gn(sd, f"{base}.norm2", dtype), "conv2": _conv(sd, f"{base}.conv2", dtype)}
    if f"{base}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv(sd, f"{base}.conv_shortcut", dtype)
    return p


def _vae_attn_sd(sd, base, dtype):
    return {
        "group_norm": _gn(sd, f"{base}.group_norm", dtype),
        "to_q": _lin(sd, f"{base}.to_q", dtype), "to_k": _lin(sd, f"{base}.to_k", dtype),
        "to_v": _lin(sd, f"{base}.to_v", dtype), "to_out": _lin(sd, f"{base}.to_out.0", dtype),
    }


def _mid_sd(sd, base, dtype):
    return {"resnets_0": _resnet_sd(sd, f"{base}.resnets.0", dtype),
            "attentions_0": _vae_attn_sd(sd, f"{base}.attentions.0", dtype),
            "resnets_1": _resnet_sd(sd, f"{base}.resnets.1", dtype)}


def convert_flux_vae(sd: Mapping[str, np.ndarray], num_blocks=4,
                     layers_per_block=2, dtype=np.float32) -> dict:
    enc = {"conv_in": _conv(sd, "encoder.conv_in", dtype),
           "mid": _mid_sd(sd, "encoder.mid_block", dtype),
           "norm_out": _gn(sd, "encoder.conv_norm_out", dtype),
           "conv_out": _conv(sd, "encoder.conv_out", dtype)}
    for i in range(num_blocks):
        blk = {}
        for j in range(layers_per_block):
            blk[f"resnets_{j}"] = _resnet_sd(sd, f"encoder.down_blocks.{i}.resnets.{j}", dtype)
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", dtype)
        enc[f"down_{i}"] = blk
    dec = {"conv_in": _conv(sd, "decoder.conv_in", dtype),
           "mid": _mid_sd(sd, "decoder.mid_block", dtype),
           "norm_out": _gn(sd, "decoder.conv_norm_out", dtype),
           "conv_out": _conv(sd, "decoder.conv_out", dtype)}
    for i in range(num_blocks):
        blk = {}
        for j in range(layers_per_block + 1):
            blk[f"resnets_{j}"] = _resnet_sd(sd, f"decoder.up_blocks.{i}.resnets.{j}", dtype)
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", dtype)
        dec[f"up_{i}"] = blk
    return {"encoder": enc, "decoder": dec}


# ===========================================================================
# CLIP text (transformers CLIPTextModel names)

def convert_clip_text(sd: Mapping[str, np.ndarray], num_layers=12, dtype=np.float32) -> dict:
    pre = "text_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    p = {
        "token_embedding": sd[f"{pre}embeddings.token_embedding.weight"].astype(dtype),
        "position_embedding": sd[f"{pre}embeddings.position_embedding.weight"].astype(dtype),
        "final_layer_norm": _gn(sd, f"{pre}final_layer_norm", dtype),
        "layers": [],
    }
    for i in range(num_layers):
        b = f"{pre}encoder.layers.{i}"
        p["layers"].append({
            "layer_norm1": _gn(sd, f"{b}.layer_norm1", dtype),
            "layer_norm2": _gn(sd, f"{b}.layer_norm2", dtype),
            "attn": {"q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
                     "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
                     "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
                     "out": _lin(sd, f"{b}.self_attn.out_proj", dtype)},
            "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1", dtype),
                    "fc2": _lin(sd, f"{b}.mlp.fc2", dtype)},
        })
    return p


# ===========================================================================
# T5 encoder (transformers T5EncoderModel names)

def convert_t5_encoder(sd: Mapping[str, np.ndarray], num_layers=24, dtype=np.float32) -> dict:
    p = {
        "shared": sd["shared.weight"].astype(dtype),
        "relative_attention_bias": sd[
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"].astype(dtype),
        "final_layer_norm": _scale(sd, "encoder.final_layer_norm", dtype),
        "layers": [],
    }
    for i in range(num_layers):
        b = f"encoder.block.{i}"
        p["layers"].append({
            "ln0": _scale(sd, f"{b}.layer.0.layer_norm", dtype),
            "attn": {"q": _lin_nobias(sd, f"{b}.layer.0.SelfAttention.q", dtype),
                     "k": _lin_nobias(sd, f"{b}.layer.0.SelfAttention.k", dtype),
                     "v": _lin_nobias(sd, f"{b}.layer.0.SelfAttention.v", dtype),
                     "o": _lin_nobias(sd, f"{b}.layer.0.SelfAttention.o", dtype)},
            "ln1": _scale(sd, f"{b}.layer.1.layer_norm", dtype),
            "ff": {"wi_0": _lin_nobias(sd, f"{b}.layer.1.DenseReluDense.wi_0", dtype),
                   "wi_1": _lin_nobias(sd, f"{b}.layer.1.DenseReluDense.wi_1", dtype),
                   "wo": _lin_nobias(sd, f"{b}.layer.1.DenseReluDense.wo", dtype)},
        })
    return p


# ---------------------------------------------------------------------------
# converter coverage auditing

class TrackingStateDict(dict):
    """dict that records key reads, so converters can be audited: every
    checkpoint tensor must be consumed (unconsumed keys = renamed/missing
    parameters that would silently stay random-init)."""

    def __init__(self, sd):
        super().__init__(sd)
        self.accessed: set = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if k in self:
            self.accessed.add(k)
        return super().get(k, default)


def convert_with_coverage(convert_fn, sd, *args, strict: bool = False, **kw):
    """Run a converter and report unconsumed checkpoint keys.

    strict=True raises (scripts/port_weights.py); otherwise logs a warning
    (adapter load time). Returns (tree, unconsumed_keys)."""
    import logging

    tsd = TrackingStateDict(sd)
    tree = convert_fn(tsd, *args, **kw)
    unconsumed = sorted(set(sd) - tsd.accessed)
    if unconsumed:
        msg = (f"{len(unconsumed)}/{len(sd)} checkpoint tensors NOT consumed by "
               f"{getattr(convert_fn, '__name__', convert_fn)}: "
               f"{unconsumed[:8]}{'...' if len(unconsumed) > 8 else ''}")
        if strict:
            raise ValueError(msg)
        logging.warning(msg)
    return tree, unconsumed
