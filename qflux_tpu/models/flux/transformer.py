"""FLUX MMDiT (19 dual-stream + 38 single-stream blocks) — TPU-native.

Functional re-design of the FLUX.1 transformer the reference vendors
(reference models/transformer_flux.py:557-828; dual block :440-523; single
block :386-437), built for XLA:

  * parameters are a nested-dict pytree; blocks are STACKED (leading axis =
    layer) and iterated with `lax.scan` — one traced block body instead of 57
    unrolled ones, fast compiles, natural per-block remat;
  * joint attention runs through ops.attention (Pallas flash kernel on TPU)
    with segment-id masking replacing the reference's [B,1,S,S] additive
    attention_mask for multi-res padded batches;
  * RoPE cos/sin are computed once per call from the (txt, img) id
    concatenation (ops.rope) — per-sample 3D ids ([B,S,3]) are supported
    directly, which subsumes the reference's FluxPosEmbedBatched custom model
    (reference models/transformer_flux_custom.py:69-172);
  * LoRA lives in a separate tree merged via ops.layers.merge_lora.

Math matches the reference exactly (AdaLN-Zero modulation, qk RMSNorm, GELU-
tanh MLPs, 2×2-packed 64-channel tokens).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from qflux_tpu.models.common.embeddings import mlp_silu, sinusoidal_embedding
from qflux_tpu.ops.attention import qk_norm_rope_attention
from qflux_tpu.ops.layers import dense, dense_init, mlp_init, named_checkpoint
from qflux_tpu.ops.norms import ada_ln_mods, layer_norm, modulate
from qflux_tpu.ops.rope import rope_from_coords


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    patch_size: int = 1
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = True  # FLUX.1-Kontext-dev is guidance-distilled
    axes_dims_rope: tuple[int, ...] = (16, 56, 56)
    mlp_ratio: float = 4.0

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def tiny(cls) -> "FluxConfig":
        """Test-scale topology: same wiring, ~1000× fewer params.  16 in/out
        channels = the tiny VAE's 4 latent channels × 2×2 packing."""
        return cls(num_layers=2, num_single_layers=4, attention_head_dim=32,
                   num_attention_heads=4, joint_attention_dim=64,
                   in_channels=16, out_channels=16,
                   pooled_projection_dim=32, axes_dims_rope=(8, 12, 12))

    @classmethod
    def bench(cls) -> "FluxConfig":
        """Single-chip benchmark topology: full hidden width (3072, 24 heads ×
        128 — identical per-block kernels to the 12B model) with 4 dual + 8
        single blocks so base params (~2.5B, 5 GB bf16) fit one v5e chip.
        Full-model throughput extrapolates exactly by the layer-count FLOPs
        ratio since every block is the same shape."""
        return cls(num_layers=4, num_single_layers=8)

    def matmul_flops(self, s_img: int, s_txt: int) -> float:
        """Analytic forward matmul FLOPs for one sample (2·m·n·k per GEMM),
        including attention score/value GEMMs. Used to extrapolate bench-model
        measurements to the full 19+38-layer model.

        AdaLN modulation projections act on temb [B, D] (no sequence factor)
        — negligible, excluded."""
        d = self.dim
        s = s_img + s_txt
        per_dual = (
            2 * s * d * (8 * d)          # qkv+out for both streams (4 proj × 2 streams)
            + 2 * s * d * (16 * d)       # two 4× MLPs (in+out each 4d²)
            + 4 * s * s * d              # attention: QK^T + PV
        )
        per_single = (
            2 * s * d * (3 * d)          # qkv
            + 2 * s * d * (4 * d)        # proj_mlp
            + 2 * s * d * (5 * d)        # proj_out (d+4d → d)
            + 4 * s * s * d
        )
        head = 2 * s_img * d * (self.in_channels + self.out_channels) + 2 * s_txt * d * self.joint_attention_dim
        return self.num_layers * per_dual + self.num_single_layers * per_single + head


# ---------------------------------------------------------------------------
# init

def _qk_scale(dim_head, dtype):
    return {"scale": jnp.ones((dim_head,), dtype)}


def _dual_block_init(key, cfg: FluxConfig, dtype):
    dim, dh = cfg.dim, cfg.attention_head_dim
    hidden = int(dim * cfg.mlp_ratio)
    ks = jax.random.split(key, 12)
    return {
        "img_mod": {"proj": dense_init(ks[0], dim, 6 * dim, dtype=dtype)},
        "txt_mod": {"proj": dense_init(ks[1], dim, 6 * dim, dtype=dtype)},
        "attn": {
            "to_q": dense_init(ks[2], dim, dim, dtype=dtype),
            "to_k": dense_init(ks[3], dim, dim, dtype=dtype),
            "to_v": dense_init(ks[4], dim, dim, dtype=dtype),
            "to_out": dense_init(ks[5], dim, dim, dtype=dtype),
            "add_q": dense_init(ks[6], dim, dim, dtype=dtype),
            "add_k": dense_init(ks[7], dim, dim, dtype=dtype),
            "add_v": dense_init(ks[8], dim, dim, dtype=dtype),
            "add_out": dense_init(ks[9], dim, dim, dtype=dtype),
            "norm_q": _qk_scale(dh, dtype),
            "norm_k": _qk_scale(dh, dtype),
            "norm_added_q": _qk_scale(dh, dtype),
            "norm_added_k": _qk_scale(dh, dtype),
        },
        "img_mlp": mlp_init(ks[10], dim, hidden, dtype=dtype),
        "txt_mlp": mlp_init(ks[11], dim, hidden, dtype=dtype),
    }


def _single_block_init(key, cfg: FluxConfig, dtype):
    dim, dh = cfg.dim, cfg.attention_head_dim
    hidden = int(dim * cfg.mlp_ratio)
    ks = jax.random.split(key, 6)
    return {
        "mod": {"proj": dense_init(ks[0], dim, 3 * dim, dtype=dtype)},
        "attn": {
            "to_q": dense_init(ks[1], dim, dim, dtype=dtype),
            "to_k": dense_init(ks[2], dim, dim, dtype=dtype),
            "to_v": dense_init(ks[3], dim, dim, dtype=dtype),
            "norm_q": _qk_scale(dh, dtype),
            "norm_k": _qk_scale(dh, dtype),
        },
        "proj_mlp": dense_init(ks[4], dim, hidden, dtype=dtype),
        # proj_out is SPLIT into the attention-input and MLP-input partial
        # GEMMs (y = o@W[:d] + mlp@W[d:], bias on the attn part): the fused
        # [S,5d] concat forced XLA to materialize (and remat-duplicate) a
        # 78 MB intermediate plus its dx twin in backward — measured 46 ms/
        # step of duplicated GEMM work at 512² (docs/PERF.md round 3).
        # Port-time split of the stacked weights keeps scan windowing intact
        # (in-graph slicing of scan-carried weights measured 23× slower).
        "proj_out": dense_init(ks[5], dim, dim, dtype=dtype),
        "proj_out_mlp": {"kernel": dense_init(ks[5], hidden, dim,
                                              dtype=dtype)["kernel"]},
    }


def init(key, cfg: FluxConfig, dtype=jnp.bfloat16):
    dim = cfg.dim
    ks = jax.random.split(key, 8)
    params = {
        "x_embedder": dense_init(ks[0], cfg.in_channels, dim, dtype=dtype),
        "context_embedder": dense_init(ks[1], cfg.joint_attention_dim, dim, dtype=dtype),
        "time_in": mlp_init(ks[2], 256, dim, out_dim=dim, dtype=dtype),
        "dual": jax.vmap(lambda k: _dual_block_init(k, cfg, dtype))(
            jax.random.split(ks[4], cfg.num_layers)),
        "single": jax.vmap(lambda k: _single_block_init(k, cfg, dtype))(
            jax.random.split(ks[5], cfg.num_single_layers)),
        "norm_out": {"proj": dense_init(ks[6], dim, 2 * dim, dtype=dtype)},
        "proj_out": dense_init(ks[7], dim, cfg.patch_size ** 2 * cfg.out_channels, dtype=dtype),
    }
    if cfg.pooled_projection_dim:
        params["pooled_in"] = mlp_init(ks[3], cfg.pooled_projection_dim, dim,
                                       out_dim=dim, dtype=dtype)
    if cfg.guidance_embeds:
        params["guidance_in"] = mlp_init(jax.random.split(ks[7])[0], 256, dim, out_dim=dim, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# forward

def _heads(x, n_heads):
    b, s, _ = x.shape
    return x.reshape(b, s, n_heads, -1)


def _mlp_hidden(p_in, x, mlp_save):
    """MLP up-projection + GELU, optionally with an named remat save point on
    the pre-activation (the 'flash_mlp' policy: backward reuses the saved
    hidden instead of re-running the 4×-wide GEMM)."""
    h = dense(p_in, x)
    if mlp_save:
        h = named_checkpoint(h, "mlp_h")
    return jax.nn.gelu(h, approximate=True)


def _dual_block(p, cfg, img, txt, temb, cos, sin, seg, attn_impl, mlp_save=False):
    n_h = cfg.num_attention_heads
    st = txt.shape[1]

    i_shift, i_scale, i_gate, i_shift2, i_scale2, i_gate2 = ada_ln_mods(p["img_mod"], temb, 6)
    t_shift, t_scale, t_gate, t_shift2, t_scale2, t_gate2 = ada_ln_mods(p["txt_mod"], temb, 6)

    img_n = modulate(layer_norm(img), i_shift, i_scale)
    txt_n = modulate(layer_norm(txt), t_shift, t_scale)

    a = p["attn"]
    # RAW q/k (pre-norm, pre-rope): qk-RMSNorm + rope run inside the fused
    # attention path (ops/flash_nr.py) — txt rows (< st) norm with the
    # norm_added_* scales, img rows with norm_q/norm_k
    q = jnp.concatenate([_heads(dense(a["add_q"], txt_n), n_h),
                         _heads(dense(a["to_q"], img_n), n_h)], axis=1)
    k = jnp.concatenate([_heads(dense(a["add_k"], txt_n), n_h),
                         _heads(dense(a["to_k"], img_n), n_h)], axis=1)
    v = jnp.concatenate([_heads(dense(a["add_v"], txt_n), n_h),
                         _heads(dense(a["to_v"], img_n), n_h)], axis=1)
    qs2 = jnp.stack([a["norm_added_q"]["scale"], a["norm_q"]["scale"]])
    ks2 = jnp.stack([a["norm_added_k"]["scale"], a["norm_k"]["scale"]])

    o = qk_norm_rope_attention(q, k, v, qs2, ks2, cos, sin, st,
                               segment_ids=seg, impl=attn_impl)
    o = o.reshape(o.shape[0], o.shape[1], -1)
    txt_attn, img_attn = o[:, :st], o[:, st:]

    img = img + i_gate[:, None, :].astype(img.dtype) * dense(a["to_out"], img_attn)
    img_mlp_in = modulate(layer_norm(img), i_shift2, i_scale2)
    img = img + i_gate2[:, None, :].astype(img.dtype) * dense(
        p["img_mlp"]["out"], _mlp_hidden(p["img_mlp"]["in"], img_mlp_in, mlp_save))

    txt = txt + t_gate[:, None, :].astype(txt.dtype) * dense(a["add_out"], txt_attn)
    txt_mlp_in = modulate(layer_norm(txt), t_shift2, t_scale2)
    txt = txt + t_gate2[:, None, :].astype(txt.dtype) * dense(
        p["txt_mlp"]["out"], _mlp_hidden(p["txt_mlp"]["in"], txt_mlp_in, mlp_save))
    return img, txt


def _single_block(p, cfg, x, temb, cos, sin, seg, attn_impl, mlp_save=False):
    n_h = cfg.num_attention_heads
    shift, scale, gate = ada_ln_mods(p["mod"], temb, 3)
    x_n = modulate(layer_norm(x), shift, scale)

    a = p["attn"]
    q = _heads(dense(a["to_q"], x_n), n_h)
    k = _heads(dense(a["to_k"], x_n), n_h)
    v = _heads(dense(a["to_v"], x_n), n_h)
    # single-stream: one scale for every row (st=0 → row 1 of the pair)
    qs2 = jnp.stack([a["norm_q"]["scale"], a["norm_q"]["scale"]])
    ks2 = jnp.stack([a["norm_k"]["scale"], a["norm_k"]["scale"]])
    o = qk_norm_rope_attention(q, k, v, qs2, ks2, cos, sin, 0,
                               segment_ids=seg, impl=attn_impl)
    o = o.reshape(o.shape[0], o.shape[1], -1)

    mlp = _mlp_hidden(p["proj_mlp"], x_n, mlp_save)
    if "proj_out_mlp" in p:
        # split partial GEMMs (see init): same math as the concat GEMM —
        # o@W[:d] + mlp@W[d:] — without the [S, d+hidden] intermediate
        out = dense(p["proj_out"], o) + dense(p["proj_out_mlp"], mlp)
    else:  # legacy fused layout (pre-split checkpoints)
        out = dense(p["proj_out"], jnp.concatenate([o, mlp], axis=-1))
    return x + gate[:, None, :].astype(x.dtype) * out


def forward(
    params,
    cfg: FluxConfig,
    hidden_states: jax.Array,          # [B, S_img, in_channels] packed latents
    encoder_hidden_states: jax.Array,  # [B, S_txt, joint_attention_dim]
    pooled_projections: Optional[jax.Array],  # [B, pooled_projection_dim] (None for FLUX.2)
    timestep: jax.Array,               # [B] in [0, 1]
    img_ids: jax.Array,                # [S_img, 3] or [B, S_img, 3]
    txt_ids: jax.Array,                # [S_txt, 3] or [B, S_txt, 3]
    guidance: Optional[jax.Array] = None,   # [B]
    segment_ids: Optional[jax.Array] = None,  # [B, S_txt+S_img]; 0 = padding
    attn_impl: str = "auto",
    remat: bool = True,
    remat_policy: str = "full",  # full | dots (save matmul outputs, less recompute)
) -> jax.Array:
    """Returns [B, S_img, out_channels] velocity prediction (full sequence —
    callers slice [:, :S_target] to drop control-image positions)."""
    img = dense(params["x_embedder"], hidden_states)
    txt = dense(params["context_embedder"], encoder_hidden_states)

    temb = mlp_silu(params["time_in"], sinusoidal_embedding(timestep))
    if cfg.guidance_embeds:
        if guidance is None:
            raise ValueError("guidance_embeds model requires a guidance input")
        temb = temb + mlp_silu(params["guidance_in"], sinusoidal_embedding(guidance))
    if cfg.pooled_projection_dim and pooled_projections is not None:
        temb = temb + mlp_silu(params["pooled_in"], pooled_projections.astype(jnp.float32))
    temb = temb.astype(img.dtype)

    if txt_ids.ndim != img_ids.ndim:  # mixed shared/per-sample ids
        b = hidden_states.shape[0]
        if txt_ids.ndim == 2:
            txt_ids = jnp.broadcast_to(txt_ids[None], (b,) + txt_ids.shape)
        if img_ids.ndim == 2:
            img_ids = jnp.broadcast_to(img_ids[None], (b,) + img_ids.shape)
    ids = jnp.concatenate([txt_ids, img_ids], axis=-2)
    cos, sin = rope_from_coords(ids, cfg.axes_dims_rope)

    st = txt.shape[1]

    mlp_save = remat and remat_policy == "flash_mlp"
    dual_fn = lambda carry, p: (_dual_block(p, cfg, carry[0], carry[1], temb, cos, sin,
                                            segment_ids, attn_impl, mlp_save), None)
    single_fn = lambda x, p: (_single_block(p, cfg, x, temb, cos, sin, segment_ids,
                                            attn_impl, mlp_save), None)
    if remat:
        policy = {"dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                  "dots_all": jax.checkpoint_policies.dots_saveable,
                  # save only the flash-attention kernel outputs (out+lse,
                  # ~16 MB/block at 512² bs=1) so backward skips re-running
                  # the attention forward while everything else recomputes
                  "flash": jax.checkpoint_policies.save_only_these_names(
                      "flash_out", "flash_lse", "mod_out"),
                  # additionally keep q/k/v fed to the kernel — backward
                  # skips their GEMM+rope recompute at ~2.7 GB extra (512²)
                  "flash_qkv": jax.checkpoint_policies.save_only_these_names(
                      "flash_out", "flash_lse", "flash_q", "flash_k",
                      "flash_v", "mod_out"),
                  # flash + saved MLP pre-activations (ops/layers.py
                  # named_checkpoint): backward skips re-running the 4×-wide
                  # MLP GEMMs at the cost of storing the bf16 hidden
                  "flash_mlp": jax.checkpoint_policies.save_only_these_names(
                      "flash_out", "flash_lse", "mlp_h", "mod_out"),
                  # flash saves on the 38 single blocks only, full recompute
                  # on the 19 dual blocks: ~2/3 of the attention-recompute
                  # savings at ~1/3 of the saved-residual memory — the
                  # long-sequence middle ground where full 'flash' exceeds
                  # HBM next to a 12 GB base (docs/PERF.md round 4)
                  "flash_single": jax.checkpoint_policies.save_only_these_names(
                      "flash_out", "flash_lse", "mod_out"),
                  # flash residuals parked in HOST memory across fwd→bwd:
                  # zero HBM residual footprint for the attention outputs,
                  # backward prefetches them back over PCIe — the escape
                  # hatch when flash/flash_single exceed HBM at long
                  # sequences (docs/PERF.md 832×576 wall)
                  "flash_offload":
                      jax.checkpoint_policies.save_and_offload_only_these_names(
                          names_which_can_be_saved=[],
                          names_which_can_be_offloaded=[
                              "flash_out", "flash_lse", "mod_out"],
                          offload_src="device", offload_dst="pinned_host"),
                  "full": None}[remat_policy]
        dual_policy = None if remat_policy == "flash_single" else policy
        dual_fn = jax.checkpoint(dual_fn, prevent_cse=False, policy=dual_policy)
        single_fn = jax.checkpoint(single_fn, prevent_cse=False, policy=policy)

    (img, txt), _ = jax.lax.scan(dual_fn, (img, txt), params["dual"])
    x = jnp.concatenate([txt, img], axis=1)
    x, _ = jax.lax.scan(single_fn, x, params["single"])
    img = x[:, st:]

    scale, shift = ada_ln_mods(params["norm_out"], temb, 2)  # continuous: scale first
    img = modulate(layer_norm(img), shift, scale)
    return dense(params["proj_out"], img)
