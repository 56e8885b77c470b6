"""Qwen-Image MMDiT (60 dual-stream blocks) — TPU-native.

Functional re-design of the vendored QwenImageTransformer2DModel (reference
models/transformer_qwenimage.py:497-668; block :378-494; attention processor
:257-354; RoPE :159-254):

  * scan-over-stacked-blocks with remat (one traced block, 60 iterations);
  * joint [txt, img] attention via ops.attention (Pallas flash on TPU) with
    segment-id masking (replaces encoder_hidden_states_mask / 4D masks);
  * RoPE computed once per call from (video_fhw, txt_seq_len) in the real
    cos/sin form — the reference's complex multiply is algebraically the same
    rotation (ops/rope.py);
  * per-sample RoPE (batched [B, S, D] cos/sin) subsumes the reference's
    QwenEmbedRopeBatched custom model (reference transformer_qwen_custom.py).

Block math (matches the reference exactly): per-stream AdaLN — SiLU(temb) →
Linear(dim→6·dim) → two (shift, scale, gate) triples for attn and MLP; LN
without affine; qk RMSNorm; GELU-tanh MLPs; temb from sinusoidal-256 only
(no pooled text, unlike FLUX).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from qflux_tpu.models.common.embeddings import mlp_silu, sinusoidal_embedding
from qflux_tpu.ops.attention import qk_norm_rope_attention
from qflux_tpu.ops.layers import dense, dense_init, mlp_init, named_checkpoint
from qflux_tpu.ops.norms import layer_norm, rms_norm
from qflux_tpu.ops.rope import qwen_rope


@dataclasses.dataclass(frozen=True)
class QwenImageConfig:
    patch_size: int = 2
    in_channels: int = 64
    out_channels: int = 16
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584
    guidance_embeds: bool = False
    axes_dims_rope: tuple[int, ...] = (16, 56, 56)
    mlp_ratio: float = 4.0
    scale_rope: bool = True

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def tiny(cls) -> "QwenImageConfig":
        return cls(num_layers=2, attention_head_dim=32, num_attention_heads=4,
                   joint_attention_dim=48, in_channels=16, out_channels=4,
                   axes_dims_rope=(8, 12, 12))

    @classmethod
    def bench(cls) -> "QwenImageConfig":
        """Full-width blocks (3072 hidden), reduced depth for one chip."""
        return cls(num_layers=8)

    def matmul_flops(self, s_img: int, s_txt: int) -> float:
        d = self.dim
        s = s_img + s_txt
        per_block = (
            2 * s * d * (8 * d)      # img+txt qkv+out projections
            + 2 * s * d * (16 * d)   # two 4× MLPs
            + 4 * s * s * d          # attention (AdaLN mods act on [B,D]: negligible)
        )
        head = (2 * s_img * d * (self.in_channels
                                 + self.patch_size ** 2 * self.out_channels)
                + 2 * s_txt * d * self.joint_attention_dim)
        return self.num_layers * per_block + head


# ---------------------------------------------------------------------------
# init

def _block_init(key, cfg: QwenImageConfig, dtype):
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
            "norm_q": {"scale": jnp.ones((dh,), dtype)},
            "norm_k": {"scale": jnp.ones((dh,), dtype)},
            "norm_added_q": {"scale": jnp.ones((dh,), dtype)},
            "norm_added_k": {"scale": jnp.ones((dh,), dtype)},
        },
        "img_mlp": mlp_init(ks[10], dim, hidden, dtype=dtype),
        "txt_mlp": mlp_init(ks[11], dim, hidden, dtype=dtype),
    }


def init(key, cfg: QwenImageConfig, dtype=jnp.bfloat16):
    dim = cfg.dim
    ks = jax.random.split(key, 8)
    params = {
        "img_in": dense_init(ks[0], cfg.in_channels, dim, dtype=dtype),
        "txt_norm": {"scale": jnp.ones((cfg.joint_attention_dim,), dtype)},
        "txt_in": dense_init(ks[1], cfg.joint_attention_dim, dim, dtype=dtype),
        "time_in": mlp_init(ks[2], 256, dim, out_dim=dim, dtype=dtype),
        "blocks": jax.vmap(lambda k: _block_init(k, cfg, dtype))(
            jax.random.split(ks[3], cfg.num_layers)),
        "norm_out": {"proj": dense_init(ks[4], dim, 2 * dim, dtype=dtype)},
        "proj_out": dense_init(ks[5], dim, cfg.patch_size ** 2 * cfg.out_channels,
                               dtype=dtype),
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = mlp_init(ks[6], 256, dim, out_dim=dim, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# forward

def _heads(x, n):
    return x.reshape(x.shape[0], x.shape[1], n, -1)


def _joint_tables(txt_cos, txt_sin, vid_cos, vid_sin):
    """Concatenate per-stream rope tables into joint [S_txt+S_img, D] (or
    [B, S, D] when either side is per-sample)."""
    if txt_cos.ndim != vid_cos.ndim:
        b = (txt_cos.shape[0] if txt_cos.ndim == 3 else vid_cos.shape[0])
        up = lambda t: (jnp.broadcast_to(t[None], (b,) + t.shape)
                        if t.ndim == 2 else t)
        txt_cos, txt_sin = up(txt_cos), up(txt_sin)
        vid_cos, vid_sin = up(vid_cos), up(vid_sin)
    return (jnp.concatenate([txt_cos, vid_cos], axis=-2),
            jnp.concatenate([txt_sin, vid_sin], axis=-2))


def _modulate3(x, mod):
    """mod [B, 3D] → (modulated x, gate [B,1,D]); chunk order shift/scale/gate."""
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    y = x * (1.0 + scale[:, None, :].astype(x.dtype)) + shift[:, None, :].astype(x.dtype)
    return y, gate[:, None, :].astype(x.dtype)


def _mlp_hidden(p_in, x, mlp_save):
    """MLP up-projection + GELU with an optional named remat save point on the
    pre-activation (flash_mlp policy — see ops/layers.named_checkpoint)."""
    h = dense(p_in, x)
    if mlp_save:
        h = named_checkpoint(h, "mlp_h")
    return jax.nn.gelu(h, approximate=True)


def _block(p, cfg, img, txt, temb, vid_cos, vid_sin, txt_cos, txt_sin, seg,
           attn_impl, mlp_save=False):
    n_h = cfg.num_attention_heads
    st = txt.shape[1]

    # "mod_out" save point: tiny vectors whose recompute re-sweeps the
    # [D, 6D] weights from HBM (see ops/norms.py:ada_ln_mods)
    temb_s = jax.nn.silu(temb.astype(jnp.float32))
    img_mod = named_checkpoint(dense(p["img_mod"]["proj"], temb_s), "mod_out")
    txt_mod = named_checkpoint(dense(p["txt_mod"]["proj"], temb_s), "mod_out")
    img_mod1, img_mod2 = jnp.split(img_mod, 2, axis=-1)
    txt_mod1, txt_mod2 = jnp.split(txt_mod, 2, axis=-1)

    img_n, img_gate1 = _modulate3(layer_norm(img), img_mod1)
    txt_n, txt_gate1 = _modulate3(layer_norm(txt), txt_mod1)

    a = p["attn"]
    # RAW q/k, joint order [txt, img] (reference transformer_qwenimage.py:
    # 322-325); qk-RMSNorm + rope run inside the fused attention path
    # (ops/flash_nr.py) with the per-stream scales selected by row < st
    q = jnp.concatenate([_heads(dense(a["add_q"], txt_n), n_h),
                         _heads(dense(a["to_q"], img_n), n_h)], axis=1)
    k = jnp.concatenate([_heads(dense(a["add_k"], txt_n), n_h),
                         _heads(dense(a["to_k"], img_n), n_h)], axis=1)
    v = jnp.concatenate([_heads(dense(a["add_v"], txt_n), n_h),
                         _heads(dense(a["to_v"], img_n), n_h)], axis=1)
    qs2 = jnp.stack([a["norm_added_q"]["scale"], a["norm_q"]["scale"]])
    ks2 = jnp.stack([a["norm_added_k"]["scale"], a["norm_k"]["scale"]])
    cos_j, sin_j = _joint_tables(txt_cos, txt_sin, vid_cos, vid_sin)
    o = qk_norm_rope_attention(q, k, v, qs2, ks2, cos_j, sin_j, st,
                               segment_ids=seg, impl=attn_impl)
    o = o.reshape(o.shape[0], o.shape[1], -1)
    txt_attn, img_attn = o[:, :st], o[:, st:]

    img = img + img_gate1 * dense(a["to_out"], img_attn)
    txt = txt + txt_gate1 * dense(a["add_out"], txt_attn)

    img_n2, img_gate2 = _modulate3(layer_norm(img), img_mod2)
    img = img + img_gate2 * dense(
        p["img_mlp"]["out"], _mlp_hidden(p["img_mlp"]["in"], img_n2, mlp_save))
    txt_n2, txt_gate2 = _modulate3(layer_norm(txt), txt_mod2)
    txt = txt + txt_gate2 * dense(
        p["txt_mlp"]["out"], _mlp_hidden(p["txt_mlp"]["in"], txt_n2, mlp_save))
    return img, txt


def forward(
    params,
    cfg: QwenImageConfig,
    hidden_states: jax.Array,           # [B, S_img, in_channels]
    encoder_hidden_states: jax.Array,   # [B, S_txt, joint_attention_dim]
    timestep: jax.Array,                # [B] σ ∈ [0, 1]
    img_shapes: list[tuple[int, int, int]],  # [(f, h, w), …] per image plane
    guidance: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,   # [B, S_txt + S_img]
    rope: Optional[tuple] = None,       # precomputed (vid_cos, vid_sin, txt_cos, txt_sin)
    attn_impl: str = "auto",
    remat: bool = True,
    remat_policy: str = "full",
) -> jax.Array:
    """Returns [B, S_img, patch²·out_channels] over the full image stream."""
    img = dense(params["img_in"], hidden_states)
    txt = rms_norm(encoder_hidden_states, params["txt_norm"]["scale"])
    txt = dense(params["txt_in"], txt)

    temb = mlp_silu(params["time_in"], sinusoidal_embedding(timestep))
    if cfg.guidance_embeds and guidance is not None:
        temb = temb + mlp_silu(params["guidance_in"], sinusoidal_embedding(guidance))
    temb = temb.astype(img.dtype)

    if rope is None:
        rope = qwen_rope(img_shapes, txt.shape[1], cfg.axes_dims_rope,
                         scale_rope=cfg.scale_rope)
    vid_cos, vid_sin, txt_cos, txt_sin = rope

    mlp_save = remat and remat_policy == "flash_mlp"

    def body(carry, p):
        i, t = _block(p, cfg, carry[0], carry[1], temb, vid_cos, vid_sin,
                      txt_cos, txt_sin, segment_ids, attn_impl, mlp_save)
        return (i, t), None

    if remat:
        policy = {"dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                  "dots_all": jax.checkpoint_policies.dots_saveable,
                  "flash": jax.checkpoint_policies.save_only_these_names(
                      "flash_out", "flash_lse", "mod_out"),
                  "flash_qkv": jax.checkpoint_policies.save_only_these_names(
                      "flash_out", "flash_lse", "flash_q", "flash_k",
                      "flash_v", "mod_out"),
                  "flash_mlp": jax.checkpoint_policies.save_only_these_names(
                      "flash_out", "flash_lse", "mlp_h", "mod_out"),
                  # no dual/single split in this architecture — same as flash
                  "flash_single": jax.checkpoint_policies.save_only_these_names(
                      "flash_out", "flash_lse", "mod_out"),
                  # flash residuals parked in HOST memory across fwd→bwd
                  # (see models/flux/transformer.py for the rationale)
                  "flash_offload":
                      jax.checkpoint_policies.save_and_offload_only_these_names(
                          names_which_can_be_saved=[],
                          names_which_can_be_offloaded=[
                              "flash_out", "flash_lse", "mod_out"],
                          offload_src="device", offload_dst="pinned_host"),
                  "full": None}[remat_policy]
        body = jax.checkpoint(body, prevent_cse=False, policy=policy)
    (img, txt), _ = jax.lax.scan(body, (img, txt), params["blocks"])

    from qflux_tpu.ops.norms import ada_ln_mods, modulate

    scale, shift = ada_ln_mods(params["norm_out"], temb, 2)
    img = modulate(layer_norm(img), shift, scale)
    return dense(params["proj_out"], img)
