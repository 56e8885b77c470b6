"""Qwen3 causal-LM text encoder for FLUX.2-Klein.

The reference conditions Klein on Qwen3 hidden states from layers (9, 18, 27)
stacked → [B, L, 3·D] (reference trainer/flux2_klein_trainer.py:132-192).
Qwen3 = Qwen2 decoder with per-head q/k RMSNorm, NO qkv biases, standard 1D
RoPE.  `encode` returns the selected hidden_states (transformers indexing:
hidden_states[k] is the INPUT to layer k, i.e. output of layer k-1, with
hidden_states[0] the embeddings)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qflux_tpu.ops.layers import dense
from qflux_tpu.models.qwen.vl_encoder import _rms_apply, _rotate_half


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    hidden_size: int = 2560            # Qwen3-4B (Klein's encoder)
    num_layers: int = 36
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 9728
    rope_theta: float = 1_000_000.0
    vocab_size: int = 151936
    rms_norm_eps: float = 1e-6

    @classmethod
    def tiny(cls):
        return cls(hidden_size=48, num_layers=4, num_heads=4, num_kv_heads=2,
                   head_dim=12, intermediate_size=96, vocab_size=512)


def init(key, cfg: Qwen3Config, dtype=jnp.float32):
    d = cfg.hidden_size
    q_dim = cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))

    def nb(cin, cout):
        return {"kernel": jax.random.normal(next(keys), (cin, cout), dtype) * (cin ** -0.5)}

    p = {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02,
        "norm": {"scale": jnp.ones((d,), dtype)},
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        p["layers"].append({
            "input_layernorm": {"scale": jnp.ones((d,), dtype)},
            "post_attention_layernorm": {"scale": jnp.ones((d,), dtype)},
            "attn": {"q": nb(d, q_dim), "k": nb(d, kv_dim), "v": nb(d, kv_dim),
                     "o": nb(q_dim, d),
                     "q_norm": {"scale": jnp.ones((cfg.head_dim,), dtype)},
                     "k_norm": {"scale": jnp.ones((cfg.head_dim,), dtype)}},
            "mlp": {"gate": nb(d, cfg.intermediate_size),
                    "up": nb(d, cfg.intermediate_size),
                    "down": nb(cfg.intermediate_size, d)},
        })
    return p


def encode(params, cfg: Qwen3Config, input_ids: jax.Array,
           attention_mask: Optional[jax.Array] = None,
           hidden_states_layers: Sequence[int] = (9, 18, 27)) -> jax.Array:
    """→ [B, L, len(layers)·D] (stack of the selected hidden states,
    channel-concatenated per the reference :186-191)."""
    b, s = input_ids.shape
    hd = cfg.head_dim

    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    pos = np.arange(s, dtype=np.float64)
    freqs = pos[:, None] * inv[None, :]
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos = jnp.asarray(np.cos(emb), jnp.float32)[None, :, None, :]
    sin = jnp.asarray(np.sin(emb), jnp.float32)[None, :, None, :]

    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
    if attention_mask is not None:
        causal = causal & attention_mask[:, None, None, :].astype(bool)

    x = params["embed_tokens"][input_ids]
    collected = {0: x}
    for li, lp in enumerate(params["layers"]):
        h = _rms_apply(lp["input_layernorm"], x, cfg.rms_norm_eps)
        a = lp["attn"]
        q = dense(a["q"], h).reshape(b, s, cfg.num_heads, hd)
        k = dense(a["k"], h).reshape(b, s, cfg.num_kv_heads, hd)
        v = dense(a["v"], h).reshape(b, s, cfg.num_kv_heads, hd)
        q = _rms_apply(a["q_norm"], q, cfg.rms_norm_eps)
        k = _rms_apply(a["k_norm"], k, cfg.rms_norm_eps)
        q = (q.astype(jnp.float32) * cos + _rotate_half(q.astype(jnp.float32)) * sin).astype(x.dtype)
        k = (k.astype(jnp.float32) * cos + _rotate_half(k.astype(jnp.float32)) * sin).astype(x.dtype)
        k = jnp.repeat(k, cfg.num_heads // cfg.num_kv_heads, axis=2)
        v = jnp.repeat(v, cfg.num_heads // cfg.num_kv_heads, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = jnp.where(causal, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        x = x + dense(a["o"], o)
        h = _rms_apply(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        x = x + dense(lp["mlp"]["down"],
                      jax.nn.silu(dense(lp["mlp"]["gate"], h)) * dense(lp["mlp"]["up"], h))
        collected[li + 1] = x
    collected[cfg.num_layers] = _rms_apply(params["norm"], x, cfg.rms_norm_eps)

    picked = [collected[k] for k in hidden_states_layers]
    return jnp.concatenate(picked, axis=-1)


def convert_qwen3(sd, num_layers: int, dtype=np.float32) -> dict:
    """transformers Qwen3ForCausalLM state dict → our tree."""
    from qflux_tpu.models.porting import _lin_nobias, _scale
    from qflux_tpu.models.qwen.porting import _detect_prefix

    pre = _detect_prefix(sd, ["model."])
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
            "attn": {"q": _lin_nobias(sd, f"{b}.self_attn.q_proj", dtype),
                     "k": _lin_nobias(sd, f"{b}.self_attn.k_proj", dtype),
                     "v": _lin_nobias(sd, f"{b}.self_attn.v_proj", dtype),
                     "o": _lin_nobias(sd, f"{b}.self_attn.o_proj", dtype),
                     "q_norm": _scale(sd, f"{b}.self_attn.q_norm", dtype),
                     "k_norm": _scale(sd, f"{b}.self_attn.k_norm", dtype)},
            "mlp": {"gate": _lin_nobias(sd, f"{b}.mlp.gate_proj", dtype),
                    "up": _lin_nobias(sd, f"{b}.mlp.up_proj", dtype),
                    "down": _lin_nobias(sd, f"{b}.mlp.down_proj", dtype)},
        })
    return p
