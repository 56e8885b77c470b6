"""CLIP-L text encoder (pooled) + T5 encoder (sequence) for FLUX conditioning.

The reference loads these via transformers (reference
models/flux_kontext_loader.py: CLIPTextModel + T5EncoderModel; used in
trainer/flux_kontext_trainer.py:798-840 encode_prompt).  Functional JAX
re-implementations; param trees mirror HF module names for porting.

CLIP (openai/clip-vit-large-patch14 text tower): 12 layers, d=768, causal
attention, quick-GELU; pooled output = final-LN hidden at the EOS position.
T5 (google/t5-v1_1-xxl encoder): 24 blocks, d=4096, RMS layernorm (no mean
subtraction), relative-position-bucket attention bias shared from block 0,
gated-GELU feed-forward, no biases anywhere.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from qflux_tpu.ops.layers import dense, dense_init


# ===========================================================================
# CLIP text encoder

@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    eos_token_id: int = 49407

    @classmethod
    def tiny(cls):
        return cls(vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
                   intermediate_size=64, max_position_embeddings=16, eos_token_id=999)


def _ln(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * p["scale"] + p["bias"]).astype(x.dtype)


def clip_init(key, cfg: CLIPTextConfig, dtype=jnp.float32):
    d, ff = cfg.hidden_size, cfg.intermediate_size
    keys = iter(jax.random.split(key, 4 + 6 * cfg.num_layers))
    params = {
        "token_embedding": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02,
        "position_embedding": jax.random.normal(next(keys), (cfg.max_position_embeddings, d), dtype) * 0.02,
        "final_layer_norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "layer_norm1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "layer_norm2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "attn": {
                "q": dense_init(next(keys), d, d, dtype=dtype),
                "k": dense_init(next(keys), d, d, dtype=dtype),
                "v": dense_init(next(keys), d, d, dtype=dtype),
                "out": dense_init(next(keys), d, d, dtype=dtype),
            },
            "mlp": {"fc1": dense_init(next(keys), d, ff, dtype=dtype),
                    "fc2": dense_init(next(keys), ff, d, dtype=dtype)},
        })
    return params


def clip_encode(params, cfg: CLIPTextConfig, input_ids: jax.Array):
    """input_ids [B, S] → (last_hidden [B, S, D], pooled [B, D]).

    Pooled = final-LN hidden at the first EOS token (CLIPTextModel pooler)."""
    b, s = input_ids.shape
    n_h = cfg.num_heads
    x = params["token_embedding"][input_ids] + params["position_embedding"][:s]
    causal = jnp.tril(jnp.ones((s, s), bool))

    for lp in params["layers"]:
        h = _ln(lp["layer_norm1"], x)
        a = lp["attn"]
        q = dense(a["q"], h).reshape(b, s, n_h, -1)
        k = dense(a["k"], h).reshape(b, s, n_h, -1)
        v = dense(a["v"], h).reshape(b, s, n_h, -1)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(q.shape[-1])
        logits = jnp.where(causal[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        x = x + dense(a["out"], o)
        h = _ln(lp["layer_norm2"], x)
        h = dense(lp["mlp"]["fc1"], h)
        h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
        x = x + dense(lp["mlp"]["fc2"], h)

    x = _ln(params["final_layer_norm"], x)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
    pooled = x[jnp.arange(b), eos_pos]
    return x, pooled


# ===========================================================================
# T5 encoder

@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6

    @classmethod
    def tiny(cls):
        return cls(vocab_size=1000, d_model=64, d_kv=16, d_ff=128,
                   num_layers=2, num_heads=4)


def _t5_ln(p, x, eps=1e-6):
    """T5 layer norm: RMS, no mean subtraction, no bias."""
    x32 = x.astype(jnp.float32)
    var = (x32 * x32).mean(-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)).astype(x.dtype)


def _nobias_init(key, cin, cout, dtype):
    return {"kernel": jax.random.normal(key, (cin, cout), dtype) * (cin ** -0.5)}


def t5_init(key, cfg: T5Config, dtype=jnp.float32):
    d, inner = cfg.d_model, cfg.num_heads * cfg.d_kv
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))
    params = {
        "shared": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype),
        "relative_attention_bias": jax.random.normal(
            next(keys), (cfg.relative_attention_num_buckets, cfg.num_heads), dtype) * 0.1,
        "final_layer_norm": {"scale": jnp.ones((d,), dtype)},
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "ln0": {"scale": jnp.ones((d,), dtype)},
            "attn": {"q": _nobias_init(next(keys), d, inner, dtype),
                     "k": _nobias_init(next(keys), d, inner, dtype),
                     "v": _nobias_init(next(keys), d, inner, dtype),
                     "o": _nobias_init(next(keys), inner, d, dtype)},
            "ln1": {"scale": jnp.ones((d,), dtype)},
            "ff": {"wi_0": _nobias_init(next(keys), d, cfg.d_ff, dtype),
                   "wi_1": _nobias_init(next(keys), d, cfg.d_ff, dtype),
                   "wo": _nobias_init(next(keys), cfg.d_ff, d, dtype)},
        })
    return params


def _relative_position_bucket(rel_pos, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucket mapping (half buckets for each sign, log-spaced
    beyond num_buckets//4)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(np.int32) * num_buckets
    n = np.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int32)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


def t5_position_bias(params, cfg: T5Config, seq_len: int) -> jax.Array:
    """[1, heads, S, S] additive attention bias (computed on host: static S)."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    buckets = _relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
    bias = params["relative_attention_bias"][jnp.asarray(buckets)]  # [S, S, H]
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


def t5_encode(params, cfg: T5Config, input_ids: jax.Array,
              attention_mask: jax.Array | None = None) -> jax.Array:
    """input_ids [B, S] → last hidden state [B, S, d_model]."""
    b, s = input_ids.shape
    n_h, dk = cfg.num_heads, cfg.d_kv
    x = params["shared"][input_ids]
    bias = t5_position_bias(params, cfg, s)
    if attention_mask is not None:
        bias = bias + jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, -1e30)

    for lp in params["layers"]:
        h = _t5_ln(lp["ln0"], x, cfg.layer_norm_eps)
        a = lp["attn"]
        q = dense(a["q"], h).reshape(b, s, n_h, dk)
        k = dense(a["k"], h).reshape(b, s, n_h, dk)
        v = dense(a["v"], h).reshape(b, s, n_h, dk)
        # T5 applies NO 1/sqrt(d) scaling (folded into init)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits + bias, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        x = x + dense(a["o"], o)
        h = _t5_ln(lp["ln1"], x, cfg.layer_norm_eps)
        gelu = jax.nn.gelu(dense(lp["ff"]["wi_0"], h), approximate=True)
        x = x + dense(lp["ff"]["wo"], gelu * dense(lp["ff"]["wi_1"], h))

    return _t5_ln(params["final_layer_norm"], x, cfg.layer_norm_eps)


# jitted entry points
import functools as _functools

clip_encode_jit = _functools.partial(jax.jit, static_argnums=(1,))(clip_encode)
t5_encode_jit = _functools.partial(jax.jit, static_argnums=(1,))(t5_encode)
