"""Qwen2.5-VL multimodal encoder (vision tower + M-RoPE LM) — TPU-native.

The hard dependency of the Qwen-Image-Edit family (SURVEY.md §7): the
reference conditions the DiT on Qwen2.5-VL-7B hidden states (reference
models/load_model.py:24-35 load_qwenvl; trainer/qwen_image_edit_trainer.py:
946-993 _get_qwen_prompt_embeds — template formatting, hidden_states[-1]
extraction, drop_idx prefix removal).

JAX re-implementation of the public HF architecture:
  * vision tower: 14×14 patches (×2 duplicated frames), rotate-half 2D RoPE,
    window attention (full attention on 4 designated blocks) expressed as
    SEGMENT IDS over the window-reordered sequence — one masked SDPA instead
    of per-window python loops;
  * patch merger: RMSNorm → 2×2 merge → MLP to the LM width;
  * LM: Qwen2 decoder (GQA + qkv bias, SwiGLU, RMSNorm) with multimodal
    3D RoPE (mrope_section channel split over t/h/w position triples);
  * returns the LAST decoder layer's hidden states (pre final-norm), matching
    `output_hidden_states=True; hidden_states[-1]`.

Host-side helpers re-implement the HF processor: smart_resize to 28-multiples,
CLIP-stats normalization, patch flattening, window index computation, and the
images-only simplification of get_rope_index.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qflux_tpu.ops.layers import dense, dense_init

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class VLVisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3456
    num_heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    out_hidden_size: int = 3584
    in_channels: int = 3

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls):
        return cls(depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
                   fullatt_block_indexes=(1,), out_hidden_size=48, window_size=28)


@dataclasses.dataclass(frozen=True)
class VLTextConfig:
    hidden_size: int = 3584
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    intermediate_size: int = 18944
    rope_theta: float = 1_000_000.0
    mrope_section: tuple[int, ...] = (16, 24, 24)
    vocab_size: int = 152064
    rms_norm_eps: float = 1e-6

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls):
        return cls(hidden_size=48, num_layers=2, num_heads=4, num_kv_heads=2,
                   intermediate_size=96, vocab_size=512, mrope_section=(2, 2, 2))


@dataclasses.dataclass(frozen=True)
class VLSpecialTokens:
    image_token_id: int = 151655       # <|image_pad|>
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    # <|im_end|>, <|endoftext|> — stop ids for greedy generation
    eos_token_ids: tuple[int, ...] = (151645, 151643)


# ===========================================================================
# host-side preprocessing (HF Qwen2VLImageProcessor equivalent)

def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56, max_pixels: int = 28 * 28 * 1280):
    """Nearest 28-multiple size within the pixel budget (HF smart_resize)."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio too extreme for the VL encoder")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def preprocess_image(image: np.ndarray, cfg: VLVisionConfig,
                     min_pixels: int = 56 * 56,
                     max_pixels: int = 28 * 28 * 1280):
    """uint8 HWC RGB → (patches [n, C·tps·ps²], grid_thw (1, h, w)).

    Replicates the HF pipeline: smart_resize → rescale 1/255 → CLIP-stats
    normalize → duplicate to temporal_patch_size frames → flatten patches in
    (merged 2×2)-major order."""
    from PIL import Image

    h0, w0 = image.shape[:2]
    factor = cfg.patch_size * cfg.spatial_merge_size
    h, w = smart_resize(h0, w0, factor, min_pixels, max_pixels)
    # PIL bicubic — matches the HF processor's resample kernel exactly
    img = np.asarray(Image.fromarray(image).resize((w, h), Image.BICUBIC))
    x = img.astype(np.float32) / 255.0
    x = (x - np.asarray(OPENAI_CLIP_MEAN)) / np.asarray(OPENAI_CLIP_STD)
    x = x.transpose(2, 0, 1)  # [C, H, W]
    x = np.tile(x[None], (cfg.temporal_patch_size, 1, 1, 1))  # [tps, C, H, W]

    ps, msz, tps = cfg.patch_size, cfg.spatial_merge_size, cfg.temporal_patch_size
    grid_t, grid_h, grid_w = 1, h // ps, w // ps
    c = cfg.in_channels
    patches = x.reshape(tps, c, grid_h // msz, msz, ps, grid_w // msz, msz, ps)
    # → [grid_t, gh/m, gw/m, mh, mw, C, tps, ps, ps]
    patches = patches.transpose(2, 5, 3, 6, 1, 0, 4, 7)
    flat = patches.reshape(grid_h * grid_w, c * tps * ps * ps)
    return flat.astype(np.float32), (grid_t, grid_h, grid_w)


def vision_rot_pos_ids(grid_thw: Sequence[tuple[int, int, int]], merge: int) -> np.ndarray:
    """[S, 2] (h, w) position ids in merged-2×2-major order (HF rot_pos_emb)."""
    out = []
    for t, h, w in grid_thw:
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hp = hp.reshape(h // merge, merge, w // merge, merge).transpose(0, 2, 1, 3).reshape(-1)
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wp = wp.reshape(h // merge, merge, w // merge, merge).transpose(0, 2, 1, 3).reshape(-1)
        ids = np.stack([hp, wp], axis=-1)
        out.append(np.tile(ids, (t, 1)))
    return np.concatenate(out, axis=0)


def window_index(grid_thw, cfg: VLVisionConfig):
    """(window_index [S/4], window segment id per merged unit) — HF
    get_window_index, with cu_seqlens converted to segment ids for the masked
    SDPA."""
    msz = cfg.spatial_merge_size
    vit_ws = cfg.window_size // msz // cfg.patch_size
    idx_list, seg_list = [], []
    base, seg0 = 0, 1
    for t, h, w in grid_thw:
        lh, lw = h // msz, w // msz
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % vit_ws
        pad_w = (-lw) % vit_ws
        nwh, nww = (lh + pad_h) // vit_ws, (lw + pad_w) // vit_ws
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = index
        padded = padded.reshape(t, nwh, vit_ws, nww, vit_ws).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t * nwh * nww, vit_ws * vit_ws)
        for wi, row in enumerate(padded):
            valid = row[row != -100]
            idx_list.append(valid + base)
            seg_list.append(np.full(len(valid), seg0 + wi, np.int32))
        base += t * lh * lw
        seg0 += len(padded)
    return np.concatenate(idx_list), np.concatenate(seg_list)


# ===========================================================================
# init

def stack_layers(layers):
    """List-of-layer-dicts → one dict of [L, …]-stacked leaves (the scan form).

    The canonical storage form for the LM/vision stacks: under jit, a python
    loop over 28 full-width decoder layers unrolls into 28 copies of the layer
    graph (compile time and HLO size ∝ depth); `lax.scan` over stacked params
    compiles the layer ONCE. Numpy leaves stay numpy (converters run
    host-side)."""
    if isinstance(layers, dict):
        return layers  # already stacked
    first = jax.tree.leaves(layers[0])[0]
    stack = np.stack if isinstance(first, np.ndarray) else jnp.stack
    return jax.tree.map(lambda *xs: stack(xs), *layers)


def _rms(c, dtype):
    return {"scale": jnp.ones((c,), dtype)}


def _nb(key, cin, cout, dtype):
    return {"kernel": jax.random.normal(key, (cin, cout), dtype) * (cin ** -0.5)}


def vision_init(key, cfg: VLVisionConfig, dtype=jnp.float32):
    d, ff = cfg.hidden_size, cfg.intermediate_size
    in_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    keys = iter(jax.random.split(key, 8 + 8 * cfg.depth))
    p = {
        "patch_embed": _nb(next(keys), in_dim, d, dtype),  # conv == matmul (stride=kernel)
        "blocks": [],
        "merger": {
            "ln_q": _rms(d, dtype),
            "mlp_0": dense_init(next(keys), d * cfg.spatial_merge_size ** 2,
                                d * cfg.spatial_merge_size ** 2, dtype=dtype),
            "mlp_2": dense_init(next(keys), d * cfg.spatial_merge_size ** 2,
                                cfg.out_hidden_size, dtype=dtype),
        },
    }
    for _ in range(cfg.depth):
        p["blocks"].append({
            "norm1": _rms(d, dtype), "norm2": _rms(d, dtype),
            "attn": {"qkv": dense_init(next(keys), d, 3 * d, dtype=dtype),
                     "proj": dense_init(next(keys), d, d, dtype=dtype)},
            "mlp": {"gate": dense_init(next(keys), d, ff, dtype=dtype),
                    "up": dense_init(next(keys), d, ff, dtype=dtype),
                    "down": dense_init(next(keys), ff, d, dtype=dtype)},
        })
    p["blocks"] = stack_layers(p["blocks"])
    return p


def text_init(key, cfg: VLTextConfig, dtype=jnp.float32):
    d = cfg.hidden_size
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))
    p = {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02,
        "layers": [],
        "norm": _rms(d, dtype),
    }
    for _ in range(cfg.num_layers):
        p["layers"].append({
            "input_layernorm": _rms(d, dtype),
            "post_attention_layernorm": _rms(d, dtype),
            "attn": {"q": dense_init(next(keys), d, d, dtype=dtype),
                     "k": dense_init(next(keys), d, kv_dim, dtype=dtype),
                     "v": dense_init(next(keys), d, kv_dim, dtype=dtype),
                     "o": _nb(next(keys), d, d, dtype)},
            "mlp": {"gate": _nb(next(keys), d, cfg.intermediate_size, dtype),
                    "up": _nb(next(keys), d, cfg.intermediate_size, dtype),
                    "down": _nb(next(keys), cfg.intermediate_size, d, dtype)},
        })
    p["layers"] = stack_layers(p["layers"])
    return p


# ===========================================================================
# vision forward

def _rms_apply(p, x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    var = (x32 * x32).mean(-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)).astype(x.dtype)


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _seg_attn(q, k, v, seg, scale):
    """[S, H, D] unbatched masked SDPA with segment ids [S]."""
    logits = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32) * scale
    mask = seg[:, None] == seg[None, :]
    logits = jnp.where(mask[None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("hqk,khd->qhd", probs, v)


def vision_forward(params, cfg: VLVisionConfig, patches: jax.Array,
                   grid_thw: Sequence[tuple[int, int, int]]) -> jax.Array:
    """patches [S, C·tps·ps²] → merged features [S/merge², out_hidden]."""
    n_h, hd = cfg.num_heads, cfg.head_dim
    msz2 = cfg.spatial_merge_size ** 2

    x = jnp.dot(patches, params["patch_embed"]["kernel"].astype(patches.dtype),
                preferred_element_type=jnp.float32).astype(patches.dtype)
    s = x.shape[0]

    # host-side static index math
    pos = vision_rot_pos_ids(grid_thw, cfg.spatial_merge_size)  # [S, 2]
    win_idx, win_seg_units = window_index(grid_thw, cfg)

    inv = 1.0 / (10000.0 ** (np.arange(0, hd // 2, 2, dtype=np.float64) / (hd // 2)))
    freqs = pos[:, :, None] * inv[None, None, :]       # [S, 2, hd/4]
    freqs = freqs.reshape(s, -1)                        # [S, hd/2]
    emb = np.concatenate([freqs, freqs], axis=-1)       # [S, hd] rotate-half layout
    cos = jnp.asarray(np.cos(emb), jnp.float32)
    sin = jnp.asarray(np.sin(emb), jnp.float32)

    # window reorder (merged 2×2 units move together)
    reorder = (win_idx[:, None] * msz2 + np.arange(msz2)[None, :]).reshape(-1)
    x = x[jnp.asarray(reorder)]
    cos = cos[jnp.asarray(reorder)]
    sin = sin[jnp.asarray(reorder)]
    win_seg = np.repeat(win_seg_units, msz2)

    # full-attention segments: one segment per image plane
    full_seg = np.concatenate([
        np.full(t * h * w, i + 1, np.int32) for i, (t, h, w) in enumerate(grid_thw)])
    full_seg = full_seg[reorder]

    win_seg_j = jnp.asarray(win_seg)
    full_seg_j = jnp.asarray(full_seg)
    scale = hd ** -0.5

    def block(x, xs):
        lp, is_full = xs
        seg = jnp.where(is_full, full_seg_j, win_seg_j)
        h_in = _rms_apply(lp["norm1"], x)
        qkv = dense(lp["attn"]["qkv"], h_in).reshape(s, 3, n_h, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = (q.astype(jnp.float32) * cos[:, None, :] + _rotate_half(q.astype(jnp.float32)) * sin[:, None, :]).astype(x.dtype)
        k = (k.astype(jnp.float32) * cos[:, None, :] + _rotate_half(k.astype(jnp.float32)) * sin[:, None, :]).astype(x.dtype)
        o = _seg_attn(q, k, v, seg, scale).reshape(s, -1)
        x = x + dense(lp["attn"]["proj"], o)
        h_in = _rms_apply(lp["norm2"], x)
        x = x + dense(lp["mlp"]["down"],
                      jax.nn.silu(dense(lp["mlp"]["gate"], h_in)) * dense(lp["mlp"]["up"], h_in))
        return x, None

    blocks = stack_layers(params["blocks"])
    depth = jax.tree.leaves(blocks)[0].shape[0]
    is_full = jnp.asarray([li in cfg.fullatt_block_indexes for li in range(depth)])
    x, _ = jax.lax.scan(block, x, (blocks, is_full))

    # merge 2×2 → MLP
    m = params["merger"]
    x = _rms_apply(m["ln_q"], x).reshape(s // msz2, msz2 * cfg.hidden_size)
    x = dense(m["mlp_2"], jax.nn.gelu(dense(m["mlp_0"], x), approximate=False))
    # undo window reorder at merged granularity
    rev = np.argsort(win_idx)
    return x[jnp.asarray(rev)]


# ===========================================================================
# text (LM) forward with M-RoPE

def mrope_cos_sin(position_ids, cfg: VLTextConfig):
    """position_ids [3, B, S] → (cos, sin) [B, S, head_dim] with the channel
    dim split per mrope_section (t/h/w interleaved halves).  Traceable (jnp)
    so text_forward can be jitted."""
    hd = cfg.head_dim
    inv = jnp.asarray(
        1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd)),
        jnp.float32)
    pos = jnp.asarray(position_ids, jnp.float32)
    freqs = pos[..., None] * inv                               # [3, B, S, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)             # [3, B, S, hd]
    cos3, sin3 = jnp.cos(emb), jnp.sin(emb)
    sections = np.cumsum(list(cfg.mrope_section) * 2)[:-1]
    splits_c = jnp.split(cos3, sections, axis=-1)
    splits_s = jnp.split(sin3, sections, axis=-1)
    cos = jnp.concatenate([m[i % 3] for i, m in enumerate(splits_c)], axis=-1)
    sin = jnp.concatenate([m[i % 3] for i, m in enumerate(splits_s)], axis=-1)
    return cos, sin


def text_forward(params, cfg: VLTextConfig, inputs_embeds: jax.Array,
                 position_ids: np.ndarray,
                 attention_mask: Optional[jax.Array] = None) -> jax.Array:
    """Returns hidden_states[-1] in the transformers sense: the last decoder
    layer's output passed through the FINAL RMSNorm (transformers appends the
    post-norm states as the last hidden_states entry)."""
    b, s, d = inputs_embeds.shape
    n_h, n_kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos, sin = mrope_cos_sin(position_ids, cfg)

    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
    if attention_mask is not None:
        causal = causal & attention_mask[:, None, None, :].astype(bool)

    def layer(x, lp):
        x, _ = _decoder_layer(cfg, x, lp, cos, sin, causal)
        return x, None

    x, _ = jax.lax.scan(layer, inputs_embeds, stack_layers(params["layers"]))
    return _rms_apply(params["norm"], x, cfg.rms_norm_eps)


def _decoder_layer(cfg: VLTextConfig, x, lp, cos, sin, mask):
    """One Qwen2 decoder layer (GQA + qkv bias, SwiGLU). Returns (x, (k, v))
    with k/v pre-GQA-repeat — what a KV cache stores."""
    b, s, d = x.shape
    n_h, n_kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    h = _rms_apply(lp["input_layernorm"], x, cfg.rms_norm_eps)
    a = lp["attn"]
    q = dense(a["q"], h).reshape(b, s, n_h, hd)
    k = dense(a["k"], h).reshape(b, s, n_kv, hd)
    v = dense(a["v"], h).reshape(b, s, n_kv, hd)
    q, k = _rope_qk(q, k, cos, sin, x.dtype)
    kr = jnp.repeat(k, n_h // n_kv, axis=2)
    vr = jnp.repeat(v, n_h // n_kv, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, kr,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(vr.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, vr).reshape(b, s, d)
    x = x + dense(a["o"], o)
    h = _rms_apply(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
    x = x + dense(lp["mlp"]["down"],
                  jax.nn.silu(dense(lp["mlp"]["gate"], h)) * dense(lp["mlp"]["up"], h))
    return x, (k, v)


# ===========================================================================
# KV-cached autoregressive decoding (VLM prompt enhancer,
# reference trainer/dreamomni2_trainer.py:218-336 uses model.generate)
#
# Fixed-size cache + a traced length scalar: ONE compile for prefill and ONE
# for every decode step regardless of how many tokens are generated.

def make_kv_cache(cfg: VLTextConfig, batch: int, max_len: int, dtype=jnp.float32):
    """Per-layer stacked K/V cache [L, B, max_len, n_kv, head_dim]."""
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _rope_qk(q, k, cos, sin, dtype):
    q = (q.astype(jnp.float32) * cos[:, :, None]
         + _rotate_half(q.astype(jnp.float32)) * sin[:, :, None]).astype(dtype)
    k = (k.astype(jnp.float32) * cos[:, :, None]
         + _rotate_half(k.astype(jnp.float32)) * sin[:, :, None]).astype(dtype)
    return q, k


def text_prefill(params, cfg: VLTextConfig, inputs_embeds: jax.Array,
                 position_ids, cache: dict):
    """text_forward that also fills cache[:, :, :S]. Returns (hidden, cache)."""
    s = inputs_embeds.shape[1]
    cos, sin = mrope_cos_sin(position_ids, cfg)
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]

    def layer(x, lp):
        return _decoder_layer(cfg, x, lp, cos, sin, causal)

    x, (ks, vs) = jax.lax.scan(layer, inputs_embeds, stack_layers(params["layers"]))
    cache["k"] = cache["k"].at[:, :, :s].set(ks.astype(cache["k"].dtype))
    cache["v"] = cache["v"].at[:, :, :s].set(vs.astype(cache["v"].dtype))
    return _rms_apply(params["norm"], x, cfg.rms_norm_eps), cache


def text_decode_step(params, cfg: VLTextConfig, embed: jax.Array,
                     position_ids, cache: dict, cache_len):
    """One greedy-decode step: embed [B, 1, D] attends over cache[: cache_len]
    plus itself (written at index cache_len). Returns (hidden [B, D], cache)."""
    b = embed.shape[0]
    n_h, n_kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    max_len = cache["k"].shape[2]
    cos, sin = mrope_cos_sin(position_ids, cfg)
    mask = (jnp.arange(max_len) <= cache_len)[None, None, None, :]

    def layer(x, xs):
        lp, kc, vc = xs
        h = _rms_apply(lp["input_layernorm"], x, cfg.rms_norm_eps)
        a = lp["attn"]
        q = dense(a["q"], h).reshape(b, 1, n_h, hd)
        k = dense(a["k"], h).reshape(b, 1, n_kv, hd)
        v = dense(a["v"], h).reshape(b, 1, n_kv, hd)
        q, k = _rope_qk(q, k, cos, sin, x.dtype)
        kc = jax.lax.dynamic_update_slice(kc, k.astype(kc.dtype),
                                          (0, cache_len, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v.astype(vc.dtype),
                                          (0, cache_len, 0, 0))
        k_all = jnp.repeat(kc.astype(x.dtype), n_h // n_kv, axis=2)
        v_all = jnp.repeat(vc.astype(x.dtype), n_h // n_kv, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_all,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = jnp.where(mask, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v_all).reshape(b, 1, -1)
        x = x + dense(a["o"], o)
        h = _rms_apply(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        x = x + dense(lp["mlp"]["down"],
                      jax.nn.silu(dense(lp["mlp"]["gate"], h)) * dense(lp["mlp"]["up"], h))
        return x, (k.astype(cache["k"].dtype), v.astype(cache["v"].dtype))

    x, (ks, vs) = jax.lax.scan(
        layer, embed, (stack_layers(params["layers"]), cache["k"], cache["v"]))
    cache["k"] = jax.lax.dynamic_update_slice(cache["k"], ks, (0, 0, cache_len, 0, 0))
    cache["v"] = jax.lax.dynamic_update_slice(cache["v"], vs, (0, 0, cache_len, 0, 0))
    return _rms_apply(params["norm"], x, cfg.rms_norm_eps)[:, 0], cache


# ===========================================================================
# rope index (images-only simplification of HF get_rope_index)

def get_rope_index(input_ids: np.ndarray, grid_thw_per_image: list[tuple[int, int, int]],
                   merge: int, tokens: VLSpecialTokens,
                   attention_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """input_ids [B, S] → position_ids [3, B, S] (t/h/w)."""
    b, s = input_ids.shape
    pos = np.zeros((3, b, s), np.int64)
    img_iter = 0
    for bi in range(b):
        ids = input_ids[bi]
        valid = np.ones(s, bool) if attention_mask is None else attention_mask[bi].astype(bool)
        idxs = np.where(valid)[0]
        cur = 0
        out = np.zeros((3, len(idxs)), np.int64)
        i = 0
        local_img = img_iter
        while i < len(idxs):
            tok = ids[idxs[i]]
            if tok == tokens.image_token_id:
                t, h, w = grid_thw_per_image[local_img]
                lh, lw = h // merge, w // merge
                n = t * lh * lw
                tt = np.repeat(np.arange(t), lh * lw)
                hh = np.tile(np.repeat(np.arange(lh), lw), t)
                ww = np.tile(np.arange(lw), t * lh)
                out[0, i:i + n] = cur + tt
                out[1, i:i + n] = cur + hh
                out[2, i:i + n] = cur + ww
                cur = cur + int(max(t, lh, lw))
                i += n
                local_img += 1
            else:
                out[:, i] = cur
                cur += 1
                i += 1
        img_iter = local_img
        pos[:, bi, idxs] = out
    return pos


# jitted entry points: cfg/grid static → one compile per shape bucket
import functools as _functools


@_functools.partial(jax.jit, static_argnums=(1, 3))
def vision_forward_jit(params, cfg, patches, grid_thw_tuple):
    return vision_forward(params, cfg, patches, list(grid_thw_tuple))


text_forward_jit = _functools.partial(jax.jit, static_argnums=(1,))(text_forward)
text_prefill_jit = _functools.partial(
    jax.jit, static_argnums=(1,), donate_argnums=(4,))(text_prefill)
text_decode_step_jit = _functools.partial(
    jax.jit, static_argnums=(1,), donate_argnums=(4,))(text_decode_step)
