"""AutoencoderKL (FLUX VAE) — functional NHWC implementation.

Replaces the diffusers AutoencoderKL the reference loads (reference
models/flux_kontext_loader.py load_vae; used at
trainer/flux_kontext_trainer.py:885-889 via `.latent_dist.mode()` — encoding
is DETERMINISTIC, which is what makes the embedding cache exact).

Layout is NHWC (TPU-native; channels on the 128-lane dim) vs torch's NCHW.
Param-tree keys mirror diffusers module names so safetensors porting is a
mechanical rename (models/porting.py).

Architecture (FLUX.1 config): 128/256/512/512 channels, 2 resnets per down
block, mid block with single-head spatial attention, 16 latent channels,
no quant convs; encode: conv stack → [mean, logvar]; mode() = mean;
normalize: (z - shift_factor) * scaling_factor.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 16
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(8, 16), layers_per_block=1,
                   latent_channels=4, norm_num_groups=4,
                   scaling_factor=1.0, shift_factor=0.0)


# ---------------------------------------------------------------------------
# primitives

def _conv(p, x, stride=1, padding=1):
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(x.dtype)


def _group_norm(p, x, groups, eps=1e-6):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _resnet(p, x, groups):
    h = _conv(p["conv1"], jax.nn.silu(_group_norm(p["norm1"], x, groups)))
    h = _conv(p["conv2"], jax.nn.silu(_group_norm(p["norm2"], h, groups)))
    if "conv_shortcut" in p:
        x = _conv(p["conv_shortcut"], x, padding=0)
    return x + h


# past this sequence length the spatial attention runs query-chunked: the
# full [S, S] f32 score matrix at e.g. a 256×256 latent grid is 16 GB and
# OOMs the chip at compile time (found by driving validation end-to-end)
ATTN_CHUNK = 4096


def _sdpa(q, k, v, c):
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits / (c ** 0.5), axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkc->bqc", probs, v)


def _attn_block(p, x, groups):
    """Single-head spatial self-attention (diffusers Attention in VAE mid
    block). Large grids chunk the query axis — identical per-row softmax,
    O(S·chunk) score memory instead of O(S²)."""
    b, h, w, c = x.shape
    s = h * w
    y = _group_norm(p["group_norm"], x, groups).reshape(b, s, c)
    q = y @ p["to_q"]["kernel"].astype(y.dtype) + p["to_q"]["bias"].astype(y.dtype)
    k = y @ p["to_k"]["kernel"].astype(y.dtype) + p["to_k"]["bias"].astype(y.dtype)
    v = y @ p["to_v"]["kernel"].astype(y.dtype) + p["to_v"]["bias"].astype(y.dtype)
    if s > ATTN_CHUNK:
        cq = ATTN_CHUNK
        while s % cq:  # largest divisor of S that is ≤ the chunk target
            cq //= 2
        qc = q.reshape(b, s // cq, cq, c).transpose(1, 0, 2, 3)
        o = jax.lax.map(lambda qi: _sdpa(qi, k, v, c), qc)
        o = o.transpose(1, 0, 2, 3).reshape(b, s, c)
    else:
        o = _sdpa(q, k, v, c)
    o = o @ p["to_out"]["kernel"].astype(o.dtype) + p["to_out"]["bias"].astype(o.dtype)
    return x + o.reshape(b, h, w, c)


def _mid_block(p, x, groups):
    x = _resnet(p["resnets_0"], x, groups)
    x = _attn_block(p["attentions_0"], x, groups)
    return _resnet(p["resnets_1"], x, groups)


# ---------------------------------------------------------------------------
# init

def _conv_init(key, kh, kw, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = (1.0 / fan_in) ** 0.5
    return {
        "kernel": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def _gn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _resnet_init(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin, dtype), "conv1": _conv_init(ks[0], 3, 3, cin, cout, dtype),
        "norm2": _gn_init(cout, dtype), "conv2": _conv_init(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _conv_init(ks[2], 1, 1, cin, cout, dtype)
    return p


def _dense_init(key, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    bound = (1.0 / cin) ** 0.5
    return {"kernel": jax.random.uniform(k1, (cin, cout), dtype, -bound, bound),
            "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound)}


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "group_norm": _gn_init(c, dtype),
        "to_q": _dense_init(ks[0], c, c, dtype), "to_k": _dense_init(ks[1], c, c, dtype),
        "to_v": _dense_init(ks[2], c, c, dtype), "to_out": _dense_init(ks[3], c, c, dtype),
    }


def _mid_init(key, c, dtype):
    ks = jax.random.split(key, 3)
    return {"resnets_0": _resnet_init(ks[0], c, c, dtype),
            "attentions_0": _attn_init(ks[1], c, dtype),
            "resnets_1": _resnet_init(ks[2], c, c, dtype)}


def init(key, cfg: VAEConfig, dtype=jnp.float32):
    ch = cfg.block_out_channels
    keys = iter(jax.random.split(key, 64))
    enc = {"conv_in": _conv_init(next(keys), 3, 3, cfg.in_channels, ch[0], dtype)}
    cin = ch[0]
    for i, cout in enumerate(ch):
        blk = {}
        for j in range(cfg.layers_per_block):
            blk[f"resnets_{j}"] = _resnet_init(next(keys), cin if j == 0 else cout, cout, dtype)
        if i < len(ch) - 1:
            blk["downsample"] = _conv_init(next(keys), 3, 3, cout, cout, dtype)
        enc[f"down_{i}"] = blk
        cin = cout
    enc["mid"] = _mid_init(next(keys), ch[-1], dtype)
    enc["norm_out"] = _gn_init(ch[-1], dtype)
    enc["conv_out"] = _conv_init(next(keys), 3, 3, ch[-1], 2 * cfg.latent_channels, dtype)

    dec = {"conv_in": _conv_init(next(keys), 3, 3, cfg.latent_channels, ch[-1], dtype)}
    dec["mid"] = _mid_init(next(keys), ch[-1], dtype)
    rev = list(reversed(ch))
    cin = ch[-1]
    for i, cout in enumerate(rev):
        blk = {}
        for j in range(cfg.layers_per_block + 1):
            blk[f"resnets_{j}"] = _resnet_init(next(keys), cin if j == 0 else cout, cout, dtype)
        if i < len(rev) - 1:
            blk["upsample"] = _conv_init(next(keys), 3, 3, cout, cout, dtype)
        dec[f"up_{i}"] = blk
        cin = cout
    dec["norm_out"] = _gn_init(ch[0], dtype)
    dec["conv_out"] = _conv_init(next(keys), 3, 3, ch[0], cfg.out_channels, dtype)
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# apply

def encode_moments(params, cfg: VAEConfig, images: jax.Array) -> jax.Array:
    """images [B, H, W, 3] in [-1, 1] → moments [B, H/8, W/8, 2*latent_ch]."""
    g = cfg.norm_num_groups
    enc = params["encoder"]
    x = _conv(enc["conv_in"], images)
    for i in range(len(cfg.block_out_channels)):
        blk = enc[f"down_{i}"]
        for j in range(cfg.layers_per_block):
            x = _resnet(blk[f"resnets_{j}"], x, g)
        if "downsample" in blk:
            # diffusers pads (0,1,0,1) then strides 2 with VALID
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = jax.lax.conv_general_dilated(
                x, blk["downsample"]["kernel"].astype(x.dtype), (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + blk["downsample"]["bias"].astype(x.dtype)
    x = _mid_block(enc["mid"], x, g)
    x = jax.nn.silu(_group_norm(enc["norm_out"], x, g))
    return _conv(enc["conv_out"], x)


def encode(params, cfg: VAEConfig, images: jax.Array) -> jax.Array:
    """Deterministic latents: mode of the diagonal Gaussian, shift/scale
    normalized (reference encode_vae_image, flux_kontext_trainer.py:885-889)."""
    moments = encode_moments(params, cfg, images)
    mean = moments[..., : cfg.latent_channels]
    return (mean - cfg.shift_factor) * cfg.scaling_factor


def decode(params, cfg: VAEConfig, latents: jax.Array) -> jax.Array:
    """Normalized latents [B, h, w, C] → images [B, H, W, 3] in [-1, 1]."""
    g = cfg.norm_num_groups
    z = latents / cfg.scaling_factor + cfg.shift_factor
    dec = params["decoder"]
    x = _conv(dec["conv_in"], z)
    x = _mid_block(dec["mid"], x, g)
    for i in range(len(cfg.block_out_channels)):
        blk = dec[f"up_{i}"]
        for j in range(cfg.layers_per_block + 1):
            x = _resnet(blk[f"resnets_{j}"], x, g)
        if "upsample" in blk:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
            x = _conv(blk["upsample"], x)
    x = jax.nn.silu(_group_norm(dec["norm_out"], x, g))
    return _conv(dec["conv_out"], x)


# jitted entry points (config is static; one compile per (config, shape))
import functools as _functools

encode_jit = _functools.partial(jax.jit, static_argnums=(1,))(encode)
decode_jit = _functools.partial(jax.jit, static_argnums=(1,))(decode)
