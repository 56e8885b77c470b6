"""AutoencoderKLQwenImage — Wan-family causal 3D-conv VAE, functional NHWC.

The reference loads diffusers' AutoencoderKLQwenImage (reference
models/load_model.py:9-21) and encodes images as single-frame videos
[B, C, 1, H, W] with per-channel latents mean/std normalization (reference
qwen_image_edit_trainer.py:863-889).

Architecture (Wan 2.1 VAE family): base_dim 96, dim_mult (1,2,4,4),
2 res blocks per stage, channel-RMS norms, single-head spatial attention in
the mid block, causal 3D convs (time padded at the front only).  For the
image-editing workload T == 1 everywhere, so causal time padding pads zeros
and temporal strides are identity — the implementation below specializes to
T=1 (a single 2D slice per conv) while keeping the 3D-aware parameter shapes
[kt, kh, kw, cin, cout] so ported checkpoints load unchanged.

Latents: z_dim 16; normalize z' = (z - mean) / std with the per-channel
tables from the released config.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# per-channel latent statistics from the released Qwen-Image VAE config
# (Wan 2.1 family; reference qwen_image_edit_trainer.py:863-889 uses
# vae.config.latents_mean / latents_std)
LATENTS_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
)
LATENTS_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
)


@dataclasses.dataclass(frozen=True)
class QwenVAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    latents_mean: tuple[float, ...] = LATENTS_MEAN
    latents_std: tuple[float, ...] = LATENTS_STD

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)

    @classmethod
    def tiny(cls) -> "QwenVAEConfig":
        return cls(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                   latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4)


# ---------------------------------------------------------------------------
# primitives (T=1: causal 3D convs act on the single frame; the time taps that
# would read previous frames see zero padding and their kernel slices simply
# contribute nothing at inference parity with T=1 videos)

def _conv3d_t1(p, x, stride=1, spatial_pad=1):
    """x [B, H, W, C]; kernel [kt, kh, kw, cin, cout] — only the LAST time tap
    (the current frame; causal front padding zeroes the others) convolves."""
    k = p["kernel"][-1]  # [kh, kw, cin, cout]
    out = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride),
        [(spatial_pad, spatial_pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"].astype(x.dtype)


def _rms_norm_ch(p, x, eps=1e-12):
    """Wan RMS_norm: L2-normalize over channels × sqrt(C) × gamma."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) + eps)
    c = x.shape[-1]
    return (x32 / norm * (c ** 0.5) * p["gamma"].astype(jnp.float32)).astype(x.dtype)


def _resblock(p, x):
    h = _conv3d_t1(p["conv1"], jax.nn.silu(_rms_norm_ch(p["norm1"], x)))
    h = _conv3d_t1(p["conv2"], jax.nn.silu(_rms_norm_ch(p["norm2"], h)))
    if "conv_shortcut" in p:
        x = _conv3d_t1(p["conv_shortcut"], x, spatial_pad=0)
    return x + h


def _attn_block(p, x):
    from qflux_tpu.models.flux.vae import ATTN_CHUNK, _sdpa

    b, h, w, c = x.shape
    s = h * w
    y = _rms_norm_ch(p["norm"], x).reshape(b, s, c)
    qkv = y @ p["to_qkv"]["kernel"].astype(y.dtype) + p["to_qkv"]["bias"].astype(y.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if s > ATTN_CHUNK:
        # query-chunked — the full [S, S] f32 score matrix OOMs on large
        # grids (see flux/vae._attn_block)
        cq = ATTN_CHUNK
        while s % cq:
            cq //= 2
        qc = q.reshape(b, s // cq, cq, c).transpose(1, 0, 2, 3)
        o = jax.lax.map(lambda qi: _sdpa(qi, k, v, c), qc)
        o = o.transpose(1, 0, 2, 3).reshape(b, s, c)
    else:
        o = _sdpa(q, k, v, c)
    o = o @ p["proj"]["kernel"].astype(o.dtype) + p["proj"]["bias"].astype(o.dtype)
    return x + o.reshape(b, h, w, c)


def _downsample(p, x):
    """ZeroPad (0,1,0,1) + stride-2 conv (Wan Resample downsample2d)."""
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    k = p["kernel"][-1] if p["kernel"].ndim == 5 else p["kernel"]
    out = jax.lax.conv_general_dilated(
        xp, k.astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"].astype(x.dtype)


def _upsample(p, x):
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
    k = p["kernel"][-1] if p["kernel"].ndim == 5 else p["kernel"]
    out = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"].astype(x.dtype)


# ---------------------------------------------------------------------------
# init

def _c3(key, kt, kh, kw, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    fan = kt * kh * kw * cin
    bound = (1.0 / fan) ** 0.5
    return {"kernel": jax.random.uniform(k1, (kt, kh, kw, cin, cout), dtype, -bound, bound),
            "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound)}


def _c2(key, kh, kw, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    fan = kh * kw * cin
    bound = (1.0 / fan) ** 0.5
    return {"kernel": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound),
            "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound)}


def _rms(c, dtype):
    return {"gamma": jnp.ones((c,), dtype)}


def _res_init(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {"norm1": _rms(cin, dtype), "conv1": _c3(ks[0], 3, 3, 3, cin, cout, dtype),
         "norm2": _rms(cout, dtype), "conv2": _c3(ks[1], 3, 3, 3, cout, cout, dtype)}
    if cin != cout:
        p["conv_shortcut"] = _c3(ks[2], 1, 1, 1, cin, cout, dtype)
    return p


def _lin(key, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    bound = (1.0 / cin) ** 0.5
    return {"kernel": jax.random.uniform(k1, (cin, cout), dtype, -bound, bound),
            "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound)}


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 2)
    return {"norm": _rms(c, dtype), "to_qkv": _lin(ks[0], c, 3 * c, dtype),
            "proj": _lin(ks[1], c, c, dtype)}


def _mid_init(key, c, dtype):
    ks = jax.random.split(key, 3)
    return {"res_0": _res_init(ks[0], c, c, dtype), "attn": _attn_init(ks[1], c, dtype),
            "res_1": _res_init(ks[2], c, c, dtype)}


def init(key, cfg: QwenVAEConfig, dtype=jnp.float32):
    dims = [cfg.base_dim * m for m in cfg.dim_mult]
    keys = iter(jax.random.split(key, 128))
    enc = {"conv_in": _c3(next(keys), 3, 3, 3, 3, dims[0], dtype)}
    cin = dims[0]
    for i, cout in enumerate(dims):
        blk = {}
        for j in range(cfg.num_res_blocks):
            blk[f"res_{j}"] = _res_init(next(keys), cin if j == 0 else cout, cout, dtype)
        if i < len(dims) - 1:
            blk["down"] = _c2(next(keys), 3, 3, cout, cout, dtype)
        enc[f"down_{i}"] = blk
        cin = cout
    enc["mid"] = _mid_init(next(keys), dims[-1], dtype)
    enc["norm_out"] = _rms(dims[-1], dtype)
    enc["conv_out"] = _c3(next(keys), 3, 3, 3, dims[-1], 2 * cfg.z_dim, dtype)

    rev = list(reversed(dims))
    dec = {"conv_in": _c3(next(keys), 3, 3, 3, cfg.z_dim, rev[0], dtype),
           "mid": _mid_init(next(keys), rev[0], dtype)}
    cin = rev[0]
    for i, cout in enumerate(rev):
        blk = {}
        for j in range(cfg.num_res_blocks + 1):
            blk[f"res_{j}"] = _res_init(next(keys), cin if j == 0 else cout, cout, dtype)
        if i < len(rev) - 1:
            blk["up"] = _c2(next(keys), 3, 3, cout, rev[i + 1], dtype)
            cin = rev[i + 1]
        else:
            cin = cout
        dec[f"up_{i}"] = blk
    dec["norm_out"] = _rms(rev[-1], dtype)
    dec["conv_out"] = _c3(next(keys), 3, 3, 3, rev[-1], 3, dtype)
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# apply

def _mid(p, x):
    x = _resblock(p["res_0"], x)
    x = _attn_block(p["attn"], x)
    return _resblock(p["res_1"], x)


def encode_moments(params, cfg: QwenVAEConfig, images: jax.Array) -> jax.Array:
    enc = params["encoder"]
    x = _conv3d_t1(enc["conv_in"], images)
    for i in range(len(cfg.dim_mult)):
        blk = enc[f"down_{i}"]
        for j in range(cfg.num_res_blocks):
            x = _resblock(blk[f"res_{j}"], x)
        if "down" in blk:
            x = _downsample(blk["down"], x)
    x = _mid(enc["mid"], x)
    x = jax.nn.silu(_rms_norm_ch(enc["norm_out"], x))
    x = _conv3d_t1(enc["conv_out"], x)
    if "quant_conv" in enc:  # ported checkpoints carry the WanVAE 1×1 conv
        q = enc["quant_conv"]
        x = x @ q["kernel"].astype(x.dtype) + q["bias"].astype(x.dtype)
    return x


def encode(params, cfg: QwenVAEConfig, images: jax.Array) -> jax.Array:
    """images [B, H, W, 3] ∈ [-1, 1] → normalized latents [B, H/8, W/8, z].

    Deterministic (mode of the diagonal Gaussian) + per-channel mean/std
    normalization (reference qwen_image_edit_trainer.py:863-889)."""
    moments = encode_moments(params, cfg, images)
    mean = moments[..., : cfg.z_dim]
    mu = jnp.asarray(cfg.latents_mean, mean.dtype)
    std = jnp.asarray(cfg.latents_std, mean.dtype)
    return (mean - mu) / std


def decode(params, cfg: QwenVAEConfig, latents: jax.Array) -> jax.Array:
    z = latents * jnp.asarray(cfg.latents_std, latents.dtype) + jnp.asarray(
        cfg.latents_mean, latents.dtype)
    dec = params["decoder"]
    if "post_quant_conv" in dec:
        q = dec["post_quant_conv"]
        z = z @ q["kernel"].astype(z.dtype) + q["bias"].astype(z.dtype)
    x = _conv3d_t1(dec["conv_in"], z)
    x = _mid(dec["mid"], x)
    for i in range(len(cfg.dim_mult)):
        blk = dec[f"up_{i}"]
        for j in range(cfg.num_res_blocks + 1):
            x = _resblock(blk[f"res_{j}"], x)
        if "up" in blk:
            x = _upsample(blk["up"], x)
    x = jax.nn.silu(_rms_norm_ch(dec["norm_out"], x))
    return _conv3d_t1(dec["conv_out"], x)


# jitted entry points (config is static; one compile per (config, shape))
import functools as _functools

encode_jit = _functools.partial(jax.jit, static_argnums=(1,))(encode)
decode_jit = _functools.partial(jax.jit, static_argnums=(1,))(decode)
