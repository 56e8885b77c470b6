"""First-party torch oracle for the Wan-family causal 3D VAE.

The reference consumes diffusers' ``AutoencoderKLQwenImage`` as an installed
dependency (reference src/qflux/models/load_model.py:4-14) — nothing is
vendored, and diffusers is absent from this environment, so no captured
golden can come from the upstream class itself.  This module re-implements
the published Wan 2.1 VAE architecture (arXiv:2503.20314; the architecture
diffusers' class reproduces) independently in torch, with the HONEST video
semantics the JAX port specializes away:

- real causal 3D convolutions on [B, C, T, H, W] (kt-1 zeros padded at the
  FRONT of time, full kt-tap contraction) — the JAX port
  (qflux_tpu/models/qwen/vae.py) convolves only the last time tap and claims
  that is exact at T=1; this oracle tests that claim rather than assuming it;
- channel-RMS norm (L2 over channels × sqrt(C) × gamma);
- ResBlock norm→silu→conv ×2 with 1×1×1 shortcut on channel change;
- single-head spatial attention in the mid block, per frame;
- Resample: ZeroPad2d((0,1,0,1)) + stride-2 Conv2d down; nearest ×2 +
  Conv2d up — per frame.

It consumes the JAX param pytree directly (numpy leaves), so both
implementations run the SAME weights and any disagreement is a semantics
bug, not a porting artifact.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _w3(p):
    """[kt, kh, kw, cin, cout] → torch conv3d [cout, cin, kt, kh, kw]."""
    # np.array (copy): jax buffers are non-writable, torch warns on them
    return torch.from_numpy(np.array(p["kernel"])).permute(4, 3, 0, 1, 2).contiguous()


def _w2(p):
    """[kh, kw, cin, cout] → torch conv2d [cout, cin, kh, kw]."""
    k = np.array(p["kernel"])
    if k.ndim == 5:  # 3D-shaped resample weights: current-frame tap
        k = k[-1]
    return torch.from_numpy(k).permute(3, 2, 0, 1).contiguous()


def _b(p):
    return torch.from_numpy(np.array(p["bias"]))


def causal_conv3d(p, x, stride=1, spatial_pad=1):
    """x [B, C, T, H, W]; causal in time: kt-1 zeros at the front."""
    w = _w3(p)
    kt = w.shape[2]
    x = F.pad(x, (spatial_pad, spatial_pad, spatial_pad, spatial_pad, kt - 1, 0))
    return F.conv3d(x, w, _b(p), stride=(1, stride, stride))


def rms_norm_ch(p, x, eps=1e-12):
    """L2-normalize over channels (dim=1) × sqrt(C) × gamma."""
    x32 = x.double()
    norm = torch.sqrt((x32 * x32).sum(dim=1, keepdim=True) + eps)
    c = x.shape[1]
    gamma = torch.from_numpy(np.array(p["gamma"])).double()
    return (x32 / norm * (c ** 0.5) * gamma.view(1, c, 1, 1, 1)).to(x.dtype)


def resblock(p, x):
    h = causal_conv3d(p["conv1"], F.silu(rms_norm_ch(p["norm1"], x)))
    h = causal_conv3d(p["conv2"], F.silu(rms_norm_ch(p["norm2"], h)))
    if "conv_shortcut" in p:
        x = causal_conv3d(p["conv_shortcut"], x, spatial_pad=0)
    return x + h


def attn_block(p, x):
    """Single-head spatial attention, independently per frame."""
    b, c, t, h, w = x.shape
    y = rms_norm_ch(p["norm"], x)
    # [B, C, T, H, W] → [B·T, H·W, C]
    y = y.permute(0, 2, 3, 4, 1).reshape(b * t, h * w, c)
    wk = torch.from_numpy(np.array(p["to_qkv"]["kernel"]))
    qkv = y @ wk + torch.from_numpy(np.array(p["to_qkv"]["bias"]))
    q, k, v = qkv.chunk(3, dim=-1)
    o = F.scaled_dot_product_attention(q.unsqueeze(1), k.unsqueeze(1),
                                       v.unsqueeze(1)).squeeze(1)
    o = o @ torch.from_numpy(np.array(p["proj"]["kernel"])) + torch.from_numpy(
        np.array(p["proj"]["bias"]))
    o = o.reshape(b, t, h, w, c).permute(0, 4, 1, 2, 3)
    return x + o


def downsample(p, x):
    """ZeroPad2d((0,1,0,1)) + stride-2 Conv2d, per frame (downsample2d)."""
    b, c, t, h, w = x.shape
    y = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    y = F.pad(y, (0, 1, 0, 1))
    y = F.conv2d(y, _w2(p), _b(p), stride=2)
    c2, h2, w2 = y.shape[1:]
    return y.reshape(b, t, c2, h2, w2).permute(0, 2, 1, 3, 4)


def upsample(p, x):
    b, c, t, h, w = x.shape
    y = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    y = F.interpolate(y, scale_factor=2.0, mode="nearest")
    y = F.conv2d(y, _w2(p), _b(p), padding=1)
    c2, h2, w2 = y.shape[1:]
    return y.reshape(b, t, c2, h2, w2).permute(0, 2, 1, 3, 4)


def _mid(p, x):
    x = resblock(p["res_0"], x)
    x = attn_block(p["attn"], x)
    return resblock(p["res_1"], x)


def encode_moments(params, cfg, video):
    """video [B, C, T, H, W] ∈ [-1, 1] → moments [B, 2·z, T, H/8, W/8]."""
    enc = params["encoder"]
    x = causal_conv3d(enc["conv_in"], video)
    for i in range(len(cfg.dim_mult)):
        blk = enc[f"down_{i}"]
        for j in range(cfg.num_res_blocks):
            x = resblock(blk[f"res_{j}"], x)
        if "down" in blk:
            x = downsample(blk["down"], x)
    x = _mid(enc["mid"], x)
    x = F.silu(rms_norm_ch(enc["norm_out"], x))
    return causal_conv3d(enc["conv_out"], x)


def decode(params, cfg, z):
    """z UNNORMALIZED latents [B, z, T, H/8, W/8] → video [B, 3, T, H, W]."""
    dec = params["decoder"]
    x = causal_conv3d(dec["conv_in"], z)
    x = _mid(dec["mid"], x)
    for i in range(len(cfg.dim_mult)):
        blk = dec[f"up_{i}"]
        for j in range(cfg.num_res_blocks + 1):
            x = resblock(blk[f"res_{j}"], x)
        if "up" in blk:
            x = upsample(blk["up"], x)
    x = F.silu(rms_norm_ch(dec["norm_out"], x))
    return causal_conv3d(dec["conv_out"], x)
