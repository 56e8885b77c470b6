"""Multi-axis rotary position embeddings for MMDiT models.

One unified implementation serves all model families:
  * FLUX 3-axis (set, h, w) ids → cos/sin (reference
    models/transformer_flux.py:526-553, FluxPosEmbed)
  * Qwen-Image 3-axis complex RoPE with scale_rope centering (reference
    models/transformer_qwenimage.py:159-254, QwenEmbedRope) — the complex
    multiply is algebraically identical to the real interleaved rotation, so
    we compute everything in the cos/sin form (TPU has no complex MXU path)
  * FLUX.2-Klein 4-axis (t, h, w, l) ids (reference flux2_klein_trainer.py:194-211)
  * DreamOmni2 cumulative offsets are plain coordinate arithmetic on the ids
    (reference models/pipeline_dreamomni2.py:676-711)

Convention (matches diffusers get_1d_rotary_pos_embed with
repeat_interleave_real=True): for an axis of dim d, frequencies
f_j = pos / theta^(2j/d), j < d/2, and cos/sin are each frequency repeated
twice → per-token vectors of length sum(axes_dim) == head_dim.  Rotation acts
on adjacent pairs: (x0, x1) → (x0·c − x1·s, x1·c + x0·s).

Frequencies are computed in float64 on host-traced constants where possible
(diffusers uses float64 for CUDA; parity matters for golden tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rope_from_coords(coords: jax.Array, axes_dim: tuple[int, ...],
                     theta: float = 10000.0, layout: str = "half"
                     ) -> tuple[jax.Array, jax.Array]:
    """coords [..., n_axes] (float or int, may be negative) → (cos, sin) each
    [..., sum(axes_dim)] in float32.

    layout="half" (default, TPU-native): rotation pairs are (j, j+D/2) —
    aligned half-slices the VPU handles at full bandwidth.  Model q/k
    projection weights are PERMUTED to this layout at port time
    (`interleaved_to_half_perm`); attention outputs are invariant.
    layout="interleaved": the torch/diffusers adjacent-pair convention
    ([c0,c0,c1,c1,…]) — lane-strided on TPU (≈11% of a DiT forward); kept for
    parity tests.
    """
    cos_parts, sin_parts = [], []
    for i, d in enumerate(axes_dim):
        pos = coords[..., i].astype(jnp.float32)
        inv = (1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64) / d))).astype(np.float32)
        freqs = pos[..., None] * inv  # [..., d/2]
        cos = jnp.cos(freqs)
        sin = jnp.sin(freqs)
        if layout == "interleaved":
            cos = jnp.repeat(cos, 2, axis=-1)
            sin = jnp.repeat(sin, 2, axis=-1)
        cos_parts.append(cos)
        sin_parts.append(sin)
    cos = jnp.concatenate(cos_parts, axis=-1)
    sin = jnp.concatenate(sin_parts, axis=-1)
    if layout == "half":
        cos = jnp.concatenate([cos, cos], axis=-1)
        sin = jnp.concatenate([sin, sin], axis=-1)
    return cos, sin


def interleaved_to_half_perm(d: int) -> np.ndarray:
    """Channel permutation taking torch interleaved-pair rope layout to the
    rotate-half layout: even indices first, then odd. ours[j] = torch[perm[j]]."""
    return np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])


def half_to_interleaved_perm(d: int) -> np.ndarray:
    return np.argsort(interleaved_to_half_perm(d))


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               layout: str = "half") -> jax.Array:
    """x [..., S, D] rotated by (cos, sin) [S, D] or [..., S, D] (broadcast)."""
    if layout == "half":
        h = x.shape[-1] // 2
        rot = jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)
    else:
        x2 = x.reshape(x.shape[:-1] + (-1, 2))
        rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    return (x.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# FLUX id construction (host-side/numpy: shapes are static per bucket)

def flux_image_ids(height: int, width: int, set_id: int = 0,
                   h_offset: int = 0, w_offset: int = 0) -> np.ndarray:
    """[(h*w), 3] ids (set, row, col) for one packed-latent image plane.

    set_id>0 marks control images (reference flux_kontext_trainer.py:400,419);
    h/w offsets implement DreamOmni2's cumulative multi-image layout.
    """
    ids = np.zeros((height, width, 3), dtype=np.float32)
    ids[..., 0] = set_id
    ids[..., 1] = np.arange(height)[:, None] + h_offset
    ids[..., 2] = np.arange(width)[None, :] + w_offset
    return ids.reshape(height * width, 3)


def flux_text_ids(seq_len: int) -> np.ndarray:
    return np.zeros((seq_len, 3), dtype=np.float32)


def dreamomni2_control_ids(shapes: list[tuple[int, int]]) -> np.ndarray:
    """Cumulative-offset ids for N reference images: image i gets set_id=i+1
    and accumulated h/w offsets so images never overlap in RoPE space
    (reference pipeline_dreamomni2.py:676-711)."""
    out, h_off, w_off = [], 0, 0
    for i, (h, w) in enumerate(shapes):
        out.append(flux_image_ids(h, w, set_id=i + 1, h_offset=h_off, w_offset=w_off))
        h_off += h
        w_off += w
    return np.concatenate(out, axis=0)


# ---------------------------------------------------------------------------
# Qwen-Image id construction

def qwen_video_coords(frame: int, height: int, width: int, idx: int = 0,
                      scale_rope: bool = True) -> np.ndarray:
    """[(f*h*w), 3] integer coords for one (frame,H,W) plane.

    scale_rope centers the h/w coordinates around zero:
    h coord ∈ [-(h - h//2), h//2)  (reference transformer_qwenimage.py:237-254).
    frame coord = idx (image index in the conditioning sequence).
    """
    f = np.full((frame, height, width), idx, dtype=np.float32)
    if scale_rope:
        hs = np.arange(-(height - height // 2), height // 2, dtype=np.float32)
        ws = np.arange(-(width - width // 2), width // 2, dtype=np.float32)
    else:
        hs = np.arange(height, dtype=np.float32)
        ws = np.arange(width, dtype=np.float32)
    h = np.broadcast_to(hs[None, :, None], (frame, height, width))
    w = np.broadcast_to(ws[None, None, :], (frame, height, width))
    return np.stack([f, h, w], axis=-1).reshape(-1, 3)


def qwen_rope(video_fhw: list[tuple[int, int, int]], txt_seq_len: int,
              axes_dim=(16, 56, 56), theta: float = 10000.0,
              scale_rope: bool = True):
    """(vid_cos, vid_sin, txt_cos, txt_sin) for the joint Qwen stream.

    Text tokens sit past the max video index on all three axes
    (reference transformer_qwenimage.py:226-235).
    """
    coords = [qwen_video_coords(f, h, w, idx=i, scale_rope=scale_rope)
              for i, (f, h, w) in enumerate(video_fhw)]
    vid = np.concatenate(coords, axis=0)
    if scale_rope:
        max_vid = max(max(h // 2, w // 2) for _, h, w in video_fhw)
    else:
        max_vid = max(max(h, w) for _, h, w in video_fhw)
    txt = np.arange(max_vid, max_vid + txt_seq_len, dtype=np.float32)[:, None]
    txt = np.repeat(txt, 3, axis=1)
    vid_cos, vid_sin = rope_from_coords(jnp.asarray(vid), axes_dim, theta)
    txt_cos, txt_sin = rope_from_coords(jnp.asarray(txt), axes_dim, theta)
    return vid_cos, vid_sin, txt_cos, txt_sin
