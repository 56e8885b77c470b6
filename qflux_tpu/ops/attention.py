"""Joint text-image attention: XLA reference impl + Pallas flash dispatch.

The MMDiT joint attention concatenates [txt, img] into one bidirectional
sequence (reference models/transformer_qwenimage.py:257-354 and
transformer_flux.py's FluxAttnProcessor, both backed by CUDA SDPA/flash-attn).
Here:

  * `sdpa_reference` — pure-XLA softmax attention, used on CPU (tests) and as
    the numerical oracle for the kernel;
  * `flash_attention` (ops/flash_attention.py) — Pallas TPU kernel with online
    softmax + segment-id masking (covers multi-res padding, which the
    reference encodes as a [B,1,S,S] additive mask);
  * `dot_product_attention` — dispatcher: Pallas on TPU, XLA elsewhere.

Segment-id convention: seg==0 ⇒ padding token; tokens attend iff their
segment ids are equal and nonzero.  A fully-packed batch uses all-ones.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def segment_mask(q_seg: jax.Array, kv_seg: jax.Array) -> jax.Array:
    """[B, Sq], [B, Sk] → bool [B, 1, Sq, Sk]; True = may attend."""
    m = (q_seg[:, :, None] == kv_seg[:, None, :]) & (q_seg[:, :, None] != 0)
    return m[:, None, :, :]


def sdpa_reference(q, k, v, segment_ids=None, kv_segment_ids=None, scale=None):
    """q,k,v: [B, S, H, D] → [B, S, H, D]. float32 softmax."""
    *_, d = q.shape
    scale = scale if scale is not None else 1.0 / (d ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    mask = None
    if segment_ids is not None:
        kv_segment_ids = kv_segment_ids if kv_segment_ids is not None else segment_ids
        mask = segment_mask(segment_ids, kv_segment_ids)
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if mask is not None:
        # a fully-masked row softmaxes to uniform (all logits == NEG_INF);
        # zero it so padded rows output 0 — matching the flash kernel, and
        # keeping padded-row cotangents out of dk/dv
        probs = jnp.where(mask, probs, 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _planning_stub(q, k, v, segment_ids):
    """Memory-planning stand-in for the Pallas flash kernel (NOT numerically
    attention): O(S) working set and the kernel's saved-residual profile —
    q/k/v live for backward, an [B,S,H,D] output tagged `flash_out` — so AOT
    memory analysis (parallel/planner.py) sees flash-kernel memory instead
    of XLA attention's [B,H,S,S] logits (which the real TPU path never
    materializes)."""
    from jax.ad_checkpoint import checkpoint_name

    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bqhd,bqhd->bqh", q, k,
                   preferred_element_type=jnp.float32) * scale
    if segment_ids is not None:
        s = jnp.where((segment_ids != 0)[:, :, None], s, 0.0)
    out = v * jax.nn.sigmoid(s)[..., None].astype(v.dtype)
    lse = checkpoint_name(s, "flash_lse")
    out = out + 0.0 * lse[..., None].astype(out.dtype)  # keep lse saved
    return checkpoint_name(out, "flash_out")


@functools.partial(jax.jit, static_argnames=("impl",))
def _dispatch(q, k, v, segment_ids, impl):
    if impl == "pallas":
        from qflux_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, segment_ids=segment_ids)
    if impl == "stub":
        return _planning_stub(q, k, v, segment_ids)
    return sdpa_reference(q, k, v, segment_ids=segment_ids)


def qk_norm_rope_attention(q_raw, k_raw, v, q_scale2, k_scale2, cos, sin,
                           st: int, segment_ids=None, impl: str = "auto"):
    """qk-RMSNorm + rotate-half RoPE + joint attention over RAW projections.

    On TPU (impl auto/pallas/int8) with a single-K-block shape this fuses
    the norm and rope into the flash kernels (ops/flash_nr.py — kills the
    [B,S,H,D] roped-q/k materializations and their backward chains);
    everywhere else it applies the identical XLA composition and routes
    through `dot_product_attention` (so ring/sp and the planning stub keep
    working).  q_scale2/k_scale2: [2, D] — row 0 norms positions < st (txt
    stream), row 1 the rest; pass the same row twice for single-stream.

    impl="int8" additionally runs the score GEMM int8 on the MXU
    (quantized-base numerics class — config `model.quantize.attention`);
    it degrades to the bf16 fused/XLA path wherever int8 doesn't apply.
    """
    from qflux_tpu.ops import flash_nr
    from qflux_tpu.parallel.mesh import active_mesh

    b, sq, h_, d = q_raw.shape
    s_int8 = impl == "int8"
    mesh = active_mesh()
    ring = (impl == "ring"
            or (impl in ("auto", "int8") and mesh is not None
                and mesh.shape.get("sp", 1) > 1))
    if (impl in ("auto", "pallas", "int8") and not ring
            and jax.default_backend() == "tpu"
            and flash_nr.supports(sq, k_raw.shape[1], d, s_int8)):
        return flash_nr.flash_attention_nr(
            q_raw, k_raw, v, q_scale2, k_scale2, cos, sin, st,
            segment_ids=segment_ids, s_int8=s_int8)
    qn = flash_nr.apply_qk_norm_rope(q_raw, q_scale2, cos, sin, st)
    kn = flash_nr.apply_qk_norm_rope(k_raw, k_scale2, cos, sin, st)
    return dot_product_attention(qn, kn, v, segment_ids=segment_ids,
                                 impl="auto" if s_int8 else impl)


def dot_product_attention(q, k, v, segment_ids=None, impl: str = "auto"):
    """q,k,v: [B, S, H, D]; segment_ids: optional [B, S] int32.

    impl="ring" (or "auto" with an active mesh whose sp axis > 1) runs
    sequence-parallel ring attention (ops/ring_attention.py) under shard_map
    with the joint sequence split over the "sp" mesh axis."""
    from qflux_tpu.parallel.mesh import active_mesh

    if impl == "auto":
        mesh = active_mesh()
        if mesh is not None and mesh.shape.get("sp", 1) > 1:
            impl = "ring"
        else:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "ring":
        from qflux_tpu.ops.ring_attention import ring_attention_sharded

        mesh = active_mesh()
        if mesh is None or mesh.shape.get("sp", 1) <= 1:
            raise ValueError("impl='ring' needs an active mesh with sp > 1 "
                             "(build_mesh(MeshConfig(sp=...)) first)")
        return ring_attention_sharded(q, k, v, mesh, "sp",
                                      segment_ids=segment_ids)
    return _dispatch(q, k, v, segment_ids, impl)
