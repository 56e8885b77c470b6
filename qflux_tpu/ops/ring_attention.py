"""Ring attention: sequence-parallel exact attention over a mesh axis.

A NEW capability relative to the reference, which has no sequence/context
parallelism (SURVEY.md §2.8: "TPU build should add sequence-parallel …
for ≥4k-token joint sequences").  At 1024² multi-control the joint [txt, img]
sequence passes 16k tokens; attention memory/compute then dominates a single
chip — ring attention shards the SEQUENCE over an axis and rotates K/V chunks
around the ring with `ppermute`, merging partial softmax results online
(blockwise attention: each hop is numerically the flash-attention update).

Memory: the custom VJP stores only (q, k, v, seg, out, lse) per shard —
O(S_local) — and recomputes each hop's probability block in backward, exactly
like the Pallas flash kernel (ops/flash_attention.py).  Backward rotates
(k, v, dk, dv) around the ring: after n hops every dk/dv block is back at its
home shard with all q-blocks' contributions accumulated.

Usage (inside shard_map over a mesh with a sequence axis, e.g. "sp"):

    out = ring_attention(q, k, v, axis_name="sp", segment_ids=seg)

q, k, v: [B, S_local, H, D] (the global sequence split over the axis);
segment_ids: [B, S_local] (0 = padding), rotated with K/V.
Communication rides the ICI ring; compute of hop i overlaps XLA-scheduled
collective-permute of hop i+1.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _use_kernel() -> bool:
    # the Pallas hop path needs real Mosaic lowering; the einsum path serves
    # CPU tests (interpret-mode kernels inside a ppermute scan are very slow)
    return jax.default_backend() == "tpu"


def _hop_scores(q, k_cur, q_seg, kv_seg, scale):
    """[B,S,H,D]×[B,K,H,D] → masked logits [B,H,Q,K] (f32)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k_cur,
                   preferred_element_type=jnp.float32) * scale
    if q_seg is not None:
        ok = (q_seg[:, :, None] == kv_seg[:, None, :]) & (q_seg[:, :, None] != 0)
        s = jnp.where(ok[:, None], s, NEG_INF)
    return s


def _hop_flash_fwd(q, k_cur, v_cur, q_seg, kv_seg, scale):
    """One hop through the Pallas flash kernel: O(block_q · S_hop) memory
    instead of the einsum path's [B,H,Q,K] logits. Returns (out [B,S,H,D]
    f32, lse [B,H,S] f32), normalized within the hop (merged across hops by
    log-sum-exp in the caller)."""
    from qflux_tpu.ops.flash_attention import flash_fwd_with_lse

    out, lse = flash_fwd_with_lse(q, k_cur, v_cur, q_seg, kv_seg, scale)
    return out.astype(jnp.float32), lse


def _ring_fwd(q, k, v, q_seg, axis_name, scale):
    """Online-softmax over ring hops; returns (out [B,S,H,D], lse [B,H,S])."""
    b, s_loc, h, d = q.shape
    n = jax.lax.psum(1, axis_name)

    if _use_kernel():
        # merge per-hop flash results by log-sum-exp: out/lse carry only —
        # no [B,H,Q,K] block ever materializes
        lse0 = jnp.full((b, h, s_loc), NEG_INF, jnp.float32)
        acc0 = jnp.zeros((b, s_loc, h, d), jnp.float32)

        def hop(carry, _):
            lse_acc, acc, k_cur, v_cur, seg_cur = carry
            o_hop, lse_hop = _hop_flash_fwd(q, k_cur, v_cur, q_seg, seg_cur, scale)
            lse_new = jnp.logaddexp(lse_acc, lse_hop)
            w_old = jnp.exp(lse_acc - lse_new).transpose(0, 2, 1)[..., None]
            w_hop = jnp.exp(lse_hop - lse_new).transpose(0, 2, 1)[..., None]
            acc = acc * w_old + o_hop * w_hop
            perm = [(i, (i + 1) % n) for i in range(n)]
            return (lse_new, acc,
                    jax.lax.ppermute(k_cur, axis_name, perm),
                    jax.lax.ppermute(v_cur, axis_name, perm),
                    jax.lax.ppermute(seg_cur, axis_name, perm)), None

        (lse, acc, _, _, _), _ = jax.lax.scan(
            hop, (lse0, acc0, k, v, q_seg), None, length=n)
        return acc.astype(q.dtype), lse

    m0 = jnp.full((b, h, s_loc), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc), jnp.float32)
    acc0 = jnp.zeros((b, h, s_loc, d), jnp.float32)

    def hop(carry, _):
        m, l, acc, k_cur, v_cur, seg_cur = carry
        s = _hop_scores(q, k_cur, q_seg, seg_cur, scale)
        m_new = jnp.maximum(m, s.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        # fully-masked rows have s ≡ m_new ≡ NEG_INF in f32 (the raw score is
        # below the ulp at 1e30), so exp(s - m_new) = 1 — zero them explicitly
        p = jnp.where(s > NEG_INF * 0.5, jnp.exp(s - m_new[..., None]), 0.0)
        l = alpha * l + p.sum(axis=-1)
        pv = jnp.einsum("bhqk,bkhd->bhqd", p.astype(v_cur.dtype), v_cur,
                        preferred_element_type=jnp.float32)
        acc = acc * alpha[..., None] + pv
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        seg_nxt = (jax.lax.ppermute(seg_cur, axis_name, perm)
                   if seg_cur is not None else None)
        return (m_new, l, acc, k_nxt, v_nxt, seg_nxt), None

    (m, l, acc, _, _, _), _ = jax.lax.scan(
        hop, (m0, l0, acc0, k, v, q_seg), None, length=n)
    out = (acc / jnp.maximum(l, 1e-20)[..., None]).transpose(0, 2, 1, 3).astype(q.dtype)
    lse = m + jnp.log(jnp.maximum(l, 1e-20))
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ring(q, k, v, q_seg, axis_name, scale):
    out, _ = _ring_fwd(q, k, v, q_seg, axis_name, scale)
    return out


def _ring_vjp_fwd(q, k, v, q_seg, axis_name, scale):
    out, lse = _ring_fwd(q, k, v, q_seg, axis_name, scale)
    return out, (q, k, v, q_seg, out, lse)


def _hop_flash_bwd(q, k_cur, v_cur, q_seg, seg_cur, out, lse, do, scale):
    """One backward hop through the Pallas dq/dkv kernels; p is recomputed
    against the GLOBAL lse so each hop contributes its exact share."""
    from qflux_tpu.ops.flash_attention import flash_bwd_from_residuals

    return flash_bwd_from_residuals(q, k_cur, v_cur, q_seg, seg_cur, out,
                                    lse, do, scale)


def _ring_vjp_bwd(axis_name, scale, res, do):
    q, k, v, q_seg, out, lse = res
    n = jax.lax.psum(1, axis_name)

    if _use_kernel():
        def hop(carry, _):
            k_cur, v_cur, seg_cur, dk_cur, dv_cur, dq = carry
            dq_h, dk_h, dv_h = _hop_flash_bwd(q, k_cur, v_cur, q_seg, seg_cur,
                                              out, lse, do, scale)
            dq = dq + dq_h.astype(jnp.float32)
            dk_cur = dk_cur + dk_h.astype(jnp.float32)
            dv_cur = dv_cur + dv_h.astype(jnp.float32)
            perm = [(i, (i + 1) % n) for i in range(n)]
            return (jax.lax.ppermute(k_cur, axis_name, perm),
                    jax.lax.ppermute(v_cur, axis_name, perm),
                    jax.lax.ppermute(seg_cur, axis_name, perm),
                    jax.lax.ppermute(dk_cur, axis_name, perm),
                    jax.lax.ppermute(dv_cur, axis_name, perm), dq), None

        (_, _, _, dk, dv, dq), _ = jax.lax.scan(
            hop, (k, v, q_seg, jnp.zeros(k.shape, jnp.float32),
                  jnp.zeros(v.shape, jnp.float32),
                  jnp.zeros(q.shape, jnp.float32)), None, length=n)
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                None)
    # delta_i = Σ_d do·out per q row, [B,H,Q]
    delta = jnp.einsum("bqhd,bqhd->bhq", do.astype(jnp.float32),
                       out.astype(jnp.float32))
    do_t = do.astype(jnp.float32)
    dq0 = jnp.zeros(q.shape[:1] + (q.shape[2], q.shape[1], q.shape[3]),
                    jnp.float32)  # [B,H,Q,D]

    def hop(carry, _):
        k_cur, v_cur, seg_cur, dk_cur, dv_cur, dq = carry
        s = _hop_scores(q, k_cur, q_seg, seg_cur, scale)
        # recompute against the global lse; zero masked entries explicitly —
        # for fully-masked rows s ≡ lse ≡ NEG_INF in f32 gives exp(0) = 1
        p = jnp.where(s > NEG_INF * 0.5, jnp.exp(s - lse[..., None]), 0.0)
        dp = jnp.einsum("bqhd,bkhd->bhqk", do_t, v_cur.astype(jnp.float32))
        ds = p * (dp - delta[..., None]) * scale
        dq = dq + jnp.einsum("bhqk,bkhd->bhqd", ds.astype(k_cur.dtype), k_cur,
                             preferred_element_type=jnp.float32)
        dk_cur = dk_cur + jnp.einsum("bhqk,bqhd->bkhd", ds.astype(q.dtype), q,
                                     preferred_element_type=jnp.float32)
        dv_cur = dv_cur + jnp.einsum("bhqk,bqhd->bkhd", p.astype(do.dtype), do,
                                     preferred_element_type=jnp.float32)
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        dk_nxt = jax.lax.ppermute(dk_cur, axis_name, perm)
        dv_nxt = jax.lax.ppermute(dv_cur, axis_name, perm)
        seg_nxt = (jax.lax.ppermute(seg_cur, axis_name, perm)
                   if seg_cur is not None else None)
        return (k_nxt, v_nxt, seg_nxt, dk_nxt, dv_nxt, dq), None

    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    (k_fin, v_fin, _, dk, dv, dq), _ = jax.lax.scan(
        hop, (k, v, q_seg, dk0, dv0, dq0), None, length=n)
    # after n hops dk/dv have rotated full circle — back at their home shard
    dq = dq.transpose(0, 2, 1, 3).astype(q.dtype)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


_ring.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str,
                   segment_ids: Optional[jax.Array] = None,
                   scale: Optional[float] = None) -> jax.Array:
    """[B, S_local, H, D] → [B, S_local, H, D]; call under shard_map with the
    sequence dim split over `axis_name`. Differentiable with O(S_local)
    backward memory (custom VJP recomputes per hop)."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (d ** 0.5)
    if segment_ids is None:
        segment_ids = jnp.ones(q.shape[:2], jnp.int32)
    return _ring(q, k, v, segment_ids, axis_name, scale)


def ring_attention_sharded(q, k, v, mesh, axis_name: str,
                           segment_ids=None, scale=None,
                           batch_axes: tuple[str, ...] = ("dp", "fsdp")):
    """Convenience wrapper: takes GLOBAL [B, S, H, D] arrays and runs the ring
    under shard_map with S split over `axis_name` (and batch over
    `batch_axes`, so dp/fsdp sharding is preserved inside the ring)."""
    import math

    from jax.sharding import PartitionSpec as P

    baxes = tuple(a for a in batch_axes if mesh.shape.get(a, 1) > 1)
    # keep only a batch sharding the batch actually divides — a batch-1
    # validation/predict call on an fsdp>1 mesh must replicate, not crash
    while baxes and q.shape[0] % math.prod(mesh.shape[a] for a in baxes):
        baxes = baxes[:-1]
    baxes = baxes or None
    # heads shard over tp (independent across the ring — ppermute is sp-only)
    haxis = "tp" if mesh.shape.get("tp", 1) > 1 else None
    seq_spec = P(baxes, axis_name, haxis, None)
    seg_spec = P(baxes, axis_name)
    if segment_ids is None:
        segment_ids = jnp.ones(q.shape[:2], jnp.int32)

    def fn(q_, k_, v_, seg_):
        return ring_attention(q_, k_, v_, axis_name, segment_ids=seg_, scale=scale)

    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(seq_spec, seq_spec, seq_spec, seg_spec),
                         out_specs=seq_spec, check_vma=False)(q, k, v, segment_ids)
