"""Ring attention: sequence-parallel exact attention over a mesh axis.

A NEW capability relative to the reference, which has no sequence/context
parallelism (SURVEY.md §2.8: "TPU build should add sequence-parallel …
for ≥4k-token joint sequences").  At 1024² multi-control the joint [txt, img]
sequence passes 16k tokens; attention memory/compute then dominates a single
chip — ring attention shards the SEQUENCE over an axis and rotates K/V chunks
around the ring with `ppermute`, merging partial softmax results online
(blockwise attention: each hop is numerically the flash-attention update).

Usage (inside shard_map over a mesh with a sequence axis, e.g. "sp"):

    out = ring_attention(q, k, v, axis_name="sp", segment_ids=seg)

q, k, v: [B, S_local, H, D] (the global sequence split over the axis);
segment_ids: [B, S_local] (0 = padding), rotated with K/V.
Communication rides the ICI ring; compute of hop i overlaps XLA-scheduled
collective-permute of hop i+1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _block_update(q, k, v, q_seg, kv_seg, m, l, acc, scale):
    """One flash-attention style partial update with [B,S,H,D] blocks."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if q_seg is not None:
        ok = (q_seg[:, :, None] == kv_seg[:, None, :]) & (q_seg[:, :, None] != 0)
        s = jnp.where(ok[:, None], s, NEG_INF)
    m_new = jnp.maximum(m, s.max(axis=-1))                      # [B,H,Q]
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new[..., None])                            # [B,H,Q,K]
    l_new = alpha * l + p.sum(axis=-1)
    pv = jnp.einsum("bhqk,bkhd->bhqd", p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
    acc_new = acc * alpha[..., None] + pv
    return m_new, l_new, acc_new


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str,
                   segment_ids: Optional[jax.Array] = None,
                   scale: Optional[float] = None) -> jax.Array:
    """[B, S_local, H, D] → [B, S_local, H, D]; call under shard_map with the
    sequence dim split over `axis_name`."""
    b, s_loc, h, d = q.shape
    n = jax.lax.psum(1, axis_name)
    scale = scale if scale is not None else 1.0 / (d ** 0.5)

    m0 = jnp.full((b, h, s_loc), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc), jnp.float32)
    acc0 = jnp.zeros((b, h, s_loc, d), jnp.float32)
    kv_seg0 = segment_ids if segment_ids is not None else None

    def hop(carry, _):
        m, l, acc, k_cur, v_cur, seg_cur = carry
        m, l, acc = _block_update(q, k_cur, v_cur, segment_ids, seg_cur, m, l, acc, scale)
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        seg_nxt = (jax.lax.ppermute(seg_cur, axis_name, perm)
                   if seg_cur is not None else None)
        return (m, l, acc, k_nxt, v_nxt, seg_nxt), None

    (m, l, acc, _, _, _), _ = jax.lax.scan(
        hop, (m0, l0, acc0, k, v, kv_seg0), None, length=n)

    out = acc / jnp.maximum(l, 1e-20)[..., None]                 # [B,H,Q,D]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh, axis_name: str,
                           segment_ids=None, scale=None):
    """Convenience wrapper: takes GLOBAL [B, S, H, D] arrays and runs the ring
    under shard_map with S split over `axis_name`."""
    from jax.sharding import PartitionSpec as P

    seq_spec = P(None, axis_name, None, None)
    seg_spec = P(None, axis_name)
    in_specs = (seq_spec, seq_spec, seq_spec) + ((seg_spec,) if segment_ids is not None else ())

    if segment_ids is not None:
        def fn(q_, k_, v_, seg_):
            return ring_attention(q_, k_, v_, axis_name, segment_ids=seg_, scale=scale)

        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=seq_spec, check_vma=False)(q, k, v, segment_ids)

    def fn(q_, k_, v_):
        return ring_attention(q_, k_, v_, axis_name, scale=scale)

    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=seq_spec, check_vma=False)(q, k, v)
