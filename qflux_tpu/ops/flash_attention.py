"""Pallas TPU flash attention for MMDiT joint [txt, img] streams.

Replaces the reference's CUDA flash-attn / torch SDPA (reference
models/load_model.py:29,43; transformer_qwenimage.py:329-337) with a
block-wise online-softmax kernel designed for this workload:

  * bidirectional (no causal structure) — full Sq×Sk tiling;
  * segment-id masking: seg==0 is padding, tokens attend iff segments match
    and are nonzero.  This subsumes the reference's [B,1,S,S] additive masks
    for multi-resolution padded batches (reference
    flux_kontext_trainer.py:579-796) at O(S) instead of O(S²) memory;
  * head_dim 128 (FLUX and Qwen) → MXU-native tiles;
  * custom VJP with flash-style backward (dq and dkv kernels), recomputing
    probabilities from the stored per-row logsumexp.

Shapes: q,k,v [B, S, H, D] (model layout); kernels run in [B, H, S, D].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# block-size auto-tune targets (measured sweep on v5e, S=2.3-4.4k, D=128,
# docs/PERF.md round-2: one full-width K pass per q block beats square
# 256x256 tiling 2.3-3.7x — fewer grid invocations, K/V streamed once):
#   block_q: 256 rows (no benefit beyond 512, and 256 minimizes padding)
#   block_k: the whole padded sequence, capped so the [bq, bk] f32 logits
#            tile stays ~4 MB of VMEM; above the cap, the fewest equal
#            chunks that respect it
BLOCK_Q_TARGET = 256
BLOCK_K_CAP = 4096
# the dq/dkv kernels hold more live tiles per step (s_t, p_t, dp_t plus the
# dk/dv accumulators); Mosaic fails to compile them at block_k=4096 on v5e
# while 3968 works (probed boundary) — the BACKWARD re-chunks K under this cap
BLOCK_K_CAP_BWD = 3968
# merged dq+dk+dv single-kernel backward: live VMEM ≈ 8·bq·bk (s + ds, f32)
# + 8·bk·d (dk/dv f32 accumulators) + 8·bk·d (k/v tiles + dk/dv out, bf16)
# + O(bq·d). Gate on this estimate against a conservative budget of the
# ~16 MB/core VMEM so Mosaic never sees an unallocatable kernel.
MERGED_BWD_VMEM_BUDGET = 13 * 1024 * 1024


def _merged_bwd_block_q(bk: int, d: int) -> int | None:
    """Largest block_q in {256, 128} whose merged-backward VMEM estimate fits
    the budget, or None if even 128 does not fit (→ split kernels)."""
    for bq in (256, 128):
        est = 8 * bq * bk + 16 * bk * d + 8 * bq * d
        if est <= MERGED_BWD_VMEM_BUDGET:
            return bq
    return None


def _bwd_block_k(sk: int) -> int:
    """Largest 128-multiple chunk ≤ BLOCK_K_CAP_BWD that divides sk (sk is
    already padded to a multiple of 128 by the forward)."""
    if sk <= BLOCK_K_CAP_BWD:
        return sk
    units = sk // 128
    for n in range(2, units + 1):
        if units % n == 0 and (units // n) * 128 <= BLOCK_K_CAP_BWD:
            return (units // n) * 128
    return 128


def _auto_block(s: int, target: int) -> int:
    """Smallest number of equal ≤target chunks covering s, rounded up to the
    128-lane tile — minimizes both grid steps and padding waste."""
    n = -(-s // target)
    per = -(-s // n)
    return min((per + 127) // 128 * 128, (s + 127) // 128 * 128)


def _interpret() -> bool:
    # Mosaic lowering needs a real TPU backend; anywhere else (CPU tests,
    # the virtual 8-device mesh) run the kernel in interpreter mode.
    return jax.default_backend() not in ("tpu",)


def _seg_ok(q_seg, k_seg):
    """[bq], [bk] int32 → bool [bq, bk]; True = may attend."""
    return (q_seg[:, None] == k_seg[None, :]) & (q_seg[:, None] != 0)


def _seg_ok_t(q_seg, k_seg):
    """Transposed mask [bk, bq], built directly — Mosaic cannot legalize
    tpu.transpose on i1 vectors, so transpose(_seg_ok(...)) fails to lower."""
    return (k_seg[:, None] == q_seg[None, :]) & (q_seg[None, :] != 0)


def _mask(q_seg, k_seg):
    """[bq], [bk] int32 → additive mask [bq, bk] (0 or NEG_INF)."""
    return jnp.where(_seg_ok(q_seg, k_seg), 0.0, NEG_INF)


# ---------------------------------------------------------------------------
# forward

def _fwd_kernel(*refs, scale, num_kv, masked):
    # `masked` is a STATIC specialization switch: fully-packed batches (no
    # segment ids, no padding — the bench/headline shape) skip the segment
    # loads and the compare/where mask math on every [bq, bk] tile
    if masked:
        (qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
         m_scr, l_scr, acc_scr) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    j = pl.program_id(3)

    q = q_ref[0, 0]  # [bq, D]
    k = k_ref[0, 0]  # [bk, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if masked:
        ok = _seg_ok(qseg_ref[0, 0], kseg_ref[0, 0])
        s = s + jnp.where(ok, 0.0, NEG_INF)

    def _p(x):
        # zero masked entries EXPLICITLY: for a fully-masked row every s is
        # raw + NEG_INF, which f32 rounds to exactly NEG_INF (the ±O(10) raw
        # score is below the ulp at 1e30), so exp(s - m) = exp(0) = 1 — the
        # additive mask alone cannot zero those rows
        return jnp.where(ok, jnp.exp(x), 0.0) if masked else jnp.exp(x)

    def _safe(l):
        # fully-masked row → l == 0 → output 0 (not 1/0)
        return jnp.where(l == 0.0, 1.0, l) if masked else l

    if num_kv == 1:
        # single K pass (the auto-tuned common case): plain softmax, no
        # online-rescale scratch round trips
        m = jnp.max(s, axis=-1)
        p = _p(s - m[:, None])
        l = jnp.sum(p, axis=-1)
        l_safe = _safe(l)
        acc = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                          preferred_element_type=jnp.float32)
        o_ref[0, 0] = (acc * (1.0 / l_safe)[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0, 0] = m + jnp.log(l_safe)
        return

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    m_prev = m_scr[:, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = _p(s - m_new[:, None])
    l_new = alpha * l_scr[:, 0] + jnp.sum(p, axis=-1)

    acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0, 0], preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new[:, None], m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new[:, None], l_scr.shape)

    @pl.when(j == num_kv - 1)
    def _():
        l_safe = _safe(l_scr[:, 0])
        o_ref[0, 0] = (acc_scr[:] * (1.0 / l_safe)[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0, 0] = m_scr[:, 0] + jnp.log(l_safe)


def _fwd(q, k, v, q_seg, kv_seg, scale, block_q, block_k):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    grid = (b, h, nq, nk)
    masked = q_seg is not None
    seg_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b_, h_, i, j: (b_, 0, i)),
        pl.BlockSpec((1, 1, block_k), lambda b_, h_, i, j: (b_, 0, j)),
    ] if masked else []
    seg_args = (q_seg, kv_seg) if masked else ()
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, num_kv=nk, masked=masked),
        grid=grid,
        in_specs=seg_specs + [
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, i, j: (b_, h_, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*seg_args, q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# backward

def _dq_kernel(*refs, scale, num_kv, masked):
    if masked:
        (qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dq_scr) = refs
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr = refs
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # recompute p against the stored lse; when masked, the where() zeroes
    # masked entries and ESPECIALLY fully-masked rows, where s ≡ NEG_INF ≡
    # lse in f32 would give exp(0) = 1 garbage that leaks into dq (and, via
    # the dkv kernel, into VALID keys' dk/dv whenever the incoming cotangent
    # is nonzero on padded rows)
    p = jnp.exp(s - lse_ref[0, 0, 0][:, None])  # [bq, bk]
    if masked:
        p = jnp.where(_seg_ok(qseg_ref[0, 0], kseg_ref[0, 0]), p, 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0, 0][:, None]) * scale
    dq_scr[:] += jax.lax.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    @pl.when(j == num_kv - 1)
    def _():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(*refs, scale, num_q, masked):
    if masked:
        (qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
    i = pl.program_id(3)

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    # s_T: [bk, bq]
    s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * scale
    p_t = jnp.exp(s_t - lse_ref[0, 0, 0][None, :])  # [bk, bq]
    if masked:
        # zeroes masked entries AND fully-masked q columns (see _dq_kernel)
        p_t = jnp.where(_seg_ok_t(qseg_ref[0, 0], kseg_ref[0, 0]), p_t, 0.0)
    dv_scr[:] += jax.lax.dot(p_t.astype(do.dtype), do, preferred_element_type=jnp.float32)
    dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [bk, bq]
    ds_t = p_t * (dp_t - delta_ref[0, 0, 0][None, :]) * scale
    dk_scr[:] += jax.lax.dot(ds_t.astype(q.dtype), q, preferred_element_type=jnp.float32)

    @pl.when(i == num_q - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _dqdkv_kernel(*refs, scale, num_q, masked):
    """Merged backward: one pass per q block with the WHOLE K in VMEM.

    Computes s and p once (the split kernels each recompute them — 7 GEMMs
    across dq+dkv vs the minimal 5 here) and streams q/k/v/do from HBM once
    instead of twice.  dq is written per q block; dk/dv accumulate in f32
    scratch across the q loop and are emitted on the last step.  Only valid
    when K fits a single block (num_kv == 1) — `_bwd` falls back to the
    split kernels otherwise.
    """
    if masked:
        (qseg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
         dq_ref, dk_ref, dv_ref, dk_scr, dv_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
         dq_ref, dk_ref, dv_ref, dk_scr, dv_scr) = refs
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    # delta computed on the fly from the saved forward output — the external
    # [B,H,S] reduce was a measured ~0.3 ms/block HBM round trip
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[0, 0].astype(jnp.float32),
                    axis=-1)  # [bq]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse_ref[0, 0, 0][:, None])  # [bq, bk]
    if masked:
        # zeroes masked entries AND fully-masked rows (see _dq_kernel)
        p = jnp.where(_seg_ok(qseg_ref[0, 0], kseg_ref[0, 0]), p, 0.0)
    # dv += pᵀ @ do — contract the bq dims directly (no transpose op)
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [bq, bk]
    ds = ((p * (dp - delta[:, None])) * scale).astype(k.dtype)
    dq_ref[0, 0] = jax.lax.dot(
        ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_scr[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == num_q - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_merged(q, k, v, q_seg, kv_seg, out, lse, do, scale, block_q):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    nq = sq // block_q
    masked = q_seg is not None
    seg_args = (q_seg, kv_seg) if masked else ()
    seg_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b_, h_, i: (b_, 0, i)),
        pl.BlockSpec((1, 1, sk), lambda b_, h_, i: (b_, 0, 0)),
    ] if masked else []
    dq, dk, dv = pl.pallas_call(
        functools.partial(_dqdkv_kernel, scale=scale, num_q=nq, masked=masked),
        grid=(b, h, nq),
        in_specs=seg_specs + [
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, i: (b_, h_, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((sk, d), jnp.float32),
            pltpu.VMEM((sk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*seg_args, q, k, v, do, out, lse)
    return dq, dk, dv


def _bwd(q, k, v, q_seg, kv_seg, out, lse, do, scale, block_q, block_k):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if block_k == sk:
        bq_m = _merged_bwd_block_q(sk, d)
        if bq_m is not None and sq % bq_m == 0:
            return _bwd_merged(q, k, v, q_seg, kv_seg, out, lse, do, scale,
                               bq_m)

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, :, None, :]  # [B,H,1,Sq]
    nq, nk = sq // block_q, sk // block_k
    masked = q_seg is not None
    seg_args = (q_seg, kv_seg) if masked else ()

    dq_seg_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b_, h_, i, j: (b_, 0, i)),
        pl.BlockSpec((1, 1, block_k), lambda b_, h_, i, j: (b_, 0, j)),
    ] if masked else []
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, num_kv=nk, masked=masked),
        grid=(b, h, nq, nk),
        in_specs=dq_seg_specs + [
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, i, j: (b_, h_, 0, i)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, i, j: (b_, h_, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*seg_args, q, k, v, do, lse, delta)

    dkv_seg_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b_, h_, j, i: (b_, 0, i)),
        pl.BlockSpec((1, 1, block_k), lambda b_, h_, j, i: (b_, 0, j)),
    ] if masked else []
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, num_q=nq, masked=masked),
        grid=(b, h, nk, nq),
        in_specs=dkv_seg_specs + [
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, j, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j, i: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j, i: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, j, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, j, i: (b_, h_, 0, i)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, j, i: (b_, h_, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j, i: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j, i: (b_, h_, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*seg_args, q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public API with custom VJP

def _pad_len(s, block):
    return (block - s % block) % block


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash(q, k, v, q_seg, kv_seg, scale, block_q, block_k):
    out, _ = _fwd(q, k, v, q_seg, kv_seg, scale, block_q, block_k)
    return out


def _flash_fwd(q, k, v, q_seg, kv_seg, scale, block_q, block_k):
    out, lse = _fwd(q, k, v, q_seg, kv_seg, scale, block_q, block_k)
    # Tag the kernel outputs so a remat policy can keep them: with
    # save_only_these_names("flash_out", "flash_lse") the backward pass reuses
    # out+lse (tiny: [B,H,S,D]+[B,H,S]) instead of re-running the forward
    # kernel, while q/k/v are still cheaply recomputed from the GEMMs.
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _flash_bwd(scale, block_q, block_k, res, do):
    q, k, v, q_seg, kv_seg, out, lse = res
    # the split dq/dkv kernels cannot run the forward's full-width K chunk
    # past BLOCK_K_CAP_BWD — but the merged kernel (smaller live set, taken
    # by _bwd when block_k == sk and the VMEM estimate fits) can; only
    # re-chunk when the split path will actually run. Explicit smaller
    # blocks are preserved either way.
    sk = k.shape[2]
    bq_m = _merged_bwd_block_q(sk, q.shape[3]) if block_k == sk else None
    merged = bq_m is not None and q.shape[2] % bq_m == 0
    bk = block_k if (merged or block_k <= BLOCK_K_CAP_BWD) else _bwd_block_k(sk)
    dq, dk, dv = _bwd(q, k, v, q_seg, kv_seg, out, lse, do, scale, block_q, bk)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_fwd_with_lse(q, k, v, q_seg, kv_seg, scale):
    """Padded single forward returning (out [B,S,H,D], lse [B,H,Sq]) — the
    building block for callers that merge partial results themselves (ring
    attention hops). No custom VJP; pair with `flash_bwd_from_residuals`."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq = _auto_block(sq, BLOCK_Q_TARGET)
    bk = _auto_block(sk, BLOCK_K_CAP)
    pq, pk = _pad_len(sq, bq), _pad_len(sk, bk)
    t = lambda x, p: jnp.pad(x, ((0, 0), (0, p), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    qs = jnp.pad(q_seg.astype(jnp.int32), ((0, 0), (0, pq)))[:, None, :]
    ks = jnp.pad(kv_seg.astype(jnp.int32), ((0, 0), (0, pk)))[:, None, :]
    out, lse = _fwd(t(q, pq), t(k, pk), t(v, pk), qs, ks, scale, bq, bk)
    return out.transpose(0, 2, 1, 3)[:, :sq], lse[:, :, 0, :sq]


def flash_bwd_from_residuals(q, k, v, q_seg, kv_seg, out, lse, do, scale):
    """Padded dq/dkv kernels against a caller-supplied (global) out/lse —
    shapes as in `flash_fwd_with_lse`. Returns (dq, dk, dv) in [B,S,H,D]."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq = _auto_block(sq, BLOCK_Q_TARGET)
    bk = _auto_block(sk, min(BLOCK_K_CAP, BLOCK_K_CAP_BWD))
    pq, pk = _pad_len(sq, bq), _pad_len(sk, bk)
    t = lambda x, p: jnp.pad(x, ((0, 0), (0, p), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    qs = jnp.pad(q_seg.astype(jnp.int32), ((0, 0), (0, pq)))[:, None, :]
    ks = jnp.pad(kv_seg.astype(jnp.int32), ((0, 0), (0, pk)))[:, None, :]
    # lse pads with 0.0 ON PURPOSE: padded q rows have every score masked to
    # NEG_INF (segment 0), so p = exp(NEG_INF - 0) = 0 — padding contributes
    # nothing. Padding with NEG_INF instead would make p = exp(0) = 1 across
    # the padded block.
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, pq)),
                    constant_values=0.0)[:, :, None, :]
    dq, dk, dv = _bwd(t(q, pq), t(k, pk), t(v, pk), qs, ks, t(out, pq),
                      lse_p, t(do, pq), scale, bq, bk)
    return (dq.transpose(0, 2, 1, 3)[:, :sq],
            dk.transpose(0, 2, 1, 3)[:, :sk],
            dv.transpose(0, 2, 1, 3)[:, :sk])


def flash_attention(q, k, v, segment_ids=None, kv_segment_ids=None, scale=None,
                    block_q: int | None = None, block_k: int | None = None):
    """Flash attention over [B, S, H, D] inputs with segment-id masking.

    Pads S up to the block size (padding gets segment 0 ⇒ fully masked) and
    transposes to the kernel's [B, H, S, D] layout.  Block sizes default to
    the measured auto-tune rule (see BLOCK_Q_TARGET/BLOCK_K_CAP above);
    explicit values override it.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale if scale is not None else 1.0 / (d ** 0.5)
    unmasked = segment_ids is None and kv_segment_ids is None
    block_q = (_auto_block(sq, BLOCK_Q_TARGET) if block_q is None
               else min(block_q, max(sq, 128)))
    block_k = (_auto_block(sk, BLOCK_K_CAP) if block_k is None
               else min(block_k, max(sk, 128)))
    pq, pk = _pad_len(sq, block_q), _pad_len(sk, block_k)

    qt = checkpoint_name(
        jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0))).transpose(0, 2, 1, 3), "flash_q")
    kt = checkpoint_name(
        jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0))).transpose(0, 2, 1, 3), "flash_k")
    vt = checkpoint_name(
        jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0))).transpose(0, 2, 1, 3), "flash_v")
    if unmasked and pk == 0:
        # fully-packed, block-aligned K (the headline shape): the unmasked
        # kernel specialization skips segment loads and all mask math.
        # q-side padding (pq > 0) is harmless without a mask — padded rows
        # attend to real keys, produce finite garbage, and are sliced off.
        qs = ks = None
    else:
        seg = (jnp.ones((b, sq), jnp.int32) if segment_ids is None
               else segment_ids)
        kv_seg = kv_segment_ids if kv_segment_ids is not None else seg
        qs = jnp.pad(seg.astype(jnp.int32), ((0, 0), (0, pq)))[:, None, :]
        ks = jnp.pad(kv_seg.astype(jnp.int32), ((0, 0), (0, pk)))[:, None, :]

    out = _flash(qt, kt, vt, qs, ks, scale, block_q, block_k)
    return out.transpose(0, 2, 1, 3)[:, :sq]
