"""Flash attention with qk-RMSNorm + RoPE fused into the kernels.

The MMDiT attention stack (reference transformer_flux.py attn processor /
transformer_qwenimage.py:329-337) norms q/k per head (RMSNorm over D) and
applies rotary embeddings before the SDPA call.  Done in XLA, those chains
materialize the roped q/k [B,S,H,D] twice per block (forward + remat
recompute) and run their own backward chains — measured ~40-55 ms/step on
the 512² headline (docs/PERF.md round 3).  Both ops are row-local over
D=128, so they fold into the attention kernels at negligible FLOP cost:

  * forward: one kernel computes norm→rope→flash for each q tile, with the
    normed+roped K built ONCE into VMEM scratch and reused across the whole
    q loop;
  * backward: the merged dq/dk/dv kernel (see ops/flash_attention.py)
    extended with the rope/norm backward — dq_raw/dk_raw leave the kernel,
    plus per-(b,h) partial gradients for the two norm scales.

Forward numerics match the XLA composition rms_norm → x.dtype cast → rope →
x.dtype cast EXACTLY (the intermediate casts are reproduced in-kernel).
Gradients keep f32 through the in-kernel chain (XLA's autodiff rounds the
cotangent at each cast boundary — the kernel is slightly MORE precise, not
bit-identical; tests compare against an f32 oracle).

Dual-stream blocks norm the text rows with a different scale than the image
rows; the kernel takes scale pairs [2, D] and a static row boundary `st`
(txt length): rows < st use scale[0], the rest scale[1].

Gradients flow to q/k/v and the norm scales; d(cos)/d(sin) are zeros (rope
tables are positional constants, never trained).

Only available when K fits a single kernel block (the merged-backward
regime — `supports()`); ops/attention.dot_product_attention falls back to
the XLA composition otherwise.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qflux_tpu.ops.flash_attention import (BLOCK_Q_TARGET, NEG_INF,
                                           _auto_block, _interpret, _pad_len,
                                           _seg_ok)

EPS = 1e-6
# nr-merged backward live set adds the kn bf16 scratch, cos/sin K tiles and
# the f32 norm temps on top of the plain merged kernel's estimate
NR_VMEM_BUDGET = int(os.environ.get("QFLUX_NR_VMEM_MB", "13")) * 1024 * 1024


def _nr_block_q(bk: int, d: int, s_int8: bool = False) -> int | None:
    for bq in (256, 128):
        est = (8 * bq * bk          # s + ds f32
               + 16 * bk * d        # dk/dv f32 accumulators
               + 14 * bk * d        # k raw + kn scratch + dkn + cos/sin tiles
               + 24 * bq * d)       # q tiles + cos/sin q side + temps
        if s_int8:
            est += bk * d           # int8 kn scratch for the score GEMM
        # bq=256 at bk=2560 (est 15.9 MB) compiles under the RAISED
        # scoped-VMEM limit but the merged backward measured ~6% SLOWER
        # there (scripts/bench_nr_block.py, round 5: bwd-only 1.61 vs
        # 1.52 ms at the headline shape), so the 13 MB budget keeps the
        # backward at 128 on purpose; only the forward upgrades
        # (_nr_fwd_block_q). Override: QFLUX_NR_VMEM_MB.
        if est <= NR_VMEM_BUDGET:
            return bq
    return None


def _nr_fwd_block_q(bk: int, d: int, s_int8: bool = False) -> int:
    """Forward-kernel block_q — may exceed the merged backward's.

    The forward's live set is ~half the backward's (no dk/dv accumulators,
    no ds plane), so under the raised scoped-VMEM limit it affords
    block_q=256 where the backward is capped at 128: measured −9% unmasked
    / −49% masked forward at the 512² headline shape, while the backward
    kernel is ~6% SLOWER at 256 (scripts/bench_nr_block.py, round 5) — so
    the two kernels pick independently.  Gated on the raised limit exactly
    like the folded layout (the 256 dual-block variant exceeds the default
    16 MiB scoped-VMEM limit inside the full model).
    """
    raised = _interpret()
    if not raised:
        from qflux_tpu.runtime.tpu_env import scoped_vmem_raised

        raised = scoped_vmem_raised()
    if not raised:
        # under the DEFAULT 16 MiB scoped limit the 256 dual-block variant
        # overflows inside the full model ("scoped vmem 17.21M > 16.00M")
        # — no upgrade; the caller falls back to the backward's choice
        return 128
    budget = max(NR_VMEM_BUDGET, 32 * 1024 * 1024)
    for bq in (256, 128):
        est = (4 * bq * bk          # s f32
               + 16 * bk * d        # k/v tiles + kn scratch + cos/sin K side
               + 24 * bq * d)       # q/o tiles + cos/sin q side + temps
        if s_int8:
            est += bk * d
        if est <= budget:
            return bq
    return 128


def supports(sq: int, sk: int, d: int, s_int8: bool = False) -> bool:
    """The fused path needs K in ONE kernel block (merged-backward regime)
    and self-attention (shared rope tables)."""
    if sq != sk or d % 128 != 0:
        return False
    pk = _auto_block(sk, 1 << 30)  # padded sk — the single K block
    return _nr_block_q(pk, d, s_int8) is not None


def _quant_tile(x):
    """Per-tile (whole-block) symmetric int8 quantization.  The inputs are
    qk-RMS-normed, so row magnitudes are uniform and one scalar scale per
    tile loses little — and a scalar factors out of ANY contraction."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-6)
    return jnp.round(xf / s).astype(jnp.int8), s


def _norm_rope(x, s0, s1, cos, sin, row0, st, out_dtype):
    """RMSNorm (scale selected by global row index vs st) + rotate-half rope.

    x [rows, D] raw; s0/s1 [D]; cos/sin [rows, D] f32; row0 = global index
    of x's first row; st = static boundary.  Returns (y [rows,D] out_dtype —
    feeds the GEMMs, r [rows] f32 and s_sel [rows,D] f32 — feed backward).
    """
    rows, d = x.shape
    h = d // 2
    xf = x.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1) + EPS)  # [rows]
    u = xf * r[:, None]
    sel = (row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)) < st
    s_sel = jnp.where(sel, s0[None, :].astype(jnp.float32),
                      s1[None, :].astype(jnp.float32))
    # the XLA pipeline is rms_norm(...).astype(x.dtype) THEN rope in f32 with
    # a final x.dtype cast — both intermediate casts reproduced for exact
    # forward parity
    us = (u * s_sel).astype(out_dtype).astype(jnp.float32)
    rot = jnp.concatenate([-us[:, h:], us[:, :h]], axis=1)
    y = (us * cos + rot * sin).astype(out_dtype)
    return y, r, s_sel


def _rope_bwd(g, cos, sin):
    """Transpose of y = x*cos + rot(x)*sin, rot(x) = [-x₂, x₁]."""
    h = g.shape[-1] // 2
    gs = g * sin
    return g * cos + jnp.concatenate([gs[:, h:], -gs[:, :h]], axis=1)


def _norm_bwd(d_us, r, s_sel, x_raw):
    """Backward of x → (x·r)·s_sel (the cast's rounding is not part of the
    gradient chain).  Returns (dx [rows,D] f32, dscale_rows [rows,D] f32)."""
    xf = x_raw.astype(jnp.float32)
    u = xf * r[:, None]
    dscale_rows = d_us * u
    du = d_us * s_sel
    dx = r[:, None] * (du - u * jnp.mean(du * u, axis=-1, keepdims=True))
    return dx, dscale_rows


def _two_row_tile(a, b, d):
    """[D], [D] → [8, D] (rows 0/1 carry the payload — Mosaic-friendly)."""
    return jnp.concatenate([a[None], b[None],
                            jnp.zeros((6, d), jnp.float32)], axis=0)


# ---------------------------------------------------------------------------
# forward kernel: grid (b, h, nq), single K block

def _ld(ref, folded):
    """Strip the leading block-index dims: folded blocks are (1, rows, D)
    over [B, S, H·D] arrays; unfolded ones (1, 1, rows, D) over [B,H,S,D]."""
    return ref[0] if folded else ref[0, 0]


def _st_ref(ref, val, folded):
    if folded:
        ref[0] = val
    else:
        ref[0, 0] = val


def _fwd_nr_kernel(*refs, scale, st, masked, s_int8, folded):
    if masked:
        (qseg_ref, kseg_ref, qs_ref, ks_ref, q_ref, k_ref, v_ref,
         qcos_ref, qsin_ref, kcos_ref, ksin_ref,
         o_ref, lse_ref, *scr) = refs
    else:
        (qs_ref, ks_ref, q_ref, k_ref, v_ref,
         qcos_ref, qsin_ref, kcos_ref, ksin_ref,
         o_ref, lse_ref, *scr) = refs
    i = pl.program_id(2)
    bq = q_ref.shape[-2]
    dt = q_ref.dtype

    @pl.when(i == 0)
    def _():
        kn, _, _ = _norm_rope(_ld(k_ref, folded), ks_ref[0], ks_ref[1],
                              kcos_ref[0], ksin_ref[0], 0, st, dt)
        if s_int8:
            kq, ksc = _quant_tile(kn)
            scr[0][...] = kq
            scr[1][0, 0] = ksc
        else:
            scr[0][...] = kn

    qn, _, _ = _norm_rope(_ld(q_ref, folded), qs_ref[0], qs_ref[1],
                          qcos_ref[0], qsin_ref[0], i * bq, st, dt)
    if s_int8:
        # int8 score GEMM: 2x MXU throughput; the scalar tile scales factor
        # straight out of the contraction
        qq, qsc = _quant_tile(qn)
        s = jax.lax.dot_general(
            qq, scr[0][...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32
        ).astype(jnp.float32) * (qsc * scr[1][0, 0] * scale)
    else:
        s = jax.lax.dot_general(qn, scr[0][...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
    if masked:
        ok = _seg_ok(qseg_ref[0, 0], kseg_ref[0, 0])
        s = s + jnp.where(ok, 0.0, NEG_INF)
    m = jnp.max(s, axis=-1)
    e = s - m[:, None]
    p = jnp.where(ok, jnp.exp(e), 0.0) if masked else jnp.exp(e)
    l = jnp.sum(p, axis=-1)
    l_safe = jnp.where(l == 0.0, 1.0, l) if masked else l
    acc = jax.lax.dot(p.astype(v_ref.dtype), _ld(v_ref, folded),
                      preferred_element_type=jnp.float32)
    _st_ref(o_ref, (acc * (1.0 / l_safe)[:, None]).astype(o_ref.dtype), folded)
    lse_ref[0, 0, 0] = m + jnp.log(l_safe)


def _fwd_nr(q, k, v, qs, ks, cos, sin, q_seg, kv_seg, scale, block_q, st,
            s_int8=False, folded=False, n_heads=None):
    if folded:
        # q/k/v are [B, S, H·D] (the raw projection-GEMM layout): each grid
        # step reads a (block_q, D) window at lane offset h·D — no [B,H,S,D]
        # relayout copies on either side of the kernel
        b, sq, hd = q.shape
        h = n_heads
        d = hd // h
        sk = k.shape[1]
    else:
        b, h, sq, d = q.shape
        sk = k.shape[2]
    nq = sq // block_q
    masked = q_seg is not None
    seg_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b_, h_, i: (b_, 0, i)),
        pl.BlockSpec((1, 1, sk), lambda b_, h_, i: (b_, 0, 0)),
    ] if masked else []
    seg_args = (q_seg, kv_seg) if masked else ()
    scratch = ([pltpu.VMEM((sk, d), jnp.int8),
                pltpu.SMEM((1, 1), jnp.float32)] if s_int8
               else [pltpu.VMEM((sk, d), q.dtype)])
    if folded:
        q_spec = pl.BlockSpec((1, block_q, d), lambda b_, h_, i: (b_, i, h_))
        kv_spec = pl.BlockSpec((1, sk, d), lambda b_, h_, i: (b_, 0, h_))
        o_spec = pl.BlockSpec((1, block_q, d), lambda b_, h_, i: (b_, i, h_))
    else:
        q_spec = pl.BlockSpec((1, 1, block_q, d),
                              lambda b_, h_, i: (b_, h_, i, 0))
        kv_spec = pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0))
        o_spec = pl.BlockSpec((1, 1, block_q, d),
                              lambda b_, h_, i: (b_, h_, i, 0))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_nr_kernel, scale=scale, st=st, masked=masked,
                          s_int8=s_int8, folded=folded),
        grid=(b, h, nq),
        in_specs=seg_specs + [
            pl.BlockSpec((2, d), lambda b_, h_, i: (0, 0)),
            pl.BlockSpec((2, d), lambda b_, h_, i: (0, 0)),
            q_spec,
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, block_q, d), lambda b_, h_, i: (b_, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda b_, h_, i: (b_, i, 0)),
            pl.BlockSpec((1, sk, d), lambda b_, h_, i: (b_, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda b_, h_, i: (b_, 0, 0)),
        ],
        out_specs=[
            o_spec,
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, i: (b_, h_, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, sq), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*seg_args, qs, ks, q, k, v, cos, sin, cos, sin)
    return out, lse


# ---------------------------------------------------------------------------
# merged backward: dq_raw, dk_raw, dv + norm-scale gradient partials

def _bwd_nr_kernel(*refs, scale, st, num_q, masked, s_int8, folded):
    if masked:
        (qseg_ref, kseg_ref, qs_ref, ks_ref, q_ref, k_ref, v_ref, do_ref,
         o_ref, lse_ref, qcos_ref, qsin_ref, kcos_ref, ksin_ref,
         dq_ref, dk_ref, dv_ref, dqs_ref, dks_ref,
         kn_scr, dkn_scr, dv_scr, dqs_scr, *qscr) = refs
    else:
        (qs_ref, ks_ref, q_ref, k_ref, v_ref, do_ref,
         o_ref, lse_ref, qcos_ref, qsin_ref, kcos_ref, ksin_ref,
         dq_ref, dk_ref, dv_ref, dqs_ref, dks_ref,
         kn_scr, dkn_scr, dv_scr, dqs_scr, *qscr) = refs
    i = pl.program_id(2)
    bq = q_ref.shape[-2]
    d = q_ref.shape[-1]
    dt = q_ref.dtype

    @pl.when(i == 0)
    def _():
        kn, _, _ = _norm_rope(_ld(k_ref, folded), ks_ref[0], ks_ref[1],
                              kcos_ref[0], ksin_ref[0], 0, st, dt)
        kn_scr[...] = kn
        if s_int8:
            kq, ksc = _quant_tile(kn)
            qscr[0][...] = kq
            qscr[1][0, 0] = ksc
        dkn_scr[...] = jnp.zeros_like(dkn_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)
        dqs_scr[...] = jnp.zeros_like(dqs_scr)

    qn, q_r, q_ssel = _norm_rope(_ld(q_ref, folded), qs_ref[0], qs_ref[1],
                                 qcos_ref[0], qsin_ref[0], i * bq, st, dt)
    kn = kn_scr[...]
    do = _ld(do_ref, folded)
    delta = jnp.sum(do.astype(jnp.float32)
                    * _ld(o_ref, folded).astype(jnp.float32),
                    axis=-1)  # [bq]
    if s_int8:
        # same quantization as the forward — the recomputed s (and hence p)
        # is bit-identical to what produced the saved lse
        qq, qsc = _quant_tile(qn)
        s = jax.lax.dot_general(
            qq, qscr[0][...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32
        ).astype(jnp.float32) * (qsc * qscr[1][0, 0] * scale)
    else:
        s = jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse_ref[0, 0, 0][:, None])
    if masked:
        # zeroes masked entries AND fully-masked rows (see _dq_kernel in
        # ops/flash_attention.py)
        p = jnp.where(_seg_ok(qseg_ref[0, 0], kseg_ref[0, 0]), p, 0.0)
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, _ld(v_ref, folded), (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = ((p * (dp - delta[:, None])) * scale).astype(dt)
    # grads w.r.t. the ROPED+NORMED q/k …
    dqn = jax.lax.dot(ds, kn, preferred_element_type=jnp.float32)
    dkn_scr[...] += jax.lax.dot_general(
        ds, qn, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # … then back through rope + norm for THIS q tile
    d_us = _rope_bwd(dqn, qcos_ref[0], qsin_ref[0])
    dq_raw, dsc_rows = _norm_bwd(d_us, q_r, q_ssel, _ld(q_ref, folded))
    _st_ref(dq_ref, dq_raw.astype(dq_ref.dtype), folded)
    sel = (i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)) < st
    dqs_scr[...] += _two_row_tile(
        jnp.sum(jnp.where(sel, dsc_rows, 0.0), axis=0),
        jnp.sum(jnp.where(sel, 0.0, dsc_rows), axis=0), d)

    @pl.when(i == num_q - 1)
    def _():
        # k side ONCE, against the accumulated dkn
        sk = k_ref.shape[-2]
        _, k_r, k_ssel = _norm_rope(_ld(k_ref, folded), ks_ref[0], ks_ref[1],
                                    kcos_ref[0], ksin_ref[0], 0, st, dt)
        d_usk = _rope_bwd(dkn_scr[...], kcos_ref[0], ksin_ref[0])
        dk_raw, dsk_rows = _norm_bwd(d_usk, k_r, k_ssel, _ld(k_ref, folded))
        _st_ref(dk_ref, dk_raw.astype(dk_ref.dtype), folded)
        _st_ref(dv_ref, dv_scr[...].astype(dv_ref.dtype), folded)
        dqs_ref[0, 0] = dqs_scr[...]
        ksel = jax.lax.broadcasted_iota(jnp.int32, (sk, 1), 0) < st
        dks_ref[0, 0] = _two_row_tile(
            jnp.sum(jnp.where(ksel, dsk_rows, 0.0), axis=0),
            jnp.sum(jnp.where(ksel, 0.0, dsk_rows), axis=0), d)


def _bwd_nr(q, k, v, qs, ks, cos, sin, q_seg, kv_seg, out, lse, do, scale,
            block_q, st, s_int8=False, folded=False, n_heads=None):
    if folded:
        b, sq, hd = q.shape
        h = n_heads
        d = hd // h
        sk = k.shape[1]
    else:
        b, h, sq, d = q.shape
        sk = k.shape[2]
    nq = sq // block_q
    masked = q_seg is not None
    seg_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b_, h_, i: (b_, 0, i)),
        pl.BlockSpec((1, 1, sk), lambda b_, h_, i: (b_, 0, 0)),
    ] if masked else []
    seg_args = (q_seg, kv_seg) if masked else ()
    quant_scr = ([pltpu.VMEM((sk, d), jnp.int8),
                  pltpu.SMEM((1, 1), jnp.float32)] if s_int8 else [])
    if folded:
        q_spec = pl.BlockSpec((1, block_q, d), lambda b_, h_, i: (b_, i, h_))
        kv_spec = pl.BlockSpec((1, sk, d), lambda b_, h_, i: (b_, 0, h_))
    else:
        q_spec = pl.BlockSpec((1, 1, block_q, d),
                              lambda b_, h_, i: (b_, h_, i, 0))
        kv_spec = pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0))
    dq, dk, dv, dqs_p, dks_p = pl.pallas_call(
        functools.partial(_bwd_nr_kernel, scale=scale, st=st, num_q=nq,
                          masked=masked, s_int8=s_int8, folded=folded),
        grid=(b, h, nq),
        in_specs=seg_specs + [
            pl.BlockSpec((2, d), lambda b_, h_, i: (0, 0)),
            pl.BlockSpec((2, d), lambda b_, h_, i: (0, 0)),
            q_spec,
            kv_spec,
            kv_spec,
            q_spec,
            q_spec,
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, i: (b_, h_, 0, i)),
            pl.BlockSpec((1, block_q, d), lambda b_, h_, i: (b_, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda b_, h_, i: (b_, i, 0)),
            pl.BlockSpec((1, sk, d), lambda b_, h_, i: (b_, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda b_, h_, i: (b_, 0, 0)),
        ],
        out_specs=[
            q_spec,
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, 1, 8, d), lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, 8, d), lambda b_, h_, i: (b_, h_, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct((b, h, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 8, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((sk, d), q.dtype),        # kn
            pltpu.VMEM((sk, d), jnp.float32),    # dkn accumulator
            pltpu.VMEM((sk, d), jnp.float32),    # dv accumulator
            pltpu.VMEM((8, d), jnp.float32),     # dscale_q partials
        ] + quant_scr,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*seg_args, qs, ks, q, k, v, do, out, lse, cos, sin, cos, sin)
    dqs = jnp.sum(dqs_p[:, :, :2].astype(jnp.float32), axis=(0, 1))  # [2, D]
    dks = jnp.sum(dks_p[:, :, :2].astype(jnp.float32), axis=(0, 1))
    return dq, dk, dv, dqs, dks


# ---------------------------------------------------------------------------
# public API

def _fold_default() -> bool:
    """Folded layout: keep q/k/v in the raw [B, S, H·D] projection layout (a
    free reshape of the GEMM outputs) and let the kernels window each head at
    lane offset h·D — no [B,H,S,D] relayout copies around the kernels in
    forward, recompute, or backward (measured −11 ms on the 512² headline,
    docs/PERF.md round 4).

    On a REAL TPU backend the folded merged-backward only compiles when the
    scoped-VMEM limit is raised (XLA places its dq/dk outputs in VMEM —
    runtime/tpu_env.py), so the default is ON iff that ran (all qflux
    entrypoints call it) or the user raised the limit themselves; interpret
    mode (CPU tests/mesh) has no such constraint.  ``QFLUX_NR_FOLD=0/1``
    overrides either way.
    """
    import os

    flag = os.environ.get("QFLUX_NR_FOLD")
    if flag is not None:
        return flag != "0"
    if _interpret():
        return True
    from qflux_tpu.runtime.tpu_env import scoped_vmem_raised

    return scoped_vmem_raised()


def apply_qk_norm_rope(x, scale2, cos, sin, st, eps=EPS):
    """XLA reference / fallback: per-head RMSNorm (scale2[0] for positions
    < st, scale2[1] after) then rotate-half rope.  x [B,S,H,D]; cos/sin
    [S,D] or [B,S,D].  Matches rms_norm → rope exactly, including the
    intermediate x.dtype casts."""
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    xf = x.astype(jnp.float32)
    u = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    s_sel = jnp.where(
        (jnp.arange(x.shape[1]) < st)[None, :, None, None],
        scale2[0].astype(jnp.float32)[None, None, None, :],
        scale2[1].astype(jnp.float32)[None, None, None, :])
    us = (u * s_sel).astype(x.dtype).astype(jnp.float32)
    h = x.shape[-1] // 2
    rot = jnp.concatenate([-us[..., h:], us[..., :h]], axis=-1)
    cb = cos.astype(jnp.float32)[:, :, None, :]
    sb = sin.astype(jnp.float32)[:, :, None, :]
    return (us * cb + rot * sb).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def _flash_nr(q, k, v, qs, ks, cos, sin, q_seg, kv_seg, scale, block_q, st,
              s_int8, folded, n_heads):
    # block_q is a (fwd, bwd) pair — the kernels size independently (see
    # _nr_fwd_block_q).
    out, _ = _fwd_nr(q, k, v, qs, ks, cos, sin, q_seg, kv_seg, scale,
                     block_q[0], st, s_int8, folded, n_heads)
    return out


def _flash_nr_fwd(q, k, v, qs, ks, cos, sin, q_seg, kv_seg, scale, block_q,
                  st, s_int8, folded, n_heads):
    out, lse = _fwd_nr(q, k, v, qs, ks, cos, sin, q_seg, kv_seg, scale,
                       block_q[0], st, s_int8, folded, n_heads)
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, qs, ks, cos, sin, q_seg, kv_seg, out, lse)


def _flash_nr_bwd(scale, block_q, st, s_int8, folded, n_heads, res, do):
    q, k, v, qs, ks, cos, sin, q_seg, kv_seg, out, lse = res
    dq, dk, dv, dqs, dks = _bwd_nr(q, k, v, qs, ks, cos, sin, q_seg, kv_seg,
                                   out, lse, do, scale, block_q[1], st, s_int8,
                                   folded, n_heads)
    return (dq, dk, dv, dqs.astype(qs.dtype), dks.astype(ks.dtype),
            jnp.zeros_like(cos), jnp.zeros_like(sin), None, None)


_flash_nr.defvjp(_flash_nr_fwd, _flash_nr_bwd)


def flash_attention_nr(q, k, v, q_scale2, k_scale2, cos, sin, st,
                       segment_ids=None, kv_segment_ids=None, scale=None,
                       s_int8=False):
    """Fused qk-RMSNorm + RoPE + flash attention over [B, S, H, D] RAW q/k.

    q_scale2/k_scale2: [2, D] norm scales (row 0 for positions < st, row 1
    after — dual-stream txt/img; repeat the row for single-stream).
    cos/sin: [S, D] or [B, S, D] rotate-half tables.
    st: static txt/img boundary (int; 0 = all rows use scale row 1).
    s_int8: run the score GEMM (and its backward recompute) as int8 x int8
    on the MXU with per-tile scales — ~2x score-GEMM throughput at ~1%
    score error (quantized-base numerics class; see ops/quant.py).

    Equivalent to apply_qk_norm_rope on q and k followed by
    flash_attention.  Check `supports(sq, sk, d)` before calling.
    """
    b, sq, h, d = q.shape
    assert k.shape[1] == sq, "fused norm+rope path is self-attention only"
    scale = scale if scale is not None else 1.0 / (d ** 0.5)
    sk_pad = _auto_block(sq, 1 << 30)
    bq_m = _nr_block_q(sk_pad, d, s_int8)
    assert bq_m is not None, "caller must gate on flash_nr.supports()"
    block_q = min(_auto_block(sq, BLOCK_Q_TARGET), bq_m)
    pq = _pad_len(sq, block_q)
    # the forward kernel may take a bigger block than the backward — but
    # never at the cost of extra padding (padding flips the call to the
    # masked path, which is what the big block is best at avoiding)
    bq_fwd = min(_auto_block(sq, BLOCK_Q_TARGET),
                 _nr_fwd_block_q(sk_pad, d, s_int8))
    if bq_fwd < block_q or _pad_len(sq, bq_fwd) != pq:
        bq_fwd = block_q

    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos = jnp.broadcast_to(cos.astype(jnp.float32), (b, sq, d))
    sin = jnp.broadcast_to(sin.astype(jnp.float32), (b, sq, d))

    folded = _fold_default()

    t3 = lambda x: jnp.pad(x, ((0, 0), (0, pq), (0, 0)))
    if folded:
        fold = lambda x: jnp.pad(
            x, ((0, 0), (0, pq), (0, 0), (0, 0))).reshape(b, sq + pq, h * d)
        qt = checkpoint_name(fold(q), "flash_q")
        kt = checkpoint_name(fold(k), "flash_k")
        vt = checkpoint_name(fold(v), "flash_v")
    else:
        t4 = lambda x: jnp.pad(
            x, ((0, 0), (0, pq), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
        qt = checkpoint_name(t4(q), "flash_q")
        kt = checkpoint_name(t4(k), "flash_k")
        vt = checkpoint_name(t4(v), "flash_v")

    unmasked = segment_ids is None and kv_segment_ids is None
    if unmasked and pq == 0:
        qseg = None
    else:
        # self-attention: padding must be masked on BOTH sides (padded k
        # rows would otherwise be attended by real queries)
        seg = (jnp.ones((b, sq), jnp.int32) if segment_ids is None
               else segment_ids.astype(jnp.int32))
        qseg = jnp.pad(seg, ((0, 0), (0, pq)))[:, None, :]

    out = _flash_nr(qt, kt, vt, q_scale2, k_scale2, t3(cos), t3(sin),
                    qseg, qseg, scale, (bq_fwd, block_q), st, bool(s_int8),
                    folded, h)
    if folded:
        return out[:, :sq].reshape(b, sq, h, d)
    return out.transpose(0, 2, 1, 3)[:, :sq]
