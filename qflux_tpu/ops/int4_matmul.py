"""Pallas TPU fused int4-dequant matmul: y = x @ dequant(q4, scales).

Status: measured SLOWER than XLA's own dequant+matmul fusion at the model's
shapes (80 vs 90 TFLOPs-equiv; best tiles bm=256, bn=512, bkp=1536 — sweep in
docs/PERF.md) — XLA pipelines the unpack/scale into the GEMM well on its own.
Kept as an opt-in (QFLUX_FUSED_INT4=1) and as groundwork for a manually
double-buffered variant; the default int4 path is the XLA dequant in
ops/layers.dense.

Layout contract (matches ops/quant.quantize_kernel_int4, HALF-SPLIT):
  q4    [K/2, N] int8 — byte i holds original rows i (low nibble) and
        i + K/2 (high nibble), two's-complement int4;
  scale [K/128, N] f32 — per-(128-row group, out-channel); the first
        K/256 groups cover the low-nibble plane, the rest the high plane.

The kernel takes x pre-split into its two contiguous K halves so the
in-VMEM unpack is two plain elementwise nibble planes — no interleave:

  y = x[:, :K/2] @ (lo·s_lo) + x[:, K/2:] @ (hi·s_hi)

Backward (custom VJP; weights frozen): dx_lo = g @ (lo·s_lo)ᵀ,
dx_hi = g @ (hi·s_hi)ᵀ with the same packed tiles, concatenated by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# K-tile = BLOCK_KP rows of each half; scale tile rows = BLOCK_KP/128 must be ≥8
import os as _os

BLOCK_M = int(_os.environ.get("QFLUX_INT4_BM", 256))
BLOCK_N = int(_os.environ.get("QFLUX_INT4_BN", 512))
BLOCK_KP = int(_os.environ.get("QFLUX_INT4_BKP", 1536))  # packed rows/tile
GROUP = 128             # quantization group size along original K


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _unpack_tile(q, s_lo, s_hi):
    """q [bkp, bn] int8, s_* [bkp//128, bn] f32 → (lo·s_lo, hi·s_hi) bf16."""
    qi = q.astype(jnp.int32)
    lo = jnp.left_shift(qi, 28) >> 28          # sign-extended low nibble
    hi = jnp.left_shift(qi, 24) >> 28          # sign-extended high nibble
    # half-split: packed row i ↔ original rows i / i+K/2 → scale row i//128
    wl = (lo.astype(jnp.float32) * jnp.repeat(s_lo, GROUP, axis=0)).astype(jnp.bfloat16)
    wh = (hi.astype(jnp.float32) * jnp.repeat(s_hi, GROUP, axis=0)).astype(jnp.bfloat16)
    return wl, wh


def _fwd_kernel(xe_ref, xo_ref, q_ref, slo_ref, shi_ref, o_ref, acc, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    wl, wh = _unpack_tile(q_ref[...], slo_ref[...], shi_ref[...])
    acc[:] += jax.lax.dot(xe_ref[...], wl, preferred_element_type=jnp.float32)
    acc[:] += jax.lax.dot(xo_ref[...], wh, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc[:].astype(o_ref.dtype)


def _bwd_kernel(g_ref, q_ref, slo_ref, shi_ref, dxe_ref, dxo_ref,
                acc_e, acc_o, *, nn):
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _():
        acc_e[:] = jnp.zeros_like(acc_e)
        acc_o[:] = jnp.zeros_like(acc_o)

    wl, wh = _unpack_tile(q_ref[...], slo_ref[...], shi_ref[...])
    # dx_lo[m, kp] += g[m, n] · wl[kp, n]  (contract n)
    dn = (((1,), (1,)), ((), ()))
    acc_e[:] += jax.lax.dot_general(g_ref[...], wl, dn,
                                    preferred_element_type=jnp.float32)
    acc_o[:] += jax.lax.dot_general(g_ref[...], wh, dn,
                                    preferred_element_type=jnp.float32)

    @pl.when(n == nn - 1)
    def _():
        dxe_ref[...] = acc_e[:].astype(dxe_ref.dtype)
        dxo_ref[...] = acc_o[:].astype(dxo_ref.dtype)


def _pad_to(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_bn(n: int) -> int:
    for b in (BLOCK_N, 384, 256, 128):
        if n % b == 0:
            return b
    raise ValueError(f"N={n} not a multiple of 128")


def supports(k_in: int, n_out: int, n_groups: int | None = None) -> bool:
    """Shapes the fused kernel handles (others use the XLA dequant path):
    each K half must tile by BLOCK_KP and align to the 128-row scale groups
    (half-split packing means groups may not straddle the K/2 boundary).
    `n_groups` (scale.shape[-2]) guards a configurable quantize group_size:
    the kernel hard-codes GROUP=128, so any other grouping must fall back."""
    if n_groups is not None and n_groups * GROUP != k_in:
        return False
    return (k_in % (2 * BLOCK_KP) == 0 and BLOCK_KP % GROUP == 0
            and (k_in // 2) % GROUP == 0 and n_out % 128 == 0)


def _fwd(xe, xo, q4, s_lo, s_hi, out_dtype):
    m, kp = xe.shape
    n = q4.shape[1]
    bm = min(BLOCK_M, m)
    bn = _pick_bn(n)
    nm, nn, nk = m // bm, n // bn, kp // BLOCK_KP
    sb = BLOCK_KP // GROUP
    sspec = pl.BlockSpec((sb, bn), lambda i, j, k: (k, j))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, BLOCK_KP), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, BLOCK_KP), lambda i, j, k: (i, k)),
            pl.BlockSpec((BLOCK_KP, bn), lambda i, j, k: (k, j)),
            sspec, sspec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(xe, xo, q4, s_lo, s_hi)


def _bwd(g, q4, s_lo, s_hi, x_dtype):
    m, n = g.shape
    kp = q4.shape[0]
    bm = min(BLOCK_M, m)
    bn = _pick_bn(n)
    nm, nkp, nn = m // bm, kp // BLOCK_KP, n // bn
    sb = BLOCK_KP // GROUP
    sspec = pl.BlockSpec((sb, bn), lambda i, k, j: (k, j))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, nn=nn),
        grid=(nm, nkp, nn),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, k, j: (i, j)),
            pl.BlockSpec((BLOCK_KP, bn), lambda i, k, j: (k, j)),
            sspec, sspec,
        ],
        out_specs=[
            pl.BlockSpec((bm, BLOCK_KP), lambda i, k, j: (i, k)),
            pl.BlockSpec((bm, BLOCK_KP), lambda i, k, j: (i, k)),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, kp), x_dtype),
                   jax.ShapeDtypeStruct((m, kp), x_dtype)],
        scratch_shapes=[pltpu.VMEM((bm, BLOCK_KP), jnp.float32),
                        pltpu.VMEM((bm, BLOCK_KP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(g, q4, s_lo, s_hi)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def int4_matmul(x, q4, scale):
    """x [..., K] float; q4 [K/2, N] packed int4; scale [K/128, N] f32.
    Returns [..., N] in x.dtype. Requires supports(K, N)."""
    return _int4_matmul_fwd_impl(x, q4, scale)


def _int4_matmul_fwd_impl(x, q4, scale):
    *lead, k_in = x.shape
    n = q4.shape[-1]
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k_in)
    # half-split: contiguous K halves; sublane-align rows (multi-block row
    # dims must divide BLOCK_M)
    h = k_in // 2
    xe = _pad_to(x2[:, :h], 8, 0)
    xo = _pad_to(x2[:, h:], 8, 0)
    if xe.shape[0] > BLOCK_M:
        xe = _pad_to(xe, BLOCK_M, 0)
        xo = _pad_to(xo, BLOCK_M, 0)
    scale2d = scale.reshape(scale.shape[-2], scale.shape[-1])
    gh = scale2d.shape[0] // 2
    out = _fwd(xe.astype(jnp.bfloat16), xo.astype(jnp.bfloat16), q4,
               scale2d[:gh], scale2d[gh:], x.dtype)
    return out[:m].reshape(*lead, n)


def _int4_vjp_fwd(x, q4, scale):
    return _int4_matmul_fwd_impl(x, q4, scale), (q4, scale)


def _int4_vjp_bwd(res, g):
    q4, scale = res
    # x's shape/dtype reconstruct from the cotangent: leading dims match,
    # K = 2 × packed rows, dtype = primal output dtype = x dtype
    *lead, n = g.shape
    k_in = q4.shape[-2] * 2
    m = int(np.prod(lead)) if lead else 1
    g2 = g.reshape(m, n).astype(jnp.bfloat16)
    g2 = _pad_to(g2, 8, 0)
    if g2.shape[0] > BLOCK_M:
        g2 = _pad_to(g2, BLOCK_M, 0)
    scale2d = scale.reshape(scale.shape[-2], scale.shape[-1])
    gh = scale2d.shape[0] // 2
    dxe, dxo = _bwd(g2, q4, scale2d[:gh], scale2d[gh:], jnp.float32)
    dx = jnp.concatenate([dxe[:m], dxo[:m]], axis=-1)
    return (dx.reshape(*lead, k_in).astype(g.dtype),
            np.zeros(q4.shape, jax.dtypes.float0),
            jnp.zeros_like(scale))


int4_matmul.defvjp(_int4_vjp_fwd, _int4_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused W4A8-requant matmul: the regrid-to-int8 happens INSIDE the kernel,
# so the per-channel int8 weights (q8) never round-trip HBM. The XLA path
# (ops/quant.requant_int4_matmul) must materialize q8 for its int8
# dot_general — write K·N + re-read K·N on top of the K·N/2 q4 read, the
# measured on-the-fly requant tax (docs/PERF.md round 5 per-GEMM A/B). Here
# each q4 tile is unpacked + regridded in VMEM and fed straight to the int8
# MXU: HBM weight traffic drops to the K·N/2 q4 bytes (× the m-tile revisit
# factor — BLOCK_M is raised to make that ~1 at model sequence lengths).
# Bit-identical to the XLA path: same round/clip chain, same int32
# accumulation, same f32 output scaling.

RQ_BLOCK_M = int(_os.environ.get("QFLUX_RQ_BM", 1024))
RQ_BLOCK_N = int(_os.environ.get("QFLUX_RQ_BN", 512))
RQ_BLOCK_KP = int(_os.environ.get("QFLUX_RQ_BKP", 1536))


def _regrid_tile(q, f_lo, f_hi):
    """q [bkp, bn] int8 packed, f_* [bkp//128, bn] f32 → int8 planes on the
    per-channel grid (math identical to quant._requant_q8's regrid)."""
    qi = q.astype(jnp.int32)
    lo = jnp.left_shift(qi, 28) >> 28
    hi = jnp.left_shift(qi, 24) >> 28
    l8 = jnp.clip(jnp.round(lo.astype(jnp.float32)
                            * jnp.repeat(f_lo, GROUP, axis=0)),
                  -127, 127).astype(jnp.int8)
    h8 = jnp.clip(jnp.round(hi.astype(jnp.float32)
                            * jnp.repeat(f_hi, GROUP, axis=0)),
                  -127, 127).astype(jnp.int8)
    return l8, h8


def _rq_fwd_kernel(xe_ref, xo_ref, q_ref, flo_ref, fhi_ref, sx_ref, sv_ref,
                   o_ref, acc, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    l8, h8 = _regrid_tile(q_ref[...], flo_ref[...], fhi_ref[...])
    acc[:] += jax.lax.dot(xe_ref[...], l8, preferred_element_type=jnp.int32)
    acc[:] += jax.lax.dot(xo_ref[...], h8, preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc[:].astype(jnp.float32) * sx_ref[...] * sv_ref[...]
                      ).astype(o_ref.dtype)


def _rq_bwd_kernel(g_ref, q_ref, flo_ref, fhi_ref, dxe_ref, dxo_ref,
                   acc_e, acc_o, *, nn):
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _():
        acc_e[:] = jnp.zeros_like(acc_e)
        acc_o[:] = jnp.zeros_like(acc_o)

    l8, h8 = _regrid_tile(q_ref[...], flo_ref[...], fhi_ref[...])
    dn = (((1,), (1,)), ((), ()))
    acc_e[:] += jax.lax.dot_general(g_ref[...], l8, dn,
                                    preferred_element_type=jnp.int32)
    acc_o[:] += jax.lax.dot_general(g_ref[...], h8, dn,
                                    preferred_element_type=jnp.int32)

    @pl.when(n == nn - 1)
    def _():
        dxe_ref[...] = acc_e[...]
        dxo_ref[...] = acc_o[...]


def rq_supports(k_in: int, n_out: int, n_groups: int | None = None) -> bool:
    """Same layout contract as the bf16 fused kernel."""
    if n_groups is not None and n_groups * GROUP != k_in:
        return False
    return (k_in % (2 * RQ_BLOCK_KP) == 0 and RQ_BLOCK_KP % GROUP == 0
            and n_out % 128 == 0)


def _rq_pick_bn(n: int) -> int:
    for b in (RQ_BLOCK_N, 384, 256, 128):
        if n % b == 0:
            return b
    raise ValueError(f"N={n} not a multiple of 128")


def _rq_fwd(xe, xo, q4, f_lo, f_hi, sx, sv, out_dtype):
    m, kp = xe.shape
    n = q4.shape[1]
    bm = min(RQ_BLOCK_M, m)
    bn = _rq_pick_bn(n)
    nm, nn, nk = m // bm, n // bn, kp // RQ_BLOCK_KP
    sb = RQ_BLOCK_KP // GROUP
    fspec = pl.BlockSpec((sb, bn), lambda i, j, k: (k, j))
    return pl.pallas_call(
        functools.partial(_rq_fwd_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, RQ_BLOCK_KP), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, RQ_BLOCK_KP), lambda i, j, k: (i, k)),
            pl.BlockSpec((RQ_BLOCK_KP, bn), lambda i, j, k: (k, j)),
            fspec, fspec,
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(xe, xo, q4, f_lo, f_hi, sx, sv)


def _rq_bwd(g, q4, f_lo, f_hi):
    m, n = g.shape
    kp = q4.shape[0]
    bm = min(RQ_BLOCK_M, m)
    bn = _rq_pick_bn(n)
    nm, nkp, nn = m // bm, kp // RQ_BLOCK_KP, n // bn
    sb = RQ_BLOCK_KP // GROUP
    fspec = pl.BlockSpec((sb, bn), lambda i, k, j: (k, j))
    return pl.pallas_call(
        functools.partial(_rq_bwd_kernel, nn=nn),
        grid=(nm, nkp, nn),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, k, j: (i, j)),
            pl.BlockSpec((RQ_BLOCK_KP, bn), lambda i, k, j: (k, j)),
            fspec, fspec,
        ],
        out_specs=[
            pl.BlockSpec((bm, RQ_BLOCK_KP), lambda i, k, j: (i, k)),
            pl.BlockSpec((bm, RQ_BLOCK_KP), lambda i, k, j: (i, k)),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, kp), jnp.int32),
                   jax.ShapeDtypeStruct((m, kp), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((bm, RQ_BLOCK_KP), jnp.int32),
                        pltpu.VMEM((bm, RQ_BLOCK_KP), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(g, q4, f_lo, f_hi)
