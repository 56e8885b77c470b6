"""Weight-only + dynamic-activation quantization for frozen base params.

TPU-native analogue of the reference's quantization layer (reference
models/quantize.py: transformer-engine fp8 Linear swap at :83-166, bnb
int8/NF4 at :169-273).  On TPU the useful form for LoRA training is
weight-only: frozen kernels stored int8 (or fp8) with per-output-channel
scales, dequantized at use — halving HBM traffic and resident memory for the
12B base while LoRA/bf16 activations stay full precision.

dense() in ops/layers.py consumes the {kernel_q, kernel_scale} form directly;
XLA fuses the dequant multiply into the matmul's operand load.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np


def quantize_kernel(kernel, dtype="int8"):
    """[…, in, out] float → ({…} int8/fp8 values, [..., 1, out] scales)."""
    k = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2, keepdims=True)  # per output channel
    if dtype == "int8":
        scale = amax / 127.0
        q = jnp.round(k / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
    elif dtype == "fp8_e4m3":
        scale = amax / 448.0
        q = (k / jnp.maximum(scale, 1e-12)).astype(jnp.float8_e4m3fn)
    elif dtype == "fp8_e5m2":
        scale = amax / 57344.0
        q = (k / jnp.maximum(scale, 1e-12)).astype(jnp.float8_e5m2)
    else:
        raise ValueError(f"unknown quant dtype {dtype!r}")
    return q, scale


def quantize_kernel_int4(kernel, group_size: int = 128):
    """[…, in, out] float → (packed […, in/2, out] int8, […, in/G, out] f32).

    The scale carries NO singleton group axis: a […, in/G, 1, out] form pads
    its sublane dim 1→8 in HBM (8× on the stored tensor — 42 MB over budget
    on the 20B Qwen; the observed round-2 OOM).

    TPU-native analogue of the reference's NF4/fp4 bases (reference
    models/quantize.py:169-273, load-bearing for fitting the 20B Qwen DiT):
    symmetric int4 with per-(group, out-channel) scales, HALF-SPLIT packed —
    byte row i holds original row i (low nibble) and row i+in/2 (high).
    Half-split means unpack is two contiguous nibble planes (no sublane
    interleave), which XLA fuses into the GEMM ~28% faster than the
    row-pair layout (docs/PERF.md round-2 int4 table)."""
    k = jnp.asarray(kernel, jnp.float32)
    *lead, d_in, d_out = k.shape
    g = min(group_size, d_in)
    if d_in % g or d_in % 2:
        raise ValueError(f"in_dim {d_in} must divide group_size {g} and be even")
    grouped = k.reshape(*lead, d_in // g, g, d_out)
    amax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)   # [..., in/G, 1, out]
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(grouped / scale), -8, 7).astype(jnp.int8)
    q = q.reshape(*lead, d_in, d_out)
    lo, hi = q[..., : d_in // 2, :], q[..., d_in // 2 :, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return packed, scale[..., 0, :].astype(jnp.float32)


def unpack_int4(packed):
    """[…, in/2, out] packed → […, in, out] int8 values in [-8, 7]
    (half-split layout: low nibbles are rows [0, in/2), high the rest)."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # sign-extended low nibble
    hi = jnp.right_shift(packed, 4)                     # arithmetic → signed high
    return jnp.concatenate([lo, hi], axis=-2)


def dequantize_kernel_int4(packed, scale, dtype=jnp.bfloat16):
    """Inverse of quantize_kernel_int4; XLA fuses this into the matmul's
    operand load (shift/and/mul are elementwise on the weight tile)."""
    *lead, half_in, d_out = packed.shape
    d_in = half_in * 2
    n_groups = scale.shape[-2]
    q = unpack_int4(packed)
    grouped = q.reshape(*lead, n_groups, d_in // n_groups, d_out).astype(jnp.float32)
    return (grouped * scale[..., :, None, :]).reshape(*lead, d_in, d_out).astype(dtype)


def dequantize_kernel(q, scale, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# weight-only matmul with a custom VJP. Without it, AD differentiates through
# the inline dequant, so dx = g @ dequant(q, scale)ᵀ makes XLA fuse a
# TRANSPOSED per-channel-scaled dequant into every dx GEMM — measured as the
# compile hog of the weight-only variant (522 s vs 19 s for the W8A8 program,
# BENCH r3). Folding the per-output-channel scale into the cotangent first
# (it is constant along the contracted axis) leaves a plain cast-GEMM.

def _wo_fwd_raw(x, q, w_scale_vec):
    kernel = (q.astype(jnp.float32) * w_scale_vec.astype(jnp.float32)).astype(x.dtype)
    return jnp.dot(x, kernel, preferred_element_type=jnp.float32)


@jax.custom_vjp
def wo_matmul(x, q, w_scale_vec):
    """y = x @ (q·s): weight-only dequant GEMM (int8 or fp8 q).
    x: [..., K] float; q: [K, N]; w_scale_vec: [N] per-output-channel scales.
    Frozen weights: no dW; dx = (g·s) @ qᵀ (scale folded into the cotangent)."""
    return _wo_fwd_raw(x, q, w_scale_vec)


def _wo_vjp_fwd(x, q, w_scale_vec):
    # zero-length carrier: residuals must be JAX types, so the activation
    # dtype rides along as an empty array of that dtype
    return (_wo_fwd_raw(x, q, w_scale_vec),
            (q, w_scale_vec, jnp.zeros((0,), x.dtype)))


def _wo_vjp_bwd(res, g):
    q, w_scale_vec, x_proto = res
    x_dtype = x_proto.dtype
    # scale the cotangent in f32, then run the dx GEMM in the activation dtype
    # (bf16 on the MXU); dx MUST come back as x.dtype — a f32 cotangent for a
    # bf16 primal breaks upstream transpose rules (lax.mul dtype mismatch)
    gs = (g.astype(jnp.float32)
          * w_scale_vec.astype(jnp.float32)).astype(x_dtype)
    dx = jax.lax.dot_general(gs, q.astype(x_dtype),
                             (((gs.ndim - 1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    q_ct = (np.zeros(q.shape, jax.dtypes.float0)
            if jnp.issubdtype(q.dtype, jnp.integer) else jnp.zeros_like(q))
    return dx.astype(x_dtype), q_ct, jnp.zeros_like(w_scale_vec)


wo_matmul.defvjp(_wo_vjp_fwd, _wo_vjp_bwd)


# ---------------------------------------------------------------------------
# W8A8-dynamic: int8×int8 on the MXU (v5e: 394 int8 TOPS vs 197 bf16 TFLOPs)

def _rowquant(x):
    """Dynamic symmetric per-row int8 quantization of the LAST axis.

    Stays on plain XLA ops ON PURPOSE: a fused Pallas amax+round kernel was
    measured SLOWER than XLA's own fusions at every model shape
    (scripts/bench_rowquant.py, docs/PERF.md round 3) — the lane-dim max
    reduce is already near its practical roofline here."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-12)
    return jnp.round(xf / s).astype(jnp.int8), s


def _dyn_fwd_raw(x, q, w_scale_vec):
    xq, sx = _rowquant(x)
    acc = jax.lax.dot_general(xq, q, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * w_scale_vec.astype(jnp.float32)
    return y.astype(x.dtype)


@jax.custom_vjp
def dyn_int8_matmul(x, q, w_scale_vec):
    """y = x @ (q·s) computed as int8×int8→int32 on the MXU with dynamic
    per-row activation scales (microbench: 1.31× a bf16 GEMM including the
    quantize+rescale, docs/PERF.md).  x: [..., K] float; q: [K, N] int8;
    w_scale_vec: [N] per-output-channel weight scales.

    Gradient is straight-through: dx = (g·s_w) @ qᵀ, itself run int8-dynamic
    (the weight is frozen — no dW; LoRA grads flow through the bf16 branch)."""
    return _dyn_fwd_raw(x, q, w_scale_vec)


def _dyn_vjp_fwd(x, q, w_scale_vec):
    return _dyn_fwd_raw(x, q, w_scale_vec), (q, w_scale_vec)


def _dyn_vjp_bwd(res, g):
    q, w_scale_vec = res
    gs = g.astype(jnp.float32) * w_scale_vec.astype(jnp.float32)
    gq, sg = _rowquant(gs)
    dxa = jax.lax.dot_general(gq, q, (((gs.ndim - 1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    dx = (dxa.astype(jnp.float32) * sg).astype(g.dtype)
    # frozen int8 weights: integer primals take float0 cotangents
    return (dx,
            np.zeros(q.shape, jax.dtypes.float0),
            jnp.zeros_like(w_scale_vec))


dyn_int8_matmul.defvjp(_dyn_vjp_fwd, _dyn_vjp_bwd)


# ---------------------------------------------------------------------------
# W4A8-dynamic: grouped-int4 weights × dynamic-int8 activations. The int4
# nibbles unpack to int8 (values in [-8, 7]) and each scale group becomes one
# int8×int8 MXU matmul of K=group_size, rescaled by (activation row scale ×
# group weight scale) and summed — no bf16 dequantized kernel ever exists.

def _dyn4_fwd_raw(x, q4, g_scale):
    *lead, half_in, d_out = q4.shape
    d_in = half_in * 2
    n_g = g_scale.shape[-2]
    gsz = d_in // n_g
    q = unpack_int4(q4).reshape(*lead, n_g, gsz, d_out)  # int8
    xq, sx = _rowquant(x)                                   # [..., d_in] int8
    xg = xq.reshape(*x.shape[:-1], n_g, gsz)
    # per-group int8 GEMMs: contract gsz, batch n_g → [..., n_g, d_out]
    acc = jnp.einsum("...gk,gko->...go", xg, q,
                     preferred_element_type=jnp.int32)
    y = jnp.sum(acc.astype(jnp.float32) * g_scale, axis=-2)
    return (y * sx).astype(x.dtype)


@jax.custom_vjp
def dyn_int4_matmul(x, q4, g_scale):
    """x [..., K] float; q4 [K/2, N] packed int4; g_scale [K/G, N].
    Straight-through VJP like dyn_int8_matmul (dx also int8×int8)."""
    return _dyn4_fwd_raw(x, q4, g_scale)


def _dyn4_vjp_fwd(x, q4, g_scale):
    return _dyn4_fwd_raw(x, q4, g_scale), (q4, g_scale)


def _dyn4_vjp_bwd(res, g):
    q4, g_scale = res
    half_in, d_out = q4.shape[-2:]
    d_in = half_in * 2
    n_g = g_scale.shape[-2]
    gsz = d_in // n_g
    q = unpack_int4(q4).reshape(*q4.shape[:-2], n_g, gsz, d_out)
    # dx[..., (g,k)] = Σ_o g[..., o] · w_scale[g, o] · q[g, k, o]: fold the
    # per-(group, out) weight scale into g BEFORE quantizing (it varies over
    # the contracted dim, so it cannot be applied after the int matmul)
    gsw = g.astype(jnp.float32)[..., None, :] * g_scale  # [..., n_g, d_out]
    amax = jnp.max(jnp.abs(gsw), axis=-1, keepdims=True)
    s_r = jnp.maximum(amax / 127.0, 1e-12)                  # [..., n_g, 1]
    gq2 = jnp.round(gsw / s_r).astype(jnp.int8)
    dxa = jnp.einsum("...go,gko->...gk", gq2, q,
                     preferred_element_type=jnp.int32)
    dx = (dxa.astype(jnp.float32) * s_r).reshape(*g.shape[:-1], d_in)
    return (dx.astype(g.dtype),
            np.zeros(q4.shape, jax.dtypes.float0),
            jnp.zeros_like(g_scale))


dyn_int4_matmul.defvjp(_dyn4_vjp_fwd, _dyn4_vjp_bwd)


# ---------------------------------------------------------------------------
# W4A8-requant: grouped-int4 weights re-quantized on the fly onto a
# per-output-channel int8 grid, then ONE int8×int8 MXU GEMM. Each group's
# values map as q8 = round(q4 · s_g/S_n · 127/7) with S_n = max_g s_g — group
# structure survives on the 18×-finer int8 grid (extra error ≤ S_n/254 per
# weight vs the group grid's s_g/2), and the whole contraction rides the
# 394-TOPS int8 path instead of per-group K=128 GEMMs (dyn_int4_matmul) or a
# bf16 dequant GEMM. Measured 121 vs 77 TFLOPs-equiv at the 20B Qwen's
# shapes (docs/PERF.md). Reference role: the fp4 compute rows of
# models/quantize.py:169-273.

def _requant_factors(g_scale):
    """g_scale [..., K/G, N] → (f [..., K/G, N], s_vec [..., N])."""
    S = jnp.maximum(jnp.max(g_scale, axis=-2, keepdims=True), 1e-30)
    f = (g_scale / S) * (127.0 / 7.0)
    s_vec = (S[..., 0, :] * (7.0 / 127.0)).astype(jnp.float32)
    return f.astype(jnp.float32), s_vec


def _requant_q8(q4, f):
    """Unpack half-split int4 and re-quantize to the per-channel int8 grid.

    Structured as regrid-per-nibble-plane THEN one concat (not
    unpack-concat-then-regrid): each plane's shift→mul→round→clip chain is
    pure elementwise+broadcast on [K/2, N], so XLA fuses it into the concat's
    write and the program materializes q8 ONCE. The concat-first form
    materialized the unpacked int8 q [K, N] AND q8 — one extra full-weight
    HBM round trip per GEMM, ~half the measured on-the-fly requant tax at the
    20B Qwen's shapes (scripts/bench_int4_requant.py, docs/PERF.md round 5).
    Values are bit-identical: low plane rows [0, K/2) are groups [0, n_g/2).
    """
    *lead, half_in, d_out = q4.shape
    n_g = f.shape[-2]
    if n_g % 2:
        # a scale group straddles the K/2 plane boundary (n_g odd — only at
        # tiny widths where group_size ≥ d_in): concat-first reference form
        q = unpack_int4(q4)
        g = q.reshape(*lead, n_g, 2 * half_in // n_g, d_out).astype(jnp.float32)
        return jnp.clip(jnp.round(g * f[..., :, None, :]), -127, 127).astype(
            jnp.int8).reshape(*lead, 2 * half_in, d_out)
    gh = n_g // 2
    gsz = half_in // gh
    lo = jnp.right_shift(jnp.left_shift(q4, 4), 4)  # sign-extended low nibble
    hi = jnp.right_shift(q4, 4)                     # arithmetic → signed high

    def regrid(plane, fpart):
        g = plane.reshape(*lead, gh, gsz, d_out).astype(jnp.float32)
        # clip before the cast: the packed format admits -8
        # (quantize_kernel_int4 never emits it, but external int4 trees may),
        # and round(-8·127/7) = -145 would wrap on astype(int8)
        return jnp.clip(jnp.round(g * fpart[..., :, None, :]), -127, 127
                        ).astype(jnp.int8).reshape(*lead, half_in, d_out)

    return jnp.concatenate([regrid(lo, f[..., :gh, :]),
                            regrid(hi, f[..., gh:, :])], axis=-2)


def _rq4_fwd_raw(x, q4, g_scale):
    f, s_vec = _requant_factors(g_scale)
    q8 = _requant_q8(q4, f)
    xq, sx = _rowquant(x)
    acc = jax.lax.dot_general(xq, q8, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * s_vec).astype(x.dtype)


@jax.custom_vjp
def requant_int4_matmul(x, q4, g_scale):
    """x [..., K] float; q4 [K/2, N] half-split packed int4;
    g_scale [K/G, N]. Straight-through VJP: dx re-uses the same int8
    requantized weights (recomputed — elementwise, never materialized in HBM
    across the step)."""
    return _rq4_fwd_raw(x, q4, g_scale)


def _rq4_vjp_fwd(x, q4, g_scale):
    return _rq4_fwd_raw(x, q4, g_scale), (q4, g_scale)


def _rq4_vjp_bwd(res, g):
    q4, g_scale = res
    f, s_vec = _requant_factors(g_scale)
    q8 = _requant_q8(q4, f)
    gs = g.astype(jnp.float32) * s_vec
    gq, sg = _rowquant(gs)
    dxa = jax.lax.dot_general(gq, q8, (((gs.ndim - 1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    dx = (dxa.astype(jnp.float32) * sg).astype(g.dtype)
    return (dx,
            np.zeros(q4.shape, jax.dtypes.float0),
            jnp.zeros_like(g_scale))


requant_int4_matmul.defvjp(_rq4_vjp_fwd, _rq4_vjp_bwd)


# --- fused-kernel W4A8 requant (q8 regridded in VMEM, never in HBM) --------

def _rq_fused_prep(v, q4, g_scale):
    """Row-quantize + split halves + pad rows for the Pallas grid."""
    from qflux_tpu.ops import int4_matmul as i4

    f, s_vec = _requant_factors(g_scale)
    gh = f.shape[-2] // 2
    *lead, k_in = v.shape
    m = int(np.prod(lead)) if lead else 1
    vq, sx = _rowquant(v.reshape(m, k_in))
    h = k_in // 2
    xe, xo = vq[:, :h], vq[:, h:]
    pad_rows = i4.RQ_BLOCK_M if m > i4.RQ_BLOCK_M else 8
    xe = i4._pad_to(xe, pad_rows, 0)
    xo = i4._pad_to(xo, pad_rows, 0)
    sxp = i4._pad_to(sx, pad_rows, 0)
    return (xe, xo, f[..., :gh, :], f[..., gh:, :], sxp,
            s_vec.reshape(1, -1), m, lead)


def _rq_fused_fwd_raw(x, q4, g_scale):
    from qflux_tpu.ops import int4_matmul as i4

    xe, xo, f_lo, f_hi, sx, sv, m, lead = _rq_fused_prep(x, q4, g_scale)
    out = i4._rq_fwd(xe, xo, q4, f_lo, f_hi, sx, sv, x.dtype)
    return out[:m].reshape(*lead, q4.shape[-1])


@jax.custom_vjp
def rq_fused_matmul(x, q4, g_scale):
    """Fused-kernel variant of requant_int4_matmul (same math, same
    straight-through VJP; q8 lives only in VMEM). Gate on
    int4_matmul.rq_supports(K, N, g_scale.shape[-2]); opt in via
    QFLUX_FUSED_RQ=1 (ops/layers.dense)."""
    return _rq_fused_fwd_raw(x, q4, g_scale)


def _rqf_vjp_fwd(x, q4, g_scale):
    return _rq_fused_fwd_raw(x, q4, g_scale), (q4, g_scale)


def _rqf_vjp_bwd(res, g):
    from qflux_tpu.ops import int4_matmul as i4

    q4, g_scale = res
    f, s_vec = _requant_factors(g_scale)
    gh = f.shape[-2] // 2
    *lead, n = g.shape
    m = int(np.prod(lead)) if lead else 1
    gs = g.reshape(m, n).astype(jnp.float32) * s_vec
    gq, sg = _rowquant(gs)
    pad_rows = i4.RQ_BLOCK_M if m > i4.RQ_BLOCK_M else 8
    gq = i4._pad_to(gq, pad_rows, 0)
    dxe, dxo = i4._rq_bwd(gq, q4, f[..., :gh, :], f[..., gh:, :])
    dx = jnp.concatenate([dxe[:m], dxo[:m]], axis=-1).astype(jnp.float32) * sg
    k_in = q4.shape[-2] * 2
    return (dx.reshape(*lead, k_in).astype(g.dtype),
            np.zeros(q4.shape, jax.dtypes.float0),
            jnp.zeros_like(g_scale))


rq_fused_matmul.defvjp(_rqf_vjp_fwd, _rqf_vjp_bwd)


def quantize_tree(params, qcfg) -> dict:
    """Replace every matching dense kernel with {kernel_q, kernel_scale}.

    qcfg: config.QuantizeSection (dtype + skip_patterns).  Biases, norms and
    embeddings stay full precision (mirrors bnb's skip of non-Linear modules).
    """
    skip = [re.compile(p) for p in qcfg.skip_patterns]

    group_size = getattr(qcfg, "group_size", 128)

    def rec(node, path):
        if isinstance(node, dict):
            if "kernel" in node and not isinstance(node["kernel"], dict):
                path_str = "/".join(path)
                if any(p.search(path_str) for p in skip) or node["kernel"].ndim < 2:
                    return node
                out = {k: v for k, v in node.items() if k != "kernel"}
                if qcfg.dtype == "int4":
                    k = node["kernel"]
                    if k.shape[-2] % 2 or k.shape[-2] % min(group_size, k.shape[-2]):
                        return node  # odd/ragged in-dim: keep full precision
                    q, scale = quantize_kernel_int4(k, group_size)
                    out["kernel_q4"] = q
                elif qcfg.dtype in ("int4_dynamic", "int4_requant"):
                    k = node["kernel"]
                    if k.shape[-2] % 2 or k.shape[-2] % min(group_size, k.shape[-2]):
                        return node
                    q, scale = quantize_kernel_int4(k, group_size)
                    out["kernel_q4_dyn" if qcfg.dtype == "int4_dynamic"
                        else "kernel_q4_rq"] = q
                elif qcfg.dtype == "int8_dynamic":
                    q, scale = quantize_kernel(node["kernel"], "int8")
                    out["kernel_q_dyn"] = q
                else:
                    q, scale = quantize_kernel(node["kernel"], qcfg.dtype)
                    out["kernel_q"] = q
                out["kernel_scale"] = scale
                return out
            return {k: rec(v, path + (str(k),)) for k, v in node.items()}
        return node

    return rec(params, ())
