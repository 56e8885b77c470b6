"""On-chip kernel A/B for the W4A8-requant unpack tax (VERDICT r4 #3).

The 20B Qwen flagship runs every dense op through ops/quant.requant_int4_matmul
(int4 weights re-gridded to per-channel int8 on the fly, one int8 MXU GEMM).
Round-4 step-level evidence says the on-the-fly requant costs real time
(flash+int4 1521.7 ms vs full+int8 1379.9 at 832x576; requant-flash 753.8 ms
vs 505.8 at 512d-class). This bench isolates WHERE the tax pays, per matmul,
at the 20B Qwen's dense shapes:

  w8a8        dyn_int8_matmul — the W8A8 counterpart (weights already int8)
  rq          requant_int4_matmul as shipped
  rq_pre      requant with q8 precomputed OUTSIDE the loop — the upper bound
              for any caching scheme (equals w8a8 + scale bookkeeping)
  rq_planes   candidate: no K-axis concat — the half-split lo/hi nibble
              planes each feed their own int8 GEMM (y = x_lo@q8_lo +
              x_hi@q8_hi), so the unpack+regrid chain stays elementwise per
              plane and can fuse into the GEMM operand load
  rq_bf16     candidate: regrid multiply in bf16 instead of f32 (halves the
              widest intermediate if XLA materializes it)

Run fwd-only and fwd+bwd (the trainer pays bwd every step; bwd re-derives q8).

Usage: python scripts/bench_int4_requant.py [M ...]   (default 1536 2560 4256)
Emits one line per (shape, variant): ms/call and TFLOPs-equiv (2MKN / t).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qflux_tpu.ops import quant as Q

N_ITER = 50

# 20B Qwen MMDiT dense shapes (models/qwen/transformer.py: dim=3072,
# mod proj 3072->18432, MLP 3072->12288 and 12288->3072, qkv 3072->3072)
KN_SHAPES = [(3072, 3072), (3072, 12288), (12288, 3072)]


def _planes_fwd_raw(x, q4, g_scale):
    """rq_planes: half-split lo/hi planes -> two fused int8 GEMMs, no concat."""
    f, s_vec = Q._requant_factors(g_scale)
    half_in, d_out = q4.shape[-2:]
    n_g = f.shape[-2]
    gsz = half_in * 2 // n_g
    lo = jnp.right_shift(jnp.left_shift(q4, 4), 4)
    hi = jnp.right_shift(q4, 4)
    gh = n_g // 2
    def regrid(plane, fpart):
        g = plane.reshape(gh, gsz, d_out).astype(jnp.float32)
        return jnp.clip(jnp.round(g * fpart[:, None, :]), -127, 127).astype(
            jnp.int8).reshape(half_in, d_out)
    q8_lo = regrid(lo, f[:gh])
    q8_hi = regrid(hi, f[gh:])
    xq, sx = Q._rowquant(x)
    xl, xh = xq[..., :half_in], xq[..., half_in:]
    dn = (((x.ndim - 1,), (0,)), ((), ()))
    acc = (jax.lax.dot_general(xl, q8_lo, dn, preferred_element_type=jnp.int32)
           + jax.lax.dot_general(xh, q8_hi, dn,
                                 preferred_element_type=jnp.int32))
    return (acc.astype(jnp.float32) * sx * s_vec).astype(x.dtype)


def _rq_old_fwd_raw(x, q4, g_scale):
    """rq_old: the pre-round-5 shipped form — unpack, concat to [K, N], THEN
    regrid. Materializes both the unpacked int8 q and the regridded q8 (one
    extra full-weight HBM round trip vs the plane-regrid form that replaced
    it in ops/quant._requant_q8)."""
    f, s_vec = Q._requant_factors(g_scale)
    q = Q.unpack_int4(q4)
    d_in, d_out = q.shape[-2:]
    n_g = f.shape[-2]
    g = q.reshape(n_g, d_in // n_g, d_out).astype(jnp.float32)
    q8 = jnp.clip(jnp.round(g * f[:, None, :]), -127, 127).astype(
        jnp.int8).reshape(d_in, d_out)
    xq, sx = Q._rowquant(x)
    acc = jax.lax.dot_general(xq, q8, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * s_vec).astype(x.dtype)


def _bf16_fwd_raw(x, q4, g_scale):
    """rq_bf16: the shipped path with the regrid multiply in bf16."""
    f, s_vec = Q._requant_factors(g_scale)
    q = Q.unpack_int4(q4)
    d_in, d_out = q.shape[-2:]
    n_g = f.shape[-2]
    g = q.reshape(n_g, d_in // n_g, d_out).astype(jnp.bfloat16)
    q8 = jnp.clip(jnp.round(g * f[:, None, :].astype(jnp.bfloat16)),
                  -127, 127).astype(jnp.int8).reshape(d_in, d_out)
    xq, sx = Q._rowquant(x)
    acc = jax.lax.dot_general(xq, q8, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * s_vec).astype(x.dtype)


def _loop_fwd(fn, *ws):
    @jax.jit
    def run(ts, x):
        def step(c, t):
            y = fn(c, *ws)
            # fold a scalar of y back into the carry so nothing is DCE'd
            return c + t * jnp.mean(y).astype(c.dtype), ()
        c, _ = jax.lax.scan(step, x, ts)
        return c
    return run


def _loop_grad(fn, *ws):
    loss = lambda x: jnp.sum(fn(x, *ws).astype(jnp.float32) ** 2)
    g = jax.grad(loss)

    @jax.jit
    def run(ts, x):
        def step(c, t):
            return c + t * g(c), ()
        c, _ = jax.lax.scan(step, x, ts)
        return c
    return run


def measure(run, x):
    ts = jnp.zeros((N_ITER,), x.dtype)
    _ = jax.block_until_ready(run(ts, x))
    t0 = time.perf_counter()
    _ = jax.block_until_ready(run(ts, x))
    return (time.perf_counter() - t0) / N_ITER


def main():
    # persistent compile cache: ~25 programs here, each 20-40 s cold through
    # the tunnel compile helper
    cache_dir = os.environ.get("QFLUX_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/qflux_tpu/xla"))
    if cache_dir and cache_dir != "0" and jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_dir, "tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    only = None
    args = []
    for a in sys.argv[1:]:
        if a.startswith("only="):
            only = a.split("=", 1)[1].split(",")
        else:
            args.append(a)
    ms = [int(a) for a in args] or [1536, 2560, 4256]
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} iters={N_ITER}")
    for k_in, n_out in KN_SHAPES:
        kw, kx = jax.random.split(jax.random.fold_in(key, k_in))
        w = jax.random.normal(kw, (k_in, n_out), jnp.float32)
        q4, g_scale = Q.quantize_kernel_int4(w)
        q8_pre, s_pre = jax.jit(
            lambda q4, gs: (Q._requant_q8(q4, Q._requant_factors(gs)[0]),
                            Q._requant_factors(gs)[1]))(q4, g_scale)
        qi8, s8 = Q.quantize_kernel(w, "int8")
        s8v = s8.reshape(-1)

        variants = {
            "w8a8": (Q.dyn_int8_matmul, (qi8, s8v)),
            "rq": (Q.requant_int4_matmul, (q4, g_scale)),
            "rq_old": (_rq_old_fwd_raw, (q4, g_scale)),
            "rq_pre": (Q.dyn_int8_matmul, (q8_pre, s_pre)),
            "rq_planes": (_planes_fwd_raw, (q4, g_scale)),
            "rq_bf16": (_bf16_fwd_raw, (q4, g_scale)),
            # round-5 candidate: Pallas kernel regrids q4->int8 in VMEM and
            # feeds the int8 MXU directly - q8 never round-trips HBM
            "rq_fused": (Q.rq_fused_matmul, (q4, g_scale)),
        }
        for m in ms:
            x = jax.random.normal(jax.random.fold_in(kx, m), (m, k_in),
                                  jnp.bfloat16)
            flops = 2 * m * k_in * n_out
            for name, (fn, ws) in variants.items():
                if only and name not in only:
                    continue
                tf = measure(_loop_fwd(fn, *ws), x)
                tg = measure(_loop_grad(fn, *ws), x)
                print(f"[{m:5d}x{k_in:5d}->{n_out:5d}] {name:10s} "
                      f"fwd {tf*1e3:7.3f} ms  fwd+bwd {tg*1e3:7.3f} ms  "
                      f"({flops/tf/1e12:5.1f} TF fwd)", flush=True)


if __name__ == "__main__":
    main()
