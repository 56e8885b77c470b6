"""On-chip kernel verification (the verify-skill recipe, VERDICT round-2 #8).

Runs on the REAL TPU only (exits cleanly elsewhere). Checks, numerically
against the XLA reference implementation:

  1. flash attention fwd + custom-VJP grads at S ∈ {300, 2560, 4096}
     (4096 = the Mosaic backward boundary where block_k re-chunks);
  2. the ring-attention PALLAS HOP path (_hop_flash_fwd/_hop_flash_bwd) under
     a 1-device ("sp",) mesh — real Mosaic lowering of the hop kernels, which
     CPU tests only cover in interpret mode;
  3. the fused int4 matmul vs the XLA dequant path.

Prints one PASS/FAIL line per check; exit code 1 on any FAIL.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(a) + np.linalg.norm(b) + 1e-12)


def main() -> int:
    # production preamble: raise the scoped-VMEM limit before backend init so
    # the folded flash_nr layout (the entrypoint default) is what gets checked
    from qflux_tpu.runtime.tpu_env import configure_scoped_vmem
    configure_scoped_vmem()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("check_onchip: no TPU backend; skipping (this script verifies "
              "real Mosaic lowering)")
        return 0
    cache = os.path.expanduser("~/.cache/qflux_tpu/xla/tpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from qflux_tpu.ops.attention import sdpa_reference
    from qflux_tpu.ops.flash_attention import flash_attention

    failures = 0

    def check(name, err, tol):
        nonlocal failures
        ok = err < tol
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: rel_err={err:.2e} (tol {tol})",
              flush=True)

    b, h, d = 1, 4, 128
    for s in (300, 2560, 4096):
        ks = jax.random.split(jax.random.PRNGKey(s), 4)
        q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
        do = jax.random.normal(ks[3], (b, s, h, d), jnp.bfloat16)
        seg = (jnp.arange(s)[None, :] < s - 17).astype(jnp.int32)  # real padding

        def loss(fn):
            return lambda q_, k_, v_: (fn(q_, k_, v_, segment_ids=seg)
                                       .astype(jnp.float32)
                                       * do.astype(jnp.float32)).sum()

        out_f = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, segment_ids=seg))(q, k, v)
        out_r = jax.jit(lambda a, b_, c: sdpa_reference(a, b_, c, segment_ids=seg))(q, k, v)
        check(f"flash fwd S={s}", rel_err(out_f, out_r), 3e-3)
        g_f = jax.jit(jax.grad(loss(flash_attention), argnums=(0, 1, 2)))(q, k, v)
        g_r = jax.jit(jax.grad(loss(sdpa_reference), argnums=(0, 1, 2)))(q, k, v)
        for name, a, bb in zip(("dq", "dk", "dv"), g_f, g_r):
            check(f"flash {name} S={s}", rel_err(a, bb), 5e-3)

    # ring attention hop kernels under a REAL 1-device sp mesh (true Mosaic
    # lowering of _hop_flash_fwd/_hop_flash_bwd; CPU tests interpret them)
    from jax.sharding import Mesh

    from qflux_tpu.ops import ring_attention as ra
    from qflux_tpu.ops.ring_attention import ring_attention_sharded

    assert ra._use_kernel(), "hop kernels must engage on the tpu backend"
    s = 1024
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (b, s, h, d), jnp.bfloat16)
    seg = jnp.ones((b, s), jnp.int32)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("sp",))

    ring = lambda q_, k_, v_: ring_attention_sharded(q_, k_, v_, mesh, "sp",
                                                     segment_ids=seg)
    out_ring = jax.jit(ring)(q, k, v)
    out_ref = jax.jit(lambda a, b_, c: sdpa_reference(a, b_, c, segment_ids=seg))(q, k, v)
    check("ring hop fwd (1-dev sp mesh)", rel_err(out_ring, out_ref), 3e-3)

    gl = lambda fn: jax.jit(jax.grad(
        lambda q_, k_, v_: (fn(q_, k_, v_).astype(jnp.float32)
                            * do.astype(jnp.float32)).sum(), argnums=(0, 1, 2)))
    g_ring = gl(ring)(q, k, v)
    g_ref = gl(lambda a, b_, c: sdpa_reference(a, b_, c, segment_ids=seg))(q, k, v)
    for name, a, bb in zip(("dq", "dk", "dv"), g_ring, g_ref):
        check(f"ring hop {name}", rel_err(a, bb), 5e-3)

    # FAKED 2-HOP RING on one chip (VERDICT r3 #4): compose the exact hop
    # primitives — flash_fwd_with_lse per K/V chunk + logaddexp merge, then
    # flash_bwd_from_residuals per chunk against the GLOBAL lse — with
    # manually-rotated K/V halves, and compare to the monolithic kernel.
    # This exercises the global-lse backward merge through real Mosaic hops
    # (the integration a 1-device mesh never covers) without multi-chip HW.
    from qflux_tpu.ops.flash_attention import (flash_bwd_from_residuals,
                                               flash_fwd_with_lse)

    seg = (jnp.arange(s)[None, :] < s - 33).astype(jnp.int32)  # real padding
    half = s // 2
    chunks = [(k[:, :half], v[:, :half], seg[:, :half]),
              (k[:, half:], v[:, half:], seg[:, half:])]
    scale = 1.0 / (d ** 0.5)

    def two_hop_fwd(q_):
        lse_acc = jnp.full((b, h, s), -1e30, jnp.float32)
        acc = jnp.zeros((b, s, h, d), jnp.float32)
        for (kc, vc, sc) in chunks:
            o_hop, lse_hop = flash_fwd_with_lse(q_, kc, vc, seg, sc, scale)
            lse_new = jnp.logaddexp(lse_acc, lse_hop)
            w_old = jnp.exp(lse_acc - lse_new).transpose(0, 2, 1)[..., None]
            w_hop = jnp.exp(lse_hop - lse_new).transpose(0, 2, 1)[..., None]
            acc = acc * w_old + o_hop.astype(jnp.float32) * w_hop
            lse_acc = lse_new
        return acc.astype(q_.dtype), lse_acc

    out2, lse2 = jax.jit(two_hop_fwd)(q)
    mono = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, segment_ids=seg))
    check("2-hop ring fwd vs monolithic kernel", rel_err(out2, mono(q, k, v)), 3e-3)

    def two_hop_bwd(q_, out_, lse_, do_):
        dq = jnp.zeros(q_.shape, jnp.float32)
        dks, dvs = [], []
        for (kc, vc, sc) in chunks:
            dq_h, dk_h, dv_h = flash_bwd_from_residuals(
                q_, kc, vc, seg, sc, out_, lse_, do_, scale)
            dq = dq + dq_h.astype(jnp.float32)
            dks.append(dk_h)
            dvs.append(dv_h)
        return (dq.astype(q_.dtype), jnp.concatenate(dks, axis=1),
                jnp.concatenate(dvs, axis=1))

    dq2, dk2, dv2 = jax.jit(two_hop_bwd)(q, out2, lse2, do)
    g_mono = jax.jit(jax.grad(
        lambda q_, k_, v_: (flash_attention(q_, k_, v_, segment_ids=seg)
                            .astype(jnp.float32) * do.astype(jnp.float32)).sum(),
        argnums=(0, 1, 2)))(q, k, v)
    for name, a, bb in zip(("dq", "dk", "dv"), (dq2, dk2, dv2), g_mono):
        check(f"2-hop ring {name} (global-lse merge)", rel_err(a, bb), 5e-3)

    # fused qk-RMSNorm+RoPE flash kernels (ops/flash_nr.py) vs the XLA
    # composition — dual-stream scales (st=512), real padding, grads to
    # q/k/v AND both norm-scale pairs
    from qflux_tpu.ops import flash_nr

    s, st = 2560, 512
    assert flash_nr.supports(s, s, d), "headline shape must take the fused path"
    ks = jax.random.split(jax.random.PRNGKey(21), 8)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (b, s, h, d), jnp.bfloat16)
    qs2 = 1.0 + 0.1 * jax.random.normal(ks[4], (2, d), jnp.bfloat16)
    ks2 = 1.0 + 0.1 * jax.random.normal(ks[5], (2, d), jnp.bfloat16)
    ang = jax.random.uniform(ks[6], (s, d // 2), jnp.float32, 0, 6.28)
    cos = jnp.concatenate([jnp.cos(ang)] * 2, -1)
    sin = jnp.concatenate([jnp.sin(ang)] * 2, -1)
    seg = (jnp.arange(s)[None, :] < s - 64).astype(jnp.int32)

    def fused(q_, k_, v_, qs_, ks_):
        return flash_nr.flash_attention_nr(q_, k_, v_, qs_, ks_, cos, sin,
                                           st, segment_ids=seg)

    def xla(q_, k_, v_, qs_, ks_):
        qn = flash_nr.apply_qk_norm_rope(q_, qs_, cos, sin, st)
        kn = flash_nr.apply_qk_norm_rope(k_, ks_, cos, sin, st)
        return sdpa_reference(qn, kn, v_, segment_ids=seg)

    out_f = jax.jit(fused)(q, k, v, qs2, ks2)
    out_x = jax.jit(xla)(q, k, v, qs2, ks2)
    check("flash_nr fwd (st=512, padded)", rel_err(out_f, out_x), 3e-3)
    gl_nr = lambda fn: jax.jit(jax.grad(
        lambda *a: (fn(*a).astype(jnp.float32)
                    * do.astype(jnp.float32)).sum(), argnums=(0, 1, 2, 3, 4)))
    g_f = gl_nr(fused)(q, k, v, qs2, ks2)
    g_x = gl_nr(xla)(q, k, v, qs2, ks2)
    for name, a, bb in zip(("dq", "dk", "dv", "dqscale", "dkscale"), g_f, g_x):
        check(f"flash_nr {name}", rel_err(a, bb), 5e-3)

    # int8 score-GEMM variant (quantize.attention: true): bounded quant noise
    # on out AND grads vs the bf16 fused kernel
    f_i8 = jax.jit(lambda q_, k_, v_, qs_, ks_: flash_nr.flash_attention_nr(
        q_, k_, v_, qs_, ks_, cos, sin, st, segment_ids=seg, s_int8=True))
    check("flash_nr int8-s fwd", rel_err(f_i8(q, k, v, qs2, ks2), out_x),
          3e-2)
    gl_i8 = jax.jit(jax.grad(
        lambda *a: (f_i8(*a).astype(jnp.float32)
                    * do.astype(jnp.float32)).sum(), argnums=(0, 1, 2)))
    for name, a, bb in zip(("dq", "dk", "dv"), gl_i8(q, k, v, qs2, ks2),
                           g_x):
        check(f"flash_nr int8-s {name}", rel_err(a, bb), 5e-2)

    # fused int4 matmul vs XLA dequant
    from qflux_tpu.ops.int4_matmul import int4_matmul, supports
    from qflux_tpu.ops.quant import dequantize_kernel_int4, quantize_kernel_int4

    kk, n = 3072, 3072
    w = jax.random.normal(jax.random.PRNGKey(9), (kk, n), jnp.float32)
    q4, scale = quantize_kernel_int4(w, group_size=128)
    assert supports(kk, n, n_groups=scale.shape[-2])
    x = jax.random.normal(jax.random.PRNGKey(10), (256, kk), jnp.bfloat16)
    y_f = jax.jit(int4_matmul)(x, q4, scale)
    y_x = jax.jit(lambda x_, q_, s_: x_ @ dequantize_kernel_int4(q_, s_, x_.dtype))(
        x, q4, scale)
    check("fused int4 matmul", rel_err(y_f, y_x), 2e-2)

    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
