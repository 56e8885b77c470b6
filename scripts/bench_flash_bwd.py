"""On-chip microbench: flash attention forward vs backward kernels at the
headline bench shape (B=1, H=24, S=2560, D=128) — drives the round-3
backward-block auto-tune (VERDICT.md next-step #1).

The axon tunnel costs ~21 ms per dispatch and does not pipeline, so each
measurement runs its iterations ON DEVICE via lax.scan inside one jit —
one dispatch per timing, kernel time = total / n.  Every output leaf is
folded into the scan carry through a runtime-zero scalar so XLA can neither
constant-fold the perturbation nor DCE any kernel.

Usage: python scripts/bench_flash_bwd.py [S ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qflux_tpu.ops import flash_attention as fa

N = 50


def _cache():
    d = os.path.expanduser("~/.cache/qflux_tpu/xla")
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", os.path.join(d, "tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def device_loop(body):
    """jit(scan(body)) over N iters; body(args_tuple) -> pytree. Every leaf
    of the result is mixed into the first carry through a runtime scalar
    (zeros at runtime) so nothing is hoisted, folded, or DCE'd."""

    @jax.jit
    def run(ts, *args):
        def step(carry, t):
            out = body(carry)
            mix = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out))
            a0 = carry[0] + (t * mix).astype(carry[0].dtype)
            return (a0,) + carry[1:], ()
        carry, _ = jax.lax.scan(step, args, ts)
        return carry[0]

    return run


def measure(run, *args):
    ts = jnp.zeros((N,), jnp.float32)
    out = run(ts, *args)             # compile + warm
    _ = float(out.ravel()[0])
    t0 = time.perf_counter()
    out = run(ts, *args)
    _ = float(out.ravel()[0])        # tunnel: fetch forces completion
    return (time.perf_counter() - t0 - 0.021) / N


def main():
    _cache()
    seqs = [int(a) for a in sys.argv[1:]] or [2560]
    b, h, d = 1, 24, 128
    for s in seqs:
        kq, kk, kv, kd = jax.random.split(jax.random.PRNGKey(0), 4)
        q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
        do = jax.random.normal(kd, (b, s, h, d), jnp.bfloat16)
        seg = jnp.ones((b, s), jnp.int32)
        scale = 1.0 / d ** 0.5
        unit = 2 * b * h * s * s * d  # one S×S×D matmul

        def report(name, dt, units):
            fl = units * unit
            print(f"S={s} {name}: {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF "
                  f"({fl/dt/197e12*100:4.1f}% peak)", flush=True)

        dt_f = measure(device_loop(
            lambda a: fa.flash_attention(a[0], a[1], a[2], segment_ids=seg)), q, k, v)
        report("fwd          ", dt_f, 2)

        def vjp_body(a):
            g = jax.grad(lambda q_, k_, v_: (
                fa.flash_attention(q_, k_, v_, segment_ids=seg)
                .astype(jnp.float32) * a[3].astype(jnp.float32)).sum(),
                argnums=(0, 1, 2))
            return g(a[0], a[1], a[2])

        dt = measure(device_loop(vjp_body), q, k, v, do)
        report("vjp fwd+dq+dkv", dt, 9)

        out0, lse0 = jax.jit(lambda a, b_, c: fa.flash_fwd_with_lse(
            a, b_, c, seg, seg, scale))(q, k, v)

        def dq_body(a):
            return fa.flash_bwd_from_residuals(
                a[0], a[1], a[2], seg, seg, a[4], a[5], a[3], scale)[0]

        def dkv_body(a):
            return fa.flash_bwd_from_residuals(
                a[0], a[1], a[2], seg, seg, a[4], a[5], a[3], scale)[1:]

        def bwd_body(a):
            return fa.flash_bwd_from_residuals(
                a[0], a[1], a[2], seg, seg, a[4], a[5], a[3], scale)

        dt = measure(device_loop(dq_body), q, k, v, do, out0, lse0)
        report("dq only      ", dt, 3)
        dt = measure(device_loop(dkv_body), q, k, v, do, out0, lse0)
        report("dkv only     ", dt, 4)
        dt = measure(device_loop(bwd_body), q, k, v, do, out0, lse0)
        report("dq+dkv       ", dt, 7)


if __name__ == "__main__":
    main()
