"""On-chip microbench: fused Pallas row-quantize prototype vs the XLA path
at the model's shapes.  VERDICT: the Pallas kernel measured SLOWER than
XLA's own fusions at every shape (e.g. 0.42 vs 0.18 ms at [2560,3072]) —
ops/quant._rowquant therefore stays on plain XLA ops; this script remains as
the probe that proves it (re-run before re-attempting a kernel here).

Usage: python scripts/bench_rowquant.py [M,K ...]   (default: headline shapes)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qflux_tpu.ops.quant import _rowquant as _rowquant_jnp  # XLA path

try:  # the Pallas prototype was removed from ops/quant.py (it lost) — keep
    from qflux_tpu.ops.quant import _rowquant  # type: ignore
except ImportError:
    _rowquant = _rowquant_jnp

N = 100


def loop(fn):
    @jax.jit
    def run(ts, x):
        def step(c, t):
            q, s = fn(c)
            return c + (t * (jnp.sum(s) + jnp.sum(q.astype(jnp.float32))
                             )).astype(c.dtype), ()
        c, _ = jax.lax.scan(step, x, ts)
        return c
    return run


def measure(fn, x):
    run = loop(fn)
    ts = jnp.zeros((N,), jnp.float32)
    out = run(ts, x)
    _ = float(out.ravel()[0])
    t0 = time.perf_counter()
    out = run(ts, x)
    _ = float(out.ravel()[0])
    return (time.perf_counter() - t0 - 0.021) / N


def main():
    shapes = [tuple(map(int, a.split(","))) for a in sys.argv[1:]] or [
        (2560, 3072), (2560, 12288), (2048, 12288), (512, 12288)]
    for m, k in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        dt_p = measure(_rowquant, x)       # pallas path on TPU
        dt_j = measure(_rowquant_jnp, x)
        bytes_ = m * k * 3  # bf16 read + int8 write
        print(f"[{m:5d},{k:5d}] pallas {dt_p*1e3:7.3f} ms  xla {dt_j*1e3:7.3f} ms"
              f"  ({bytes_/dt_p/1e9:5.0f} vs {bytes_/dt_j/1e9:5.0f} GB/s eff)",
              flush=True)
        q_p, s_p = jax.jit(_rowquant)(x)
        q_j, s_j = jax.jit(_rowquant_jnp)(x)
        import numpy as np
        assert np.array_equal(np.asarray(q_p), np.asarray(q_j)), "q mismatch"
        assert np.array_equal(np.asarray(s_p), np.asarray(s_j)), "s mismatch"
    print("bit-exact ok")


if __name__ == "__main__":
    main()
