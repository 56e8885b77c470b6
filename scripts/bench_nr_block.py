"""On-chip A/B: merged nr-backward block_q=128 (shipped) vs 256 under the
raised scoped-VMEM limit.

Round 3 sized NR_VMEM_BUDGET=13 MiB against the DEFAULT 16 MiB scoped-VMEM
limit ("scoped vmem 17.21M > 16.00M" inside the full model at bq=256,
ops/flash_nr.py:_nr_block_q).  Round 4 raised the limit to 48 MiB for the
folded layout (runtime/tpu_env.py) — which re-opens the bq=256 question:
standalone it measured ~3% faster fwd+bwd.  This script re-measures both
block sizes at the headline shape with the raised limit active, exactly the
environment the shipped program runs in.

Usage: python scripts/bench_nr_block.py [S ...]   (default 2560)

Measured (v5e, S=2560, round 5 — NR_VMEM_BUDGET rows are the knob that
moves BOTH kernels; the shipped code splits them via _nr_fwd_block_q):

    S=2560 bq=128 masked=0: fwd 0.980 ms  fwd+bwd 2.501 ms
    S=2560 bq=128 masked=1: fwd 2.142 ms  fwd+bwd 2.653 ms
    S=2560 bq=256 masked=0: fwd 0.890 ms  fwd+bwd 2.500 ms
    S=2560 bq=256 masked=1: fwd 1.086 ms  fwd+bwd 2.678 ms

fwd wants 256 (−9% unmasked, −49% masked standalone); the merged backward
wants 128 (bwd-only 1.52 vs 1.61 ms).  Shipped: fwd=256/bwd=128 when the
scoped-VMEM limit is raised — train step 675.5 → 671.3 ms (weight-only
variant), FLUX 20-step inference 3.18 → 3.07 s/img.  The standalone masked
fwd gap did NOT materialize in-model (multires masked overhead unchanged
at +1.7%).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qflux_tpu.runtime.tpu_env import configure_scoped_vmem

configure_scoped_vmem()

import jax
import jax.numpy as jnp

from qflux_tpu.ops import flash_nr

N = 50


def _cache():
    d = os.path.expanduser("~/.cache/qflux_tpu/xla")
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", os.path.join(d, "tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def device_loop(body):
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
    out = run(ts, *args)
    _ = float(out.ravel()[0])
    t0 = time.perf_counter()
    out = run(ts, *args)
    _ = float(out.ravel()[0])
    return (time.perf_counter() - t0 - 0.021) / N


def main():
    _cache()
    seqs = [int(a) for a in sys.argv[1:]] or [2560]
    b, h, d, st = 1, 24, 128, 512
    for s in seqs:
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
        unit = 2 * b * h * s * s * d

        for budget_mb in (13, 32):
            flash_nr.NR_VMEM_BUDGET = budget_mb * 1024 * 1024
            pk = flash_nr._auto_block(s, 1 << 30)
            bq = flash_nr._nr_block_q(pk, d)
            for masked in (False, True):
                sid = seg if masked else None

                def fused(a):
                    return flash_nr.flash_attention_nr(
                        a[0], a[1], a[2], a[3], a[4], cos, sin, st,
                        segment_ids=sid)

                def vjp(a):
                    g = jax.grad(lambda q_, k_, v_, qs_, ks_: (
                        flash_nr.flash_attention_nr(
                            q_, k_, v_, qs_, ks_, cos, sin, st,
                            segment_ids=sid).astype(jnp.float32)
                        * a[5].astype(jnp.float32)).sum(), argnums=(0, 1, 2, 3, 4))
                    return g(a[0], a[1], a[2], a[3], a[4])

                tag = f"S={s} bq={bq} masked={int(masked)}"
                try:
                    dt_f = measure(device_loop(fused), q, k, v, qs2, ks2)
                    dt_b = measure(device_loop(vjp), q, k, v, qs2, ks2, do)
                except Exception as e:  # compile failure at the bigger block
                    print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                    continue
                print(f"{tag}: fwd {dt_f*1e3:6.3f} ms ({2*unit/dt_f/197e12*100:4.1f}%)"
                      f"  fwd+bwd {dt_b*1e3:6.3f} ms "
                      f"({9*unit/dt_b/197e12*100:4.1f}% of 9 units)", flush=True)


if __name__ == "__main__":
    main()
