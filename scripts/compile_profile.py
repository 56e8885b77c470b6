"""Compile-time breakdown for the headline train step (VERDICT round-2 #6).

The round-2 bench recorded 260 s cold compile (vs 30.9 s in round 1) without
saying where it went. This script separates the pipeline stages:

  trace+lower  — jax tracing to jaxpr + StableHLO lowering (host Python/C++)
  compile      — backend compile (on the axon tunnel: HTTP to the remote
                 tpu_compile_helper, which runs XLA AOT + Mosaic)

and reports jaxpr/HLO sizes, per remat policy. Run with a cold cache
(QFLUX_COMPILE_CACHE=0) to measure true compile cost.

Usage: python scripts/compile_profile.py [policy=flash] [width=full] [quant=w8a8]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    policy = kv.get("policy", "flash")
    width = kv.get("width", "full")
    quant = kv.get("quant", "w8a8")

    import jax
    import jax.numpy as jnp
    import optax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("QFLUX_COMPILE_CACHE", "0")
    if cache not in ("", "0") and jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.trainer.train_step import (TrainState, TrainStepConfig,
                                              make_train_step)
    from __graft_entry__ import _flux_inputs
    from bench import _synthetic_int8_params, _w8a8_params

    on_tpu = jax.default_backend() == "tpu"
    abstract = kv.get("abstract") == "1"
    cfg = {"full": flux.FluxConfig, "bench": flux.FluxConfig.bench,
           "tiny": flux.FluxConfig.tiny}[width]()
    if width == "full" and (on_tpu or abstract):
        def _params():
            p = _synthetic_int8_params(cfg)
            return _w8a8_params(p) if quant == "w8a8" else p
        # abstract mode never materializes the 12 GB tree
        params = jax.eval_shape(_params) if abstract else _params()
        grid, txt_len = 32, 512
    else:
        params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        grid, txt_len = 8, 32

    adapter = FluxKontextAdapter(cfg, attn_impl="auto", remat=True,
                                 remat_policy=policy if (on_tpu or abstract)
                                 else "dots")
    opt = optax.adamw(1e-4)
    step = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                           TrainStepConfig())
    batch = _flux_inputs(cfg, batch=1, grid_h=grid, grid_w=grid,
                         txt_len=txt_len, dtype=jnp.bfloat16)
    lora = build_lora_tree(jax.random.PRNGKey(1), params,
                           [r"attn/(to_q|to_k|to_v|to_out|add_q|add_k|add_v|add_out)"],
                           rank=16, alpha=16, dtype=jnp.bfloat16)
    state = TrainState.create(lora, opt)
    rng = jax.random.PRNGKey(0)

    if abstract:
        # trace+lower only, from ShapeDtypeStructs — measures the HOST side
        # (tracing + StableHLO emission) without allocating the 12 GB tree
        # or paying the backend compile; runs anywhere
        sds = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            (state, params, batch, rng))
        t0 = time.perf_counter()
        lowered = jax.jit(step).lower(*sds)
        t_lower = time.perf_counter() - t0
        hlo_bytes = len(lowered.as_text("stablehlo"))
        print(f"policy={policy} width={width} quant={quant} ABSTRACT")
        print(f"trace+lower: {t_lower:8.1f} s   stablehlo: {hlo_bytes/1e6:.1f} MB")
        return

    t0 = time.perf_counter()
    lowered = jax.jit(step).lower(state, params, batch, rng)
    t_lower = time.perf_counter() - t0
    hlo_bytes = len(lowered.as_text("stablehlo"))

    # optional XLA compiler options (ride the per-program compile request, so
    # they reach the remote compile helper unlike env XLA_FLAGS), e.g.
    #   copts=xla_tpu_exec_time_optimization_effort:-1.0,xla_memory_fitting_effort:0.0
    copts = {}
    for pair in filter(None, kv.get("copts", "").split(",")):
        ck, cv = pair.split(":", 1)
        for cast in (int, float):
            try:
                cv = cast(cv)
                break
            except ValueError:
                continue
        copts[ck] = cv
    t0 = time.perf_counter()
    compiled = lowered.compile(compiler_options=copts or None)
    t_compile = time.perf_counter() - t0

    mem = compiled.memory_analysis()
    print(f"policy={policy} width={width} quant={quant} backend={jax.default_backend()}")
    print(f"trace+lower: {t_lower:8.1f} s   stablehlo: {hlo_bytes/1e6:.1f} MB")
    print(f"compile:     {t_compile:8.1f} s")
    if mem is not None:
        print(f"argument+output+temp memory: "
              f"{(mem.argument_size_in_bytes + mem.output_size_in_bytes + mem.temp_size_in_bytes)/2**30:.2f} GiB "
            f"(temp {mem.temp_size_in_bytes/2**30:.2f} GiB)")


if __name__ == "__main__":
    main()
