"""Benchmark: LoRA flow-match train-step throughput on the FLUX-Kontext stack.

Workload mirrors the reference's headline number (FLUX-Kontext BF16 LoRA at
512² with cached embeddings — 1.7 FPS aggregate on 2×RTX4090 FSDP, reference
docs/changelog/v3.0.2.md:46-49, BASELINE.md): packed 32×32 target + 32×32
control + 512 text tokens, LoRA rank 16 on all attention projections,
bf16 weights, remat, one chip.

A single v5e/v5p chip cannot hold the full 12B bf16 base weights next to
activations, so we run the bench-width model (identical 3072-wide blocks,
4 dual + 8 single layers) and extrapolate per the analytic matmul-FLOPs ratio
— every block is the same shape, so the scaling is exact to first order.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 1.7  # reference aggregate FPS (2 GPUs); see BASELINE.md


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.trainer.train_step import TrainState, TrainStepConfig, make_train_step
    from __graft_entry__ import _flux_inputs

    on_tpu = jax.default_backend() == "tpu"
    cfg = flux.FluxConfig.bench() if on_tpu else flux.FluxConfig.tiny()
    full_cfg = flux.FluxConfig()

    batch_size = 2  # reference benchmarks use bs=2
    grid = 32 if on_tpu else 8
    txt_len = 512 if on_tpu else 32

    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    lora = build_lora_tree(
        jax.random.PRNGKey(1), params,
        [r"attn/(to_q|to_k|to_v|to_out|add_q|add_k|add_v|add_out)"],
        rank=16, alpha=16, dtype=jnp.bfloat16)
    adapter = FluxKontextAdapter(cfg, attn_impl="auto", remat=True,
                                 remat_policy="dots")
    opt = optax.adamw(1e-4)
    step = make_train_step(adapter.predict_velocity, MseLoss(), opt, TrainStepConfig())
    state = TrainState.create(lora, opt)
    batch = _flux_inputs(cfg, batch=batch_size, grid_h=grid, grid_w=grid,
                         txt_len=txt_len, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    # warmup/compile.  NOTE: on the axon TPU tunnel, block_until_ready does
    # NOT actually block — only a value fetch forces completion, so all
    # timing uses float() on the scalar loss (≈26 ms fixed fetch overhead,
    # amortized over the timed iterations).
    state, m = step(state, params, batch, rng)
    _ = float(m["loss"])

    n_iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, params, batch, rng)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n_iters

    s_img = grid * grid
    s_txt = txt_len
    # joint sequence includes the control tokens
    bench_flops = cfg.matmul_flops(2 * s_img, s_txt)
    full_flops = full_cfg.matmul_flops(2 * 32 * 32, 512)
    est_full_dt = dt * (full_flops / bench_flops)
    fps_bench = batch_size / dt
    fps_full_est = batch_size / est_full_dt

    # rough MFU: train ≈ fwd×2 (dx chain, no frozen dW) + fwd (remat) ≈ 3× fwd
    train_flops = 3.0 * bench_flops * batch_size
    peak = 197e12 if on_tpu else float("nan")  # v5e bf16 peak
    mfu = train_flops / dt / peak if on_tpu else float("nan")

    print(json.dumps({
        "metric": "flux_kontext_512_lora_train_fps_per_chip(full-model est)",
        "value": round(fps_full_est, 4),
        "unit": "img/s",
        "vs_baseline": round(fps_full_est / BASELINE_FPS, 4),
        "bench_model_fps": round(fps_bench, 4),
        "step_ms_bench_model": round(dt * 1e3, 2),
        "mfu_est": round(mfu, 4) if np.isfinite(mfu) else None,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
