"""Quantized-base LoRA training-quality comparison (VERDICT round-2 #2).

Trains the SAME rank-16 LoRA fit — same init, same data stream, same
optimizer — over three base numerics: bf16, W8A8-dynamic, W4A8-requant, and
prints the loss curves side by side.  The reference's headline runs bf16
(docs/changelog/v3.0.2.md:46-49); this is the evidence that the quantized
headline paths train to the same quality.

Usage:
  python scripts/quant_quality.py [width=bench|tiny] [steps=200] [grid=16]
         [txt=128] [lr=2e-4] [json=1]

On TPU, width=bench (3072-hidden, 4 dual + 8 single) matches the headline
bench's layer math; tiny runs anywhere (CI).  The result table is recorded
in docs/PERF.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(width: str = "bench", steps: int = 200, grid: int = 16,
        txt_len: int = 128, lr: float = 2e-4, record_every: int = 0,
        seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from qflux_tpu.config import QuantizeSection
    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.ops.quant import quantize_tree
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.trainer.train_step import (TrainState, TrainStepConfig,
                                              make_train_step)
    from __graft_entry__ import _flux_inputs

    if jax.default_backend() == "tpu":
        cache = os.path.expanduser("~/.cache/qflux_tpu/xla/tpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    cfg = {"bench": flux.FluxConfig.bench, "tiny": flux.FluxConfig.tiny,
           "full": flux.FluxConfig}[width]()
    record_every = record_every or max(steps // 10, 1)
    base = flux.init(jax.random.PRNGKey(seed), cfg, dtype=jnp.bfloat16)

    def q(dtype):
        return quantize_tree(base, QuantizeSection(
            enabled=True, dtype=dtype,
            skip_patterns=[r".*norm.*", r".*embed.*"]))

    variants = {"bf16": base,
                "w8a8_dynamic": q("int8_dynamic"),
                "w4a8_requant": q("int4_requant")}

    adapter = FluxKontextAdapter(cfg, attn_impl="auto", remat=True,
                                 remat_policy="flash"
                                 if jax.default_backend() == "tpu" else "dots")
    opt = optax.adamw(lr)
    step = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                           TrainStepConfig())
    batch = _flux_inputs(cfg, batch=1, grid_h=grid, grid_w=grid,
                         txt_len=txt_len, dtype=jnp.bfloat16)
    base_rng = jax.random.PRNGKey(seed + 1)

    curves: dict[str, list] = {}
    for name, params in variants.items():
        lora = build_lora_tree(
            jax.random.PRNGKey(seed + 2), base,
            [r"attn/(to_q|to_k|to_v|to_out|add_q|add_k|add_v|add_out)"],
            rank=16, alpha=16, dtype=jnp.bfloat16)
        state = TrainState.create(lora, opt)
        curve = []
        for i in range(steps):
            state, m = step(state, params, batch, jax.random.fold_in(base_rng, i))
            if i % record_every == 0 or i == steps - 1:
                curve.append((i, float(m["loss"])))
        curves[name] = curve
        print(f"{name:14s} " + "  ".join(f"{s}:{l:.4f}" for s, l in curve),
              flush=True)

    # tail loss = mean of the last three recorded points (noise smoothing)
    tails = {k: sum(l for _, l in v[-3:]) / 3 for k, v in curves.items()}
    rel = {k: tails[k] / tails["bf16"] - 1.0 for k in tails}
    out = {"width": width, "steps": steps, "grid": grid, "txt_len": txt_len,
           "lr": lr, "tail_loss": tails, "tail_vs_bf16": rel,
           "curves": curves}
    print("tail loss: " + "  ".join(f"{k}={v:.4f}" for k, v in tails.items()))
    print("vs bf16:   " + "  ".join(f"{k}={v:+.2%}" for k, v in rel.items()))
    return out


if __name__ == "__main__":
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    res = run(width=kv.get("width", "bench"), steps=int(kv.get("steps", 200)),
              grid=int(kv.get("grid", 16)), txt_len=int(kv.get("txt", 128)),
              lr=float(kv.get("lr", 2e-4)))
    if kv.get("json") == "1":
        print(json.dumps({k: v for k, v in res.items() if k != "curves"}))
