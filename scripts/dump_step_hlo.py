"""AOT-compile the headline train step and save the backend-optimized HLO.

The axon TPU compiles server-side, so --xla_dump_to never writes locally;
`compiled.as_text()` fetches the optimized module over the tunnel instead.

Usage: python scripts/dump_step_hlo.py [out=/tmp/step_hlo.txt] [quant=w8a8]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    out_path = kv.get("out", "/tmp/step_hlo.txt")

    import jax
    import jax.numpy as jnp
    import optax

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.trainer.train_step import (TrainState, TrainStepConfig,
                                              make_train_step)
    from __graft_entry__ import _flux_inputs
    from bench import _synthetic_int8_params, _w8a8_params

    cfg = flux.FluxConfig()
    params = _synthetic_int8_params(cfg)
    if kv.get("quant", "w8a8") == "w8a8":
        params = _w8a8_params(params)
    adapter = FluxKontextAdapter(cfg, attn_impl="auto", remat=True,
                                 remat_policy="flash")
    opt = optax.adamw(1e-4)
    step = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                           TrainStepConfig())
    lora = build_lora_tree(
        jax.random.PRNGKey(1), params,
        [r"attn/(to_q|to_k|to_v|to_out|add_q|add_k|add_v|add_out)"],
        rank=16, alpha=16, dtype=jnp.bfloat16)
    state = TrainState.create(lora, opt)
    batch = _flux_inputs(cfg, batch=1, grid_h=32, grid_w=32, txt_len=512,
                         dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    compiled = jax.jit(step).lower(state, params, batch, rng).compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB optimized HLO to {out_path}")


if __name__ == "__main__":
    main()
