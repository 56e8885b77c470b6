"""Mesh memory planner: answer "does this model fit at this mesh?" offline.

The reference answers fit questions by trial OOM on real GPUs (its README
FSDP/DDP memory tables are measured, reference README.md:361-364,617-632).
The TPU-native answer comes from XLA itself: AOT-lower the jitted LoRA
train step with sharded `ShapeDtypeStruct`s — no arrays are materialized —
compile it, and read per-device argument/temp/peak bytes out of
`compiled.memory_analysis()`, plus the collectives GSPMD inserted (the
all-gather/reduce-scatter structure IS the FSDP/TP communication plan).

Runs on any backend with enough devices — typically the n-device virtual
CPU platform (`XLA_FLAGS=--xla_force_host_platform_device_count=n`).
CPU buffer layouts pad slightly differently from TPU HBM tiles, so treat
byte totals as estimates (±few %); the sharding arithmetic and collective
structure are exactly what the TPU build would get.

CLI wrapper: `scripts/mesh_report.py` (self-contained re-exec, table
output over several candidate meshes).
"""

from __future__ import annotations

import re
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# joint-sequence length past which the planner (and Trainer.fit) advise
# sequence parallelism (mesh.sp + ring attention)
SP_ADVICE_SEQ = 16384

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def _widthed(config_cls, width: str):
    if width == "tiny":
        return config_cls.tiny()
    if width == "bench":
        return config_cls.bench()
    if width == "full":
        return config_cls()
    raise ValueError(f"width must be tiny|bench|full, got {width!r}")


def _with_shardings(shapes: Any, shardings: Any) -> Any:
    return jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes, shardings)


def _replicated(shapes: Any, mesh) -> Any:
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep), shapes)


def _batch_sharded(shapes: Any, mesh, batch_size: int) -> Any:
    """Batch leaves shard over (dp, fsdp); shared tables replicate. Leaves
    are classified by KEY NAME (the trainer's SHARED_BATCH_KEY_PREFIXES rule,
    trainer/base.py:_device_batch) — not by leading-dim equality, so the
    planner places e.g. a RoPE table whose first dim happens to equal the
    batch size exactly like the real fit loop would."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qflux_tpu.trainer.train_step import SHARED_BATCH_KEY_PREFIXES

    bsh = NamedSharding(mesh, P(("dp", "fsdp")))
    rep = NamedSharding(mesh, P())

    def place(path, s):
        key = str(getattr(path[0], "key", "")) if path else ""
        shared = key.startswith(SHARED_BATCH_KEY_PREFIXES)
        sh = bsh if (not shared and s.ndim >= 1 and s.shape[:1] == (batch_size,)
                     and batch_size > 1) else rep
        return jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh)

    return jax.tree_util.tree_map_with_path(place, shapes)


def plan(model: str = "flux", width: str = "bench", *,
         mesh_axes: dict[str, int] | None = None,
         batch_size: int | None = None, grid: int | tuple[int, int] = 32,
         txt_len: int = 512,
         quant_dtype: str | None = None, group_size: int = 128,
         remat_policy: str = "flash", lora_rank: int = 16,
         weight_dtype=jnp.bfloat16) -> dict:
    """Compile the LoRA train step for one (model, mesh) point; return the
    per-device memory analysis + collective counts.  Raises if the active
    backend has fewer devices than the mesh needs."""
    import optax

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.parallel import MeshConfig, build_mesh
    from qflux_tpu.parallel.partitioning import mmdit_rules, named_sharding_tree
    from qflux_tpu.trainer.train_step import (TrainState, TrainStepConfig,
                                              make_train_step)

    axes = {"dp": 1, "fsdp": 1, "tp": 1, "sp": 1}
    axes.update(mesh_axes or {"fsdp": -1})
    if axes["sp"] > 1:
        raise ValueError(
            "sp>1 planning is not modeled yet: the stub attention does not "
            "split the sequence over the sp axis, so memory/collective "
            "numbers would be wrong — plan with sp=1 and expect ring "
            "attention to LOWER activation residency further")
    mesh = build_mesh(MeshConfig(**axes))
    if batch_size is None:
        batch_size = mesh.shape["dp"] * mesh.shape["fsdp"]
    grid_h, grid_w = (grid, grid) if isinstance(grid, int) else grid

    do_remat = remat_policy != "none"
    if model in ("flux", "flux2"):
        from qflux_tpu.models.flux import transformer as mt
        from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
        from qflux_tpu.utils.synthetic import flux_inputs

        if model == "flux2":
            # FLUX.2-Klein topology (trainer/flux2_klein.py klein-4B layout)
            from qflux_tpu.trainer.flux2_klein import flux2_config

            cfg = flux2_config() if width == "full" else _widthed(
                mt.FluxConfig, width)
        else:
            cfg = _widthed(mt.FluxConfig, width)
        adapter = FluxKontextAdapter(cfg, attn_impl="stub", remat=do_remat,
                                     remat_policy=remat_policy
                                     if do_remat else "flash")
        predict = adapter.predict_velocity

        def batch_shapes():
            return flux_inputs(cfg, batch=batch_size, grid_h=grid_h,
                               grid_w=grid_w, txt_len=txt_len,
                               dtype=weight_dtype)
    elif model == "qwen":
        from qflux_tpu.models.qwen import transformer as mt
        from qflux_tpu.ops.rope import qwen_rope

        cfg = _widthed(mt.QwenImageConfig, width)
        s_img = grid_h * grid_w
        frames = [(1, grid_h, grid_w), (1, grid_h, grid_w)]

        def predict(p, b, noisy, sigma):
            latents = jnp.concatenate([noisy, b["control_latents"]], axis=1)
            out = mt.forward(p, cfg, latents, b["prompt_embeds"], sigma,
                             frames, rope=b["rope_tables"], attn_impl="stub",
                             remat=do_remat,
                             remat_policy=remat_policy if do_remat else "flash")
            return out[:, :s_img, : cfg.in_channels]

        def batch_shapes():
            rope = qwen_rope(frames, txt_len, cfg.axes_dims_rope,
                             scale_rope=cfg.scale_rope)
            k = jax.random.PRNGKey(0)
            return {
                "image_latents": jax.random.normal(
                    k, (batch_size, s_img, cfg.in_channels), weight_dtype),
                "control_latents": jax.random.normal(
                    k, (batch_size, s_img, cfg.in_channels), weight_dtype),
                "prompt_embeds": jax.random.normal(
                    k, (batch_size, txt_len, cfg.joint_attention_dim),
                    weight_dtype),
                "rope_tables": tuple(jnp.asarray(r) for r in rope),
            }
    else:
        raise ValueError(f"model must be flux|flux2|qwen, got {model!r}")

    def param_shapes():
        p = mt.init(jax.random.PRNGKey(0), cfg, dtype=weight_dtype)
        if quant_dtype:
            from qflux_tpu.config import QuantizeSection
            from qflux_tpu.ops.quant import quantize_tree

            p = quantize_tree(p, QuantizeSection(
                enabled=True, dtype=quant_dtype, group_size=group_size))
        return p

    p_sds = jax.eval_shape(param_shapes)
    p_sds = _with_shardings(p_sds, named_sharding_tree(p_sds, mmdit_rules(), mesh))

    opt = optax.adamw(1e-4)
    targets = [r"attn/(to_q|to_k|to_v|to_out|add_q|add_k|add_v|add_out)"]
    state_sds = _replicated(
        jax.eval_shape(lambda: TrainState.create(
            build_lora_tree(jax.random.PRNGKey(1), p_sds, targets,
                            rank=lora_rank, alpha=lora_rank,
                            dtype=weight_dtype), opt)), mesh)
    b_sds = _batch_sharded(jax.eval_shape(batch_shapes), mesh, batch_size)

    step = make_train_step(predict, MseLoss(), opt, TrainStepConfig(),
                           mesh=mesh)
    t0 = time.perf_counter()
    compiled = step.lower(state_sds, p_sds, b_sds,
                          jax.random.PRNGKey(0)).compile()
    compile_s = time.perf_counter() - t0

    ma = compiled.memory_analysis()
    hlo = compiled.as_text()
    counts = {c: len(re.findall(rf"{c}(?:-start)?[.\d]*\(", hlo))
              for c in COLLECTIVES}
    mb = 1024 * 1024

    # sequence-parallel advice (SURVEY §2.8 new-capability mandate): the
    # joint [txt, img(+controls)] sequence drives attention working set and
    # per-block activation residency; past ~16k tokens ring attention over
    # an sp axis is the designed answer (ops/ring_attention.py)
    joint_seq = txt_len + 2 * grid_h * grid_w  # target + one control
    advice = []
    if joint_seq >= SP_ADVICE_SEQ and axes.get("sp", 1) == 1:
        advice.append(
            f"joint sequence is {joint_seq} tokens (txt {txt_len} + image "
            f"{2 * grid_h * grid_w}); set mesh.sp >= 2 to split it with ring "
            "attention (ops/ring_attention.py) — per-device attention "
            "residency scales 1/sp")
    # state+params are donated/aliased into outputs, so resident bytes are
    # arguments + temps (outputs alias); peak_memory_in_bytes on the CPU
    # backend under-reports temps, so take the max of both views
    resident = max(ma.peak_memory_in_bytes,
                   ma.argument_size_in_bytes + ma.temp_size_in_bytes)

    # XLA:CPU has no native bf16 GEMM: it materializes an f32 copy of the
    # whole (sharded) bf16 weight stack as a loop-invariant temp — 2× the
    # bf16 param bytes — which a real TPU compile does not. Report the
    # artifact so `resident - upcast` estimates the TPU number (calibrated:
    # int8 single-chip resident 15.4 GB vs the 16 GB chip it really runs on;
    # bf16 fsdp2 temp minus artifact = 3.9 GB = the int8 temp exactly).
    def _leaf_dev_bytes(s):
        n = int(np.prod(s.shape)) * s.dtype.itemsize
        shard = 1
        spec = s.sharding.spec
        for dim_axes, dim in zip(spec, s.shape):
            if dim_axes is None:
                continue
            axes = dim_axes if isinstance(dim_axes, tuple) else (dim_axes,)
            f = int(np.prod([mesh.shape[a] for a in axes]))
            if dim % f == 0:
                shard *= f
        return n // shard

    bf16_param_bytes = sum(
        _leaf_dev_bytes(s) for s in jax.tree.leaves(p_sds)
        if s.dtype == jnp.bfloat16 and s.ndim >= 2)
    cpu_upcast = (2 * bf16_param_bytes
                  if jax.default_backend() == "cpu" else 0)
    return {
        "model": model, "width": width, "mesh": dict(mesh.shape),
        "batch_size": batch_size, "grid": [grid_h, grid_w],
        "txt_len": txt_len,
        "quant": quant_dtype or "bf16", "remat_policy": remat_policy,
        "per_device_mb": {
            "arguments": round(ma.argument_size_in_bytes / mb, 1),
            "temp": round(ma.temp_size_in_bytes / mb, 1),
            "output": round(ma.output_size_in_bytes / mb, 1),
            "cpu_bf16_upcast": round(cpu_upcast / mb, 1),
            "resident_est": round((resident - cpu_upcast) / mb, 1),
        },
        "collectives": counts,
        "compile_s": round(compile_s, 1),
        "fits_16gb_v5e": (resident - cpu_upcast) < 15.2e9,  # ~800 MB slack
        "joint_seq": joint_seq,
        "advice": advice,
    }
