"""Perf experiment harness: time train-step variants on the real chip.

Usage: python scripts/bench_variants.py full flash   (policies to compare)
Mirrors bench.py's workload (full 19+38 FLUX, int8 base, 512², bs=1) but
parameterized over remat policy / attention impl / batch size via argv
flags like bs=2 attn=xla layers=bench.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _synthetic_int4_params(cfg, init_fn):
    """Full-model tree with grouped-int4 kernels, built on device (weight
    upload through the tunnel is impractical; timing is value-independent)."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(lambda k: init_fn(k, cfg, dtype=jnp.bfloat16),
                            jax.random.PRNGKey(0))

    def build(node):
        if isinstance(node, dict):
            if "kernel" in node and not isinstance(node["kernel"], dict):
                k = node["kernel"]
                if k.ndim >= 2 and k.shape[-2] % 128 == 0:
                    out = {kk: jnp.zeros(v.shape, jnp.bfloat16)
                           for kk, v in node.items() if kk != "kernel"}
                    out["kernel_q4"] = jnp.ones(
                        k.shape[:-2] + (k.shape[-2] // 2, k.shape[-1]), jnp.int8)
                    out["kernel_scale"] = jnp.full(
                        k.shape[:-2] + (k.shape[-2] // 128, k.shape[-1]),
                        1e-2, jnp.float32)
                    return out
            return {kk: build(v) for kk, v in node.items()}
        return jnp.zeros(node.shape, jnp.bfloat16)

    return build(shapes)


def run_qwen_variant(policy: str, bs: int, quant: str, n_iters: int = 6,
                     gh: int = 32, gw: int = 32, accum: int = 1):
    """FULL 60-block Qwen-Image-Edit DiT (20B) train step, int4 base.

    The measured (not extrapolated) Qwen number VERDICT.md asked for: 20B at
    int4 = ~10 GB weights fits one 16 GB v5e. gh=52 gw=36 reproduces the
    reference's published face-seg workload (832×576 center-crop,
    /root/reference/configs/face_seg_config.yaml:29, speed table
    README.md:617-626)."""
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.qwen import transformer as qwen
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.ops.rope import qwen_rope
    from qflux_tpu.trainer.train_step import TrainState, TrainStepConfig, make_train_step

    cfg = qwen.QwenImageConfig()  # full 60 layers; 20B → int4 only fits
    params = _synthetic_int4_params(cfg, qwen.init)
    if quant in ("w4a8", "requant"):
        new_key = {"w4a8": "kernel_q4_dyn", "requant": "kernel_q4_rq"}[quant]

        def rename(node):
            if isinstance(node, dict):
                if "kernel_q4" in node:
                    out = dict(node)
                    out[new_key] = out.pop("kernel_q4")
                    return out
                return {k: rename(v) for k, v in node.items()}
            return node
        params = rename(params)
    lora_patterns = [r"attn/(to_q|to_k|to_v|to_out|add_q|add_k|add_v|add_out)"]
    lora = build_lora_tree(jax.random.PRNGKey(1), params, lora_patterns,
                           rank=16, alpha=16, dtype=jnp.bfloat16)

    # 512²: patch=2 on /8 latents → 32×32=1024 img tokens, same control, 256 txt
    s_img = gh * gw
    txt_len = 256
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    img_shapes = [(1, gh, gw), (1, gh, gw)]
    rope = qwen_rope(img_shapes, txt_len, cfg.axes_dims_rope, scale_rope=cfg.scale_rope)
    batch = {
        "image_latents": jax.random.normal(ks[0], (bs, s_img, cfg.in_channels), jnp.bfloat16),
        "control_latents": jax.random.normal(ks[1], (bs, s_img, cfg.in_channels), jnp.bfloat16),
        "prompt_embeds": jax.random.normal(ks[2], (bs, txt_len, cfg.joint_attention_dim), jnp.bfloat16),
        "rope_tables": tuple(jnp.asarray(r) for r in rope),
    }

    def predict_velocity(params, batch, noisy, sigma):
        latents = jnp.concatenate([noisy, batch["control_latents"]], axis=1)
        out = qwen.forward(params, cfg, latents, batch["prompt_embeds"],
                           sigma, img_shapes, rope=batch["rope_tables"],
                           attn_impl="pallas", remat=True, remat_policy=policy)
        return out[:, :s_img, : cfg.in_channels]

    opt = optax.adamw(1e-4)
    step0 = make_train_step(predict_velocity, MseLoss(), opt,
                            TrainStepConfig(grad_accum_steps=accum))
    step = step0
    state = TrainState.create(lora, opt)
    rng = jax.random.PRNGKey(0)
    t_c = time.perf_counter()
    try:
        if jax.default_backend() == "tpu":
            # same AUTO-entry-layout treatment as the FLUX headline
            from qflux_tpu.trainer.train_step import relayout_base_params

            step, params = relayout_base_params(step, state, params, batch,
                                                rng, donate=True)
        state, m = step(state, params, batch, rng)
        _ = float(m["loss"])
    except ValueError as e:
        # Tunnel-backend flake: the AOT AUTO-layout executable can reject the
        # relaid tree at dispatch even after the straggler post-verify (the
        # verify compares the same metadata dispatch does — a leaf it can't
        # see wrong it can't fix; this nulled the r4 flagship number). Re-jit
        # pinned to the formats the arrays self-report (dispatch-consistent
        # by construction) and rebuild the possibly-donated state.
        if (jax.default_backend() != "tpu"
                or "layouts that disagree" not in str(e)):
            print(f"qwen policy={policy} bs={bs} {quant}: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}")
            return
        print(f"qwen policy={policy} bs={bs} {quant}: AOT layout dispatch "
              f"disagreement — re-jitting with pinned formats", flush=True)
        try:
            from qflux_tpu.trainer.train_step import jit_with_pinned_formats

            lora = build_lora_tree(jax.random.PRNGKey(1), params,
                                   lora_patterns, rank=16, alpha=16,
                                   dtype=jnp.bfloat16)
            state = TrainState.create(lora, opt)
            step = jit_with_pinned_formats(step0, params)
            state, m = step(state, params, batch, rng)
            _ = float(m["loss"])
        except Exception as e2:
            print(f"qwen policy={policy} bs={bs} {quant}: FAILED "
                  f"{type(e2).__name__}: {str(e2)[:300]}")
            return
    except Exception as e:
        print(f"qwen policy={policy} bs={bs} {quant}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, params, batch, rng)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n_iters
    flops = 3.0 * cfg.matmul_flops(2 * s_img, txt_len) * bs
    print(f"qwen FULL 60-block policy={policy} bs={bs}"
          f"{f'/accum={accum}' if accum > 1 else ''} grid={gh}x{gw} {quant}: "
          f"{dt*1e3:7.1f} ms/step  {bs/dt:.3f} img/s  mfu~{flops/dt/197e12:.2f} "
          f"(compile {compile_s:.0f}s)", flush=True)


def run_qwen_inference(quant: str = "requant", num_steps: int = 20,
                       true_cfg: bool = True, n_imgs: int = 3):
    """FULL 20B Qwen-Image-Edit DiT 512² inference: jitted Euler loop at the
    reference's quality-claim settings (20 steps, true CFG → cond+uncond
    forward per step, reference README.md:467-469,
    qwen_image_edit_trainer.py:1005). DiT-only (text encode + VAE decode are
    one-time costs outside the denoise loop)."""
    import time

    import jax
    import jax.numpy as jnp

    from qflux_tpu.models.qwen import transformer as qwen
    from qflux_tpu.ops.rope import qwen_rope
    from qflux_tpu.scheduler.flow_match import FlowMatchScheduler

    cfg = qwen.QwenImageConfig()
    params = _synthetic_int4_params(cfg, qwen.init)
    if quant in ("w4a8", "requant"):
        new_key = {"w4a8": "kernel_q4_dyn", "requant": "kernel_q4_rq"}[quant]

        def rename(node):
            if isinstance(node, dict):
                if "kernel_q4" in node:
                    out = dict(node)
                    out[new_key] = out.pop("kernel_q4")
                    return out
                return {k: rename(v) for k, v in node.items()}
            return node
        params = rename(params)

    gh = gw = 32
    s_img, txt_len = gh * gw, 256
    img_shapes = [(1, gh, gw), (1, gh, gw)]
    rope = tuple(jnp.asarray(r) for r in qwen_rope(
        img_shapes, txt_len, cfg.axes_dims_rope, scale_rope=cfg.scale_rope))
    # true CFG runs cond+uncond as a batch of 2 through one forward
    eff_bs = 2 if true_cfg else 1
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    control = jax.random.normal(ks[0], (eff_bs, s_img, cfg.in_channels), jnp.bfloat16)
    prompt = jax.random.normal(ks[1], (eff_bs, txt_len, cfg.joint_attention_dim),
                               jnp.bfloat16)
    x0 = jax.random.normal(ks[2], (1, s_img, cfg.in_channels), jnp.bfloat16)

    plan = FlowMatchScheduler().sampling_plan(num_steps, image_seq_len=s_img)
    sigmas = jnp.asarray(plan.sigmas, jnp.float32)

    @jax.jit
    def sample(params, x0, control, prompt):
        def body(x, i):
            sig = jnp.full((eff_bs,), sigmas[i], jnp.bfloat16)
            xin = jnp.broadcast_to(x, (eff_bs,) + x.shape[1:])
            latents = jnp.concatenate([xin, control], axis=1)
            v = qwen.forward(params, cfg, latents, prompt, sig, img_shapes,
                             rope=rope, attn_impl="pallas", remat=False)
            v = v[:, :s_img, : cfg.in_channels]
            if true_cfg:
                v = v[1:] + 4.0 * (v[:1] - v[1:])   # cond + scale·(cond−uncond)
            dt = sigmas[i + 1] - sigmas[i]
            return (x.astype(jnp.float32) + dt * v.astype(jnp.float32)
                    ).astype(x.dtype), None

        x, _ = jax.lax.scan(body, x0, jnp.arange(num_steps))
        return x

    t_c = time.perf_counter()
    out = sample(params, x0, control, prompt)
    _ = float(jnp.sum(out))
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    for _ in range(n_imgs):
        out = sample(params, x0, control, prompt)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n_imgs
    print(f"qwen 20B inference {quant} steps={num_steps} "
          f"true_cfg={true_cfg}: {dt:.2f} s/img "
          f"({dt / num_steps * 1e3:.0f} ms/denoise step, compile {compile_s:.0f}s)",
          flush=True)


def run_flux_inference(quant: str = "int8dyn", num_steps: int = 20,
                       n_imgs: int = 3):
    """Full 19+38 FLUX 512² inference: jitted Euler loop, single forward per
    step (FLUX-Kontext uses embedded guidance, not true CFG)."""
    import time

    import jax
    import jax.numpy as jnp

    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.scheduler.flow_match import FlowMatchScheduler
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.utils.synthetic import flux_inputs
    from bench import _synthetic_int8_params, _w8a8_params

    cfg = flux.FluxConfig()
    params = _synthetic_int8_params(cfg)
    if quant == "int8dyn":
        params = _w8a8_params(params)
    adapter = FluxKontextAdapter(cfg, attn_impl="auto", remat=False)
    batch = flux_inputs(cfg, batch=1, grid_h=32, grid_w=32, txt_len=512,
                        dtype=jnp.bfloat16)
    s_img = 32 * 32
    plan = FlowMatchScheduler().sampling_plan(num_steps, image_seq_len=s_img)
    sigmas = jnp.asarray(plan.sigmas, jnp.float32)

    @jax.jit
    def sample(params, batch):
        def body(x, i):
            sig = jnp.full((1,), sigmas[i], jnp.bfloat16)
            v = adapter.predict_velocity(params, batch, x, sig)
            dt = sigmas[i + 1] - sigmas[i]
            return (x.astype(jnp.float32) + dt * v.astype(jnp.float32)
                    ).astype(x.dtype), None

        x, _ = jax.lax.scan(body, batch["image_latents"], jnp.arange(num_steps))
        return x

    t_c = time.perf_counter()
    out = sample(params, batch)
    _ = float(jnp.sum(out))
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    for _ in range(n_imgs):
        out = sample(params, batch)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n_imgs
    print(f"flux inference {quant} steps={num_steps}: {dt:.2f} s/img "
          f"({dt / num_steps * 1e3:.0f} ms/denoise fwd, compile {compile_s:.0f}s)",
          flush=True)


def run_variant(policy: str, bs: int, attn: str, layers: str, n_iters: int = 8,
                gh: int = 32, gw: int = 32, part: str = "step",
                layout: str = "default", multires: str = "", accum: int = 1,
                tgt: str = "", ctrls: str = ""):
    """part: step (train step) | fwd (loss value only) | grad (value_and_grad,
    no optimizer) — the decomposition knob for locating step time.

    layout=auto: compile with XLA-chosen (AUTO) entry layouts for the frozen
    base params and device_put the tree into those layouts once — probes the
    step-invariant relayout copies the trace shows (~4 ms of s8 qkv stack
    copies; docs/PERF.md round 3)."""
    import jax
    import jax.numpy as jnp
    import optax

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.trainer.train_step import TrainState, TrainStepConfig, make_train_step
    from __graft_entry__ import _flux_inputs
    from bench import _synthetic_int8_params

    if layers == "full":
        cfg = flux.FluxConfig()
        quant = os.environ.get("QUANT", "")
        if quant in ("int4", "w4a8", "requant"):
            # grouped-int4 base (6 GB vs 12 GB int8): the long-sequence /
            # big-batch fit lever — flash-policy residuals at 832×576 only
            # fit next to a 6 GB tree (docs/PERF.md round 4)
            params = _synthetic_int4_params(cfg, flux.init)
            new_key = {"int4": None, "w4a8": "kernel_q4_dyn",
                       "requant": "kernel_q4_rq"}[quant]
        else:
            params = _synthetic_int8_params(cfg)
            new_key = "kernel_q_dyn" if quant == "int8dyn" else None
        if new_key:
            def rename(node):
                if isinstance(node, dict):
                    for old in ("kernel_q", "kernel_q4"):
                        if old in node:
                            out = dict(node)
                            out[new_key] = out.pop(old)
                            return out
                    return {k: rename(v) for k, v in node.items()}
                return node
            params = rename(params)
    else:
        cfg = flux.FluxConfig.bench()
        params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    lora = build_lora_tree(
        jax.random.PRNGKey(1), params,
        [r"attn/(to_q|to_k|to_v|to_out|add_q|add_k|add_v|add_out)"],
        rank=16, alpha=16, dtype=jnp.bfloat16)
    adapter = FluxKontextAdapter(cfg, attn_impl=attn, remat=policy != "none",
                                 remat_policy=policy if policy != "none" else "full")
    opt = optax.adamw(1e-4)
    step = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                           TrainStepConfig(grad_accum_steps=accum))
    state = TrainState.create(lora, opt)
    if multires:
        # e.g. multires=32x32,28x24 — one sample per grid, padded + segment
        # masked (the multi-res fallback path; VERDICT r3 #7)
        from qflux_tpu.utils.synthetic import flux_multires_inputs

        grids = [tuple(int(v) for v in g.split("x")) for g in multires.split(",")]
        batch = flux_multires_inputs(cfg, grids, txt_len=512, dtype=jnp.bfloat16)
        bs = len(grids)
    elif ctrls:
        # multi-control (char-comp): tgt=24x42 ctrls=24x42+32x32 reproduces
        # the reference's character-composition workload (384x672 target +
        # [384x672, 512x512] controls, configs/examples/...character_composition.yaml)
        from qflux_tpu.utils.synthetic import flux_multicontrol_inputs

        tg = tuple(int(v) for v in (tgt or "24x42").split("x"))
        cg = [tuple(int(v) for v in g.split("x")) for g in ctrls.split("+")]
        batch = flux_multicontrol_inputs(cfg, bs, tg, cg, txt_len=512,
                                         dtype=jnp.bfloat16)
    else:
        batch = _flux_inputs(cfg, batch=bs, grid_h=gh, grid_w=gw, txt_len=512,
                             dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    if part in ("fwd", "grad"):
        from qflux_tpu.trainer.train_step import (TrainStepConfig as _TSC,
                                                  _loss_for_microbatch)

        def _loss(lora_, params_, batch_, rng_):
            return _loss_for_microbatch(params_, lora_, batch_, rng_,
                                        adapter.predict_velocity, MseLoss(),
                                        _TSC())

        fn = jax.jit(_loss if part == "fwd"
                     else lambda l, p, b, r: jax.value_and_grad(_loss)(l, p, b, r))

        t_c = time.perf_counter()
        out = fn(lora, params, batch, rng)
        _ = float(out[0] if part == "grad" else out)
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(lora, params, batch, rng)
        _ = float(out[0] if part == "grad" else out)
        dt = (time.perf_counter() - t0) / n_iters
        print(f"variant policy={policy:8s} bs={bs} attn={attn:6s} part={part}: "
              f"{dt*1e3:7.1f} ms  (compile {compile_s:.0f}s)", flush=True)
        return

    if layout in ("auto", "auto_jit"):
        # auto     — run the AOT-compiled executable returned by the helper
        # auto_jit — relayout the params but keep calling the ORIGINAL jitted
        #            step (the trainer's mode: buckets re-specialize per batch
        #            shape; probes that plain jit honors committed layouts)
        from qflux_tpu.trainer.train_step import relayout_base_params
        t_c = time.perf_counter()
        try:
            cstep, params = relayout_base_params(step, state, params, batch,
                                                 rng, donate=True)
            if layout == "auto":
                step = cstep
            state, m = step(state, params, batch, rng)
            _ = float(m["loss"])
        except Exception as e:
            print(f"variant layout={layout}: FAILED {type(e).__name__}: {str(e)[:300]}")
            return
        compile_s = time.perf_counter() - t_c
    else:
        t_c = time.perf_counter()
        try:
            state, m = step(state, params, batch, rng)
            _ = float(m["loss"])  # scalar fetch actually blocks over the tunnel
        except Exception as e:
            print(f"variant policy={policy} bs={bs} attn={attn}: FAILED {type(e).__name__}: {str(e)[:300]}")
            return
        compile_s = time.perf_counter() - t_c

    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, params, batch, rng)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n_iters
    print(f"variant policy={policy:8s} bs={bs}"
          f"{f'/accum={accum}' if accum > 1 else ''} attn={attn:6s} "
          f"layers={layers} grid={f'{tgt}+{ctrls}' if ctrls else f'{gh}x{gw}'}: "
          f"{dt*1e3:7.1f} ms/step  {bs/dt:.3f} img/s  (compile {compile_s:.0f}s)",
          flush=True)


if __name__ == "__main__":
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    from qflux_tpu.runtime.tpu_env import configure_scoped_vmem
    configure_scoped_vmem()
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin registers at discovery and ignores the env var;
        # honor an explicit cpu request (same dance as bench.py)
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent compile cache (same location/policy as bench.py) — the
        # full-model variants here are 1-5 min cold per (shape, policy)
        import jax
        cache_dir = os.environ.get("QFLUX_COMPILE_CACHE",
                                   os.path.expanduser("~/.cache/qflux_tpu/xla"))
        if cache_dir and cache_dir != "0" and jax.default_backend() == "tpu":
            try:
                jax.config.update("jax_compilation_cache_dir",
                                  os.path.join(cache_dir, "tpu"))
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
            except Exception:
                pass
    policies = [a for a in sys.argv[1:] if "=" not in a] or ["full", "flash"]
    if kv.get("mode") == "qwen_inference":
        run_qwen_inference(kv.get("quant", "requant"),
                           int(kv.get("steps", 20)),
                           kv.get("cfg", "1") != "0")
        sys.exit(0)
    if kv.get("mode") == "flux_inference":
        run_flux_inference(kv.get("quant", "int8dyn"), int(kv.get("steps", 20)))
        sys.exit(0)
    for pol in policies:
        if kv.get("model") == "qwen":
            run_qwen_variant(pol, int(kv.get("bs", 1)), kv.get("quant", "int4"),
                             int(kv.get("iters", 6)), int(kv.get("gh", 32)),
                             int(kv.get("gw", 32)), int(kv.get("accum", 1)))
        else:
            run_variant(pol, int(kv.get("bs", 1)), kv.get("attn", "auto"),
                        kv.get("layers", "full"), int(kv.get("iters", 8)),
                        int(kv.get("gh", 32)), int(kv.get("gw", 32)),
                        kv.get("part", "step"), kv.get("layout", "default"),
                        kv.get("multires", ""), int(kv.get("accum", 1)),
                        kv.get("tgt", ""), kv.get("ctrls", ""))
