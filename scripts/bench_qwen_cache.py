"""Measure the Qwen-Image-Edit CACHE pass at REAL width on the chip.

VERDICT r3 #2: the 7B Qwen2.5-VL conditioning encoder (vision 32 blocks + LM
28 layers at 3584 hidden) had parity tests but no on-chip evidence. This
script builds the full-width encoder + the real 3D VAE with synthetic weights
(timing is value-independent; 15 GB of real weights cannot ride the tunnel),
jits the SAME stages the trainer's cache pass runs (trainer/qwen_edit.py:
encode_prompt + encode_vae_image ×2 + pack), and reports per-stage times,
compile times, and end-to-end samples/s.

    python scripts/bench_qwen_cache.py [lm=int8|bf16] [hw=512] [iters=8]

lm=bf16 is the fit probe: 7.1B LM + 0.68B vision in bf16 ≈ 15.6 GB — expected
to OOM a 16 GB v5e (report says so); int8 weight-only (wo_matmul — inference
only, no VJP cost) is the practical single-chip configuration.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _synthetic_text_int8(tcfg):
    """Full-width LM tree with int8 weight-only kernels, built on device."""
    import jax
    import jax.numpy as jnp

    from qflux_tpu.models.qwen import vl_encoder as vl

    shapes = jax.eval_shape(
        lambda k: vl.text_init(k, tcfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0))

    def build(node, path=()):
        if isinstance(node, dict):
            if "kernel" in node and not isinstance(node["kernel"], dict):
                k = node["kernel"]
                out = {kk: jnp.zeros(v.shape, jnp.bfloat16)
                       for kk, v in node.items() if kk != "kernel"}
                out["kernel_q"] = jnp.ones(k.shape, jnp.int8)
                out["kernel_scale"] = jnp.full(
                    k.shape[:-2] + (1, k.shape[-1]), 1e-2, jnp.float32)
                return out
            return {kk: build(v, path + (kk,)) for kk, v in node.items()}
        if path == ("embed_tokens",):
            return jax.random.normal(jax.random.PRNGKey(1), node.shape,
                                     jnp.bfloat16) * 0.02
        return jnp.ones(node.shape, jnp.bfloat16)

    return build(shapes)


def run(lm_quant: str = "int8", hw: int = 512, n_iters: int = 8):
    """Returns samples/s for the full cache step, or None if the config does
    not fit. Callable from bench.py (which scopes/frees it like the other
    stages)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qflux_tpu.models.qwen import vae as qwen_vae
    from qflux_tpu.models.qwen import vl_encoder as vl
    from qflux_tpu.ops.packing import pack_latents

    vcfg = vl.VLVisionConfig()     # real 7B vision tower
    tcfg = vl.VLTextConfig()       # real 7B LM
    vaecfg = qwen_vae.QwenVAEConfig()
    toks = vl.VLSpecialTokens()

    print(f"config: vision depth={vcfg.depth} d={vcfg.hidden_size}; "
          f"LM layers={tcfg.num_layers} d={tcfg.hidden_size} "
          f"(lm={lm_quant}); vae base={vaecfg.base_dim}; image {hw}x{hw}",
          flush=True)

    t0 = time.perf_counter()
    vis_params = jax.jit(lambda k: vl.vision_init(k, vcfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    if lm_quant == "bf16":
        try:
            txt_params = jax.jit(lambda k: vl.text_init(k, tcfg, dtype=jnp.bfloat16))(
                jax.random.PRNGKey(1))
            jax.tree.leaves(txt_params)[0].block_until_ready()
        except Exception as e:
            print(f"bf16 LM does NOT fit: {type(e).__name__}: {str(e)[:200]}")
            return None
    else:
        txt_params = _synthetic_text_int8(tcfg)
    vae_params = jax.jit(lambda k: qwen_vae.init(k, vaecfg))(jax.random.PRNGKey(2))
    print(f"weights built on device in {time.perf_counter()-t0:.1f}s", flush=True)

    # ---- host-side prep for one sample: prompt + 2 images (target-control
    # pair is the canonical Qwen-Image-Edit cache input)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (hw, hw, 3), np.uint8)
    patches, grid = vl.preprocess_image(img, vcfg)
    msz2 = vcfg.spatial_merge_size ** 2
    n_img_tok = grid[0] * grid[1] * grid[2] // msz2
    # template ≈ 30 tokens + vision pads + ~20 prompt tokens (reference
    # drop_idx=64 template; qwen_image_edit_trainer.py:946-993)
    ids = ([101] * 30 + [toks.image_token_id] * n_img_tok + [102] * 20)
    input_ids = np.asarray([ids], np.int64)
    attn = np.ones_like(input_ids)
    pos = vl.get_rope_index(input_ids, [grid], vcfg.spatial_merge_size, toks,
                            attention_mask=attn)
    patches_j = jnp.asarray(patches)
    grid_t = (tuple(int(x) for x in grid),)
    mask_img = jnp.asarray(input_ids[0] == toks.image_token_id)
    vae_in = jnp.asarray(
        rng.integers(0, 255, (1, hw, hw, 3)).astype(np.float32) / 127.5 - 1.0)

    def stage(name, fn, *args):
        t_c = time.perf_counter()
        out = jax.tree.leaves(fn(*args))[0]
        _ = np.asarray(out.ravel()[0])       # scalar fetch blocks the tunnel
        compile_s = time.perf_counter() - t_c
        # median of 3 windows: the tunnel multiplexes concurrent clients, and
        # a single window drifted −9.5% between builder and driver runs
        # (VERDICT r4 weak #6) — the median rejects a one-off slow window and
        # the spread makes remaining variance visible in the artifact.
        dts = []
        for _ in range(3):
            t_r = time.perf_counter()
            for _ in range(n_iters):
                out = jax.tree.leaves(fn(*args))[0]
            _ = np.asarray(out.ravel()[0])
            dts.append((time.perf_counter() - t_r) / n_iters)
        dt = sorted(dts)[1]
        spread = (max(dts) - min(dts)) / dt
        print(f"  {name:28s} {dt*1e3:8.1f} ms   (compile {compile_s:5.1f}s, "
              f"window spread {spread:.1%})", flush=True)
        stage.spreads.append(spread)
        return dt

    stage.spreads = []

    print(f"stages (S_vision={patches.shape[0]}, S_text={input_ids.shape[1]}):",
          flush=True)
    dt_vis = stage("vision tower (32 blk)", lambda p: vl.vision_forward_jit(
        vis_params, vcfg, p, grid_t), patches_j)

    embeds = jnp.asarray(txt_params["embed_tokens"])[jnp.asarray(input_ids)]

    # params ride as ARGUMENTS — closing over them captures 6.5 GB of weights
    # as XLA constants (measured: LM compile 532 s with the closure vs seconds
    # with arguments; jax warns "A large amount of constants were captured")
    @jax.jit
    def lm(tp, embeds, vis_out, pos):
        e = embeds.at[0, mask_img].set(vis_out.astype(embeds.dtype))
        return vl.text_forward(tp, tcfg, e, pos,
                               attention_mask=jnp.asarray(attn))

    vis_out = vl.vision_forward_jit(vis_params, vcfg, patches_j, grid_t)
    dt_lm = stage("LM (28 layers, scan)", lm, txt_params, embeds, vis_out, pos)
    dt_vae = stage("3D-VAE encode + pack", jax.jit(lambda vp, x: pack_latents(
        qwen_vae.encode(vp, vaecfg, x))), vae_params, vae_in)

    # full cache step per sample: VL encode (vision + LM) + VAE ×2 (image +
    # control) + pack. Template drop/re-pack is host-side numpy (~negligible).
    per_sample = dt_vis + dt_lm + 2 * dt_vae
    print(f"cache step/sample: {per_sample*1e3:.1f} ms = "
          f"{1.0/per_sample:.2f} samples/s "
          f"(vision {dt_vis*1e3:.0f} + LM {dt_lm*1e3:.0f} + 2×VAE {dt_vae*1e3:.0f})",
          flush=True)
    try:
        stats = jax.devices()[0].memory_stats()
        print(f"HBM in use: {stats['bytes_in_use']/2**30:.2f} GiB "
              f"(peak {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB)")
    except Exception:
        pass
    # worst per-stage window spread — bench.py forwards it into the JSON
    # artifact as a variance bound on the samples/s figure
    print(f"QWEN_CACHE_SPREAD={max(stage.spreads):.4f}", flush=True)
    return 1.0 / per_sample


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)

    from qflux_tpu.runtime.tpu_env import configure_scoped_vmem
    configure_scoped_vmem()

    import jax

    cache_dir = os.environ.get("QFLUX_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/qflux_tpu/xla"))
    if cache_dir and cache_dir != "0" and jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", os.path.join(cache_dir, "tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sps = run(kv.get("lm", "int8"), int(kv.get("hw", 512)),
              int(kv.get("iters", 8)))
    # machine-readable lines for bench.py's subprocess harness: a not-fit
    # result is deterministic — emit a distinct marker bench.py treats as
    # non-retryable instead of crashing on the f-string (None has no :.4f)
    if sps is None:
        print("QWEN_CACHE_NOT_FIT=1", flush=True)
    else:
        print(f"QWEN_CACHE_SAMPLES_PER_S={sps:.4f}", flush=True)


if __name__ == "__main__":
    main()
