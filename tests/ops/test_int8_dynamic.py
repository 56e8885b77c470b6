"""W8A8-dynamic quantization: int8×int8 MXU matmul with per-row activation
scales and a straight-through custom VJP (opt-in quantize.dtype=int8_dynamic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.config import QuantizeSection
from qflux_tpu.ops.layers import dense
from qflux_tpu.ops.quant import dyn_int8_matmul, quantize_kernel, quantize_tree


@pytest.fixture(scope="module")
def wxs():
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(jax.random.fold_in(k, 1), (128, 64)) * 0.05
    x = jax.random.normal(k, (4, 128))
    q, s = quantize_kernel(w, "int8")
    return w, x, q, s


def test_forward_close_to_fp32(wxs):
    w, x, q, s = wxs
    y = dyn_int8_matmul(x, q, s[0])
    err = np.abs(np.asarray(y) - np.asarray(x @ w))
    assert err.max() < 0.05  # two int8 roundings


def test_straight_through_gradient(wxs):
    w, x, q, s = wxs
    g = jax.grad(lambda x: jnp.sum(dyn_int8_matmul(x, q, s[0]) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum((x @ w) ** 2))(x)
    rel = np.abs(np.asarray(g - g_ref)).max() / np.abs(np.asarray(g_ref)).max()
    assert rel < 0.05


def test_quantize_tree_dispatch_and_lora_grads(wxs):
    w, x, q, s = wxs
    tree = quantize_tree({"attn": {"to_q": {"kernel": w}}},
                         QuantizeSection(enabled=True, dtype="int8_dynamic"))
    node = tree["attn"]["to_q"]
    assert "kernel_q_dyn" in node and "kernel" not in node

    lora = {"a": jnp.full((128, 4), 0.01), "b": jnp.zeros((4, 64)),
            "scaling": jnp.asarray(1.0)}

    def loss(lora):
        return jnp.sum(dense({**node, "lora": lora}, x) ** 2)

    g = jax.grad(loss)(lora)
    # b starts at zero so dL/da == 0, but dL/db must be real and finite
    gb = np.asarray(g["b"])
    assert np.isfinite(gb).all() and np.abs(gb).max() > 0


def test_jitted_under_scan():
    """The custom VJP must survive jit + scan (how blocks actually run)."""
    k = jax.random.PRNGKey(3)
    w = jax.random.normal(k, (128, 128)) * 0.05
    x = jax.random.normal(jax.random.fold_in(k, 1), (4, 128))
    q, s = quantize_kernel(w, "int8")
    qs = jnp.stack([q, q])
    ss = jnp.stack([s[0], s[0]])

    @jax.jit
    def f(x):
        def body(h, inp):
            qi, si = inp
            return dyn_int8_matmul(h, qi, si), None

        out, _ = jax.lax.scan(body, x, (qs, ss))
        return jnp.sum(out ** 2)

    v, g = jax.value_and_grad(f)(x)
    assert np.isfinite(float(v)) and np.isfinite(np.asarray(g)).all()


def test_w8a8_training_converges_like_fp32():
    """LoRA training on the tiny FLUX stack with a W8A8-dynamic base must
    track the fp32 base's loss trajectory (straight-through grads are sound)."""
    import optax

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.ops.rope import flux_image_ids, flux_text_ids
    from qflux_tpu.trainer.train_step import (TrainState, TrainStepConfig,
                                              make_train_step)

    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_tree(params, QuantizeSection(enabled=True,
                                                    dtype="int8_dynamic"))
    h = w = 4
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    batch = {
        "image_latents": jax.random.normal(ks[0], (2, h * w, cfg.in_channels)),
        "control_latents": jax.random.normal(ks[1], (2, h * w, cfg.in_channels)),
        "prompt_embeds": jax.random.normal(ks[2], (2, 8, cfg.joint_attention_dim)),
        "pooled_prompt_embeds": jax.random.normal(ks[3], (2, cfg.pooled_projection_dim)),
        "img_ids": jnp.asarray(np.concatenate([flux_image_ids(h, w, 0),
                                               flux_image_ids(h, w, 1)])),
        "txt_ids": jnp.asarray(flux_text_ids(8)),
    }
    adapter = FluxKontextAdapter(cfg, attn_impl="xla", remat=False)
    curves = {}
    for name, p in [("fp32", params), ("w8a8", qparams)]:
        opt = optax.adamw(1e-2)
        lora = build_lora_tree(jax.random.PRNGKey(1), p, [r"attn/(to_q|to_v)"],
                               rank=4, alpha=4)
        step = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                               TrainStepConfig(max_grad_norm=1.0))
        state = TrainState.create(lora, opt)
        losses = []
        for _ in range(20):
            state, m = step(state, p, batch, jax.random.PRNGKey(0))
            losses.append(float(m["loss"]))
        curves[name] = losses
    # both decrease, and the quantized trajectory stays near the fp32 one
    for name, ls in curves.items():
        assert np.mean(ls[-5:]) < np.mean(ls[:5]), (name, ls)
    drop_fp32 = np.mean(curves["fp32"][:5]) - np.mean(curves["fp32"][-5:])
    drop_w8a8 = np.mean(curves["w8a8"][:5]) - np.mean(curves["w8a8"][-5:])
    assert drop_w8a8 > 0.5 * drop_fp32, curves


def test_w4a8_matches_int4_dequant_path():
    """dyn_int4_matmul (segmented int8 GEMMs) must match the dequantized-int4
    float matmul closely, and gradients must flow straight-through."""
    from qflux_tpu.ops.quant import (dequantize_kernel_int4, dyn_int4_matmul,
                                     quantize_kernel_int4)

    k = jax.random.PRNGKey(5)
    w = jax.random.normal(k, (256, 64)) * 0.05
    x = jax.random.normal(jax.random.fold_in(k, 1), (4, 256))
    q4, gs = quantize_kernel_int4(w, 128)
    y = dyn_int4_matmul(x, q4, gs)
    y_ref = x @ dequantize_kernel_int4(q4, gs, jnp.float32)
    assert np.abs(np.asarray(y) - np.asarray(y_ref)).max() < 0.05
    g = jax.grad(lambda x: jnp.sum(dyn_int4_matmul(x, q4, gs) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum((x @ dequantize_kernel_int4(
        q4, gs, jnp.float32)) ** 2))(x)
    rel = np.abs(np.asarray(g - g_ref)).max() / np.abs(np.asarray(g_ref)).max()
    assert rel < 0.05


def test_w4a8_dense_dispatch():
    from qflux_tpu.ops.quant import quantize_tree as qt
    from qflux_tpu.ops.layers import build_lora_tree, dense

    k = jax.random.PRNGKey(6)
    w = jax.random.normal(k, (128, 64)) * 0.05
    x = jax.random.normal(jax.random.fold_in(k, 1), (2, 128))
    tree = qt({"attn": {"to_q": {"kernel": w}}},
              QuantizeSection(enabled=True, dtype="int4_dynamic", group_size=64))
    node = tree["attn"]["to_q"]
    assert "kernel_q4_dyn" in node
    y = dense(node, x)
    assert np.isfinite(np.asarray(y)).all()
    lora = build_lora_tree(k, tree, [r"attn/to_q"], rank=4, alpha=4)
    assert lora["attn"]["to_q"]["a"].shape == (128, 4)


@pytest.mark.slow
def test_quant_quality_three_way_tiny():
    """Round 3 (VERDICT #2): same LoRA fit over bf16 / W8A8 / W4A8 bases —
    quantized tails must track the bf16 tail (scripts/quant_quality.py is
    the bench-width version; this runs the tiny width in CI)."""
    from scripts.quant_quality import run

    res = run(width="tiny", steps=60, grid=8, txt_len=32, lr=1e-3)
    tails = res["tail_loss"]
    assert tails["w8a8_dynamic"] <= tails["bf16"] * 1.15 + 5e-3, tails
    assert tails["w4a8_requant"] <= tails["bf16"] * 1.25 + 5e-3, tails


def test_tiny_m_routes_to_weight_only(wxs):
    """GEMV-shaped dense() calls (M <= 32 rows — the AdaLN modulation
    projections) skip the dynamic activation quant: XLA lowers M=1 int8
    dots as a VPU s32 sweep over the whole weight (docs/PERF.md round 3).
    The weight-only route keeps bf16 activations → BETTER accuracy."""
    w, x, q, s = wxs
    node = {"kernel_q_dyn": q, "kernel_scale": s}
    x1 = x[:1]
    y_tiny = dense(node, x1)
    y_ref = x1 @ (np.asarray(q, np.float32) * np.asarray(s[0]))
    # weight-only: the ONLY rounding is the weight grid — tighter than the
    # dynamic path's activation rounding
    assert np.abs(np.asarray(y_tiny) - np.asarray(y_ref)).max() < 1e-3
    # gradient still flows to the activation
    g = jax.grad(lambda z: jnp.sum(dense(node, z) ** 2))(x1)
    g_ref = jax.grad(lambda z: jnp.sum((z @ w) ** 2))(x1)
    rel = np.abs(np.asarray(g - g_ref)).max() / np.abs(np.asarray(g_ref)).max()
    assert rel < 0.05
    # int4 forms: tiny-M dequant path stays numerically on the int4 grid
    from qflux_tpu.ops.quant import dequantize_kernel_int4, quantize_kernel_int4

    q4, s4 = quantize_kernel_int4(jnp.asarray(w), 64)
    node4 = {"kernel_q4_rq": q4, "kernel_scale": s4}
    y4 = dense(node4, x1)
    y4_ref = x1 @ dequantize_kernel_int4(q4, s4, jnp.float32)
    assert np.abs(np.asarray(y4) - np.asarray(y4_ref)).max() < 1e-2
