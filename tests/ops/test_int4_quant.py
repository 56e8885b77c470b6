"""Grouped int4 weight-only quantization (the 20B-Qwen-on-one-v5e enabler;
reference NF4 analogue, models/quantize.py:169-273)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.config import QuantizeSection
from qflux_tpu.ops.layers import build_lora_tree, dense
from qflux_tpu.ops.quant import (
    dequantize_kernel_int4,
    quantize_kernel_int4,
    quantize_tree,
)


def test_int4_roundtrip_error_bounded():
    k = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (256, 64)) * 0.02)
    q, scale = quantize_kernel_int4(k, group_size=128)
    assert q.shape == (128, 64) and q.dtype == jnp.int8
    assert scale.shape == (2, 64)
    back = np.asarray(dequantize_kernel_int4(q, scale, jnp.float32))
    # max error ≤ scale/2 per group
    err = np.abs(back - k)
    bound = np.repeat(np.asarray(scale), 128, axis=0) / 2 + 1e-8
    assert (err <= bound).all()


def test_int4_packing_order():
    """Half-split layout: byte row i holds original row i (low nibble) and
    row i+K/2 (high nibble), sign preserved through the pack/unpack shifts
    (values themselves round to the 15-level grid)."""
    k = np.zeros((4, 1), np.float32)
    k[:, 0] = [7.0, -8.0, -1.0, 3.0]
    q, scale = quantize_kernel_int4(k, group_size=4)
    s = float(np.asarray(scale).ravel()[0])
    # manual unpack of the two packed bytes
    packed = np.asarray(q)[:, 0].astype(np.int8)
    lo = np.left_shift(packed, 4).astype(np.int8) >> 4
    hi = packed >> 4
    got = np.concatenate([lo, hi])
    want = np.clip(np.round(k[:, 0] / s), -8, 7)
    np.testing.assert_array_equal(got, want)
    back = np.asarray(dequantize_kernel_int4(q, scale, jnp.float32))[:, 0]
    assert np.abs(back - k[:, 0]).max() <= s / 2 + 1e-6


def test_int4_stacked_kernels():
    """Scan-stacked [L, in, out] kernels quantize/dequantize per layer."""
    k = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, 64, 32)) * 0.1)
    q, scale = quantize_kernel_int4(k, group_size=32)
    assert q.shape == (3, 32, 32) and scale.shape == (3, 2, 32)
    back = np.asarray(dequantize_kernel_int4(q, scale, jnp.float32))
    # per-group error bound: scale/2
    bound = np.repeat(np.asarray(scale), 32, axis=-2).reshape(k.shape) / 2 + 1e-7
    assert (np.abs(back - k) <= bound).all()


def test_dense_with_int4_and_lora():
    key = jax.random.PRNGKey(2)
    k = jax.random.normal(key, (128, 64)) * 0.05
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 128))
    node = {"kernel": k}
    tree = quantize_tree({"attn": {"to_q": node}},
                         QuantizeSection(enabled=True, dtype="int4", group_size=64))
    qnode = tree["attn"]["to_q"]
    assert "kernel_q4" in qnode and "kernel" not in qnode
    y_q = dense(qnode, x)
    # int4 matmul must EXACTLY equal the matmul with the dequantized kernel
    from qflux_tpu.ops.quant import dequantize_kernel_int4 as deq
    y_ref = dense({"kernel": deq(qnode["kernel_q4"], qnode["kernel_scale"],
                                 jnp.float32)}, x)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref), rtol=1e-6)
    # and approximate the full-precision result
    y_f = dense(node, x)
    assert np.abs(np.asarray(y_q) - np.asarray(y_f)).max() < 0.5

    # LoRA builds against the packed node with the UNPACKED in-dim
    lora = build_lora_tree(key, tree, [r"attn/to_q"], rank=4, alpha=4)
    assert lora["attn"]["to_q"]["a"].shape == (128, 4)
    merged = dict(qnode)
    merged["lora"] = lora["attn"]["to_q"]
    y_l = dense(merged, x)
    assert y_l.shape == y_q.shape and np.isfinite(np.asarray(y_l)).all()


def test_int4_requant_matmul_error_bounded():
    """requant_int4_matmul (int4 → per-channel int8 grid, one int8 GEMM)
    approximates the grouped-dequant matmul: the re-quantization adds at most
    S_n/254 per weight on top of the group grid."""
    from qflux_tpu.ops.quant import requant_int4_matmul

    w = np.array(jax.random.normal(jax.random.PRNGKey(3), (256, 96)) * 0.05)
    # make group scales genuinely heterogeneous (the hard case for requant)
    w[:128] *= 8.0
    q4, s = quantize_kernel_int4(w, group_size=128)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 256), jnp.float32)
    y = np.asarray(requant_int4_matmul(x, q4, s), np.float32)
    y_ref = np.asarray(x) @ np.asarray(dequantize_kernel_int4(q4, s, jnp.float32))
    rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert rel < 0.03, rel


def test_int4_requant_grad_straight_through():
    from qflux_tpu.ops.quant import requant_int4_matmul

    w = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (128, 64)) * 0.1)
    q4, s = quantize_kernel_int4(w, group_size=64)
    wd = np.asarray(dequantize_kernel_int4(q4, s, jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 128), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(requant_int4_matmul(x, q4, s) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum((x @ wd) ** 2))(x)
    rel = (np.abs(np.asarray(g) - np.asarray(g_ref)).max()
           / np.abs(np.asarray(g_ref)).max())
    assert rel < 0.05, rel


def test_dense_dispatches_int4_requant():
    k = jax.random.normal(jax.random.PRNGKey(7), (128, 64)) * 0.05
    tree = quantize_tree({"to_q": {"kernel": k}},
                         QuantizeSection(enabled=True, dtype="int4_requant",
                                         group_size=64))
    node = tree["to_q"]
    assert "kernel_q4_rq" in node and "kernel" not in node
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 128))
    y = dense(node, x)
    y_f = dense({"kernel": k}, x)
    assert np.abs(np.asarray(y) - np.asarray(y_f)).max() < 0.5
    # LoRA in-dim unpacks from the packed kernel
    lora = build_lora_tree(jax.random.PRNGKey(9), tree, [r"to_q"], rank=4, alpha=4)
    assert lora["to_q"]["a"].shape == (128, 4)


def test_int4_memory_is_half_of_int8():
    k = np.zeros((256, 256), np.float32)
    q8, s8 = __import__("qflux_tpu.ops.quant", fromlist=["quantize_kernel"]).quantize_kernel(k)
    q4, s4 = quantize_kernel_int4(k)
    assert q4.size == q8.size // 2
