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
    assert scale.shape == (2, 1, 64)
    back = np.asarray(dequantize_kernel_int4(q, scale, jnp.float32))
    # max error ≤ scale/2 per group
    err = np.abs(back - k)
    bound = np.repeat(np.asarray(scale)[:, 0], 128, axis=0) / 2 + 1e-8
    assert (err <= bound).all()


def test_int4_packing_order():
    """Row 2i → low nibble, row 2i+1 → high nibble, sign preserved through
    the pack/unpack shifts (values themselves round to the 15-level grid)."""
    k = np.zeros((4, 1), np.float32)
    k[:, 0] = [7.0, -8.0, -1.0, 3.0]
    q, scale = quantize_kernel_int4(k, group_size=4)
    s = float(np.asarray(scale).ravel()[0])
    # manual unpack of the two packed bytes
    packed = np.asarray(q)[:, 0].astype(np.int8)
    lo = np.left_shift(packed, 4).astype(np.int8) >> 4
    hi = packed >> 4
    got = np.stack([lo, hi], 1).reshape(-1)
    want = np.clip(np.round(k[:, 0] / s), -8, 7)
    np.testing.assert_array_equal(got, want)
    back = np.asarray(dequantize_kernel_int4(q, scale, jnp.float32))[:, 0]
    assert np.abs(back - k[:, 0]).max() <= s / 2 + 1e-6


def test_int4_stacked_kernels():
    """Scan-stacked [L, in, out] kernels quantize/dequantize per layer."""
    k = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, 64, 32)) * 0.1)
    q, scale = quantize_kernel_int4(k, group_size=32)
    assert q.shape == (3, 32, 32) and scale.shape == (3, 2, 1, 32)
    back = np.asarray(dequantize_kernel_int4(q, scale, jnp.float32))
    # per-group error bound: scale/2
    bound = np.repeat(np.asarray(scale), 32, axis=-3).reshape(k.shape) / 2 + 1e-7
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


def test_int4_memory_is_half_of_int8():
    k = np.zeros((256, 256), np.float32)
    q8, s8 = __import__("qflux_tpu.ops.quant", fromlist=["quantize_kernel"]).quantize_kernel(k)
    q4, s4 = quantize_kernel_int4(k)
    assert q4.size == q8.size // 2
