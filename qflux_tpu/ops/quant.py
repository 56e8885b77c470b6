"""Weight-only quantization for frozen base params.

TPU-native analogue of the reference's quantization layer (reference
models/quantize.py: transformer-engine fp8 Linear swap at :83-166, bnb
int8/NF4 at :169-273).  On TPU the useful form for LoRA training is
weight-only: frozen kernels stored int8 (or fp8) with per-output-channel
scales, dequantized at use — halving HBM traffic and resident memory for the
12B base while LoRA/bf16 activations stay full precision.

dense() in ops/layers.py consumes the {kernel_q, kernel_scale} form directly;
XLA fuses the dequant multiply into the matmul's operand load.
"""

from __future__ import annotations

import re

import jax.numpy as jnp


def quantize_kernel(kernel, dtype="int8"):
    """[…, in, out] float → ({…} int8/fp8 values, [..., 1, out] scales)."""
    k = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2, keepdims=True)  # per output channel
    if dtype == "int8":
        scale = amax / 127.0
        q = jnp.round(k / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
    elif dtype == "fp8_e4m3":
        scale = amax / 448.0
        q = (k / jnp.maximum(scale, 1e-12)).astype(jnp.float8_e4m3fn)
    elif dtype == "fp8_e5m2":
        scale = amax / 57344.0
        q = (k / jnp.maximum(scale, 1e-12)).astype(jnp.float8_e5m2)
    else:
        raise ValueError(f"unknown quant dtype {dtype!r}")
    return q, scale


def dequantize_kernel(q, scale, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_tree(params, qcfg) -> dict:
    """Replace every matching dense kernel with {kernel_q, kernel_scale}.

    qcfg: config.QuantizeSection (dtype + skip_patterns).  Biases, norms and
    embeddings stay full precision (mirrors bnb's skip of non-Linear modules).
    """
    skip = [re.compile(p) for p in qcfg.skip_patterns]

    def rec(node, path):
        if isinstance(node, dict):
            if "kernel" in node and not isinstance(node["kernel"], dict):
                path_str = "/".join(path)
                if any(p.search(path_str) for p in skip) or node["kernel"].ndim < 2:
                    return node
                q, scale = quantize_kernel(node["kernel"], qcfg.dtype)
                out = {k: v for k, v in node.items() if k != "kernel"}
                out["kernel_q"] = q
                out["kernel_scale"] = scale
                return out
            return {k: rec(v, path + (str(k),)) for k, v in node.items()}
        return node

    return rec(params, ())
