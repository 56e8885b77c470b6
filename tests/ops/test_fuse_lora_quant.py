"""fuse_lora on quantized bases: dequant → fold delta → requant.

The reference fuses edit-LoRAs into (possibly bnb-quantized) base models at
load time (reference models/flux_kontext_loader.py:184-198); here the fused
tree must keep the SAME quantized storage form so serving memory is unchanged.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qflux_tpu.ops.layers import dense, fuse_lora
from qflux_tpu.ops.quant import quantize_tree


def _qcfg(dtype, group_size=32):
    return types.SimpleNamespace(dtype=dtype, skip_patterns=[], group_size=group_size)


def _node_and_lora(key, d_in=64, d_out=48, rank=4):
    kw, ka, kb = jax.random.split(key, 3)
    node = {"kernel": jax.random.normal(kw, (d_in, d_out), jnp.float32),
            "bias": jnp.zeros((d_out,), jnp.float32)}
    lora = {"a": 0.1 * jax.random.normal(ka, (d_in, rank), jnp.float32),
            "b": 0.1 * jax.random.normal(kb, (rank, d_out), jnp.float32),
            "scaling": jnp.asarray(2.0)}
    return node, lora


@pytest.mark.parametrize("dtype,qkey", [
    ("int8", "kernel_q"),
    ("int8_dynamic", "kernel_q_dyn"),
    ("fp8_e4m3", "kernel_q"),
    ("int4", "kernel_q4"),
    ("int4_requant", "kernel_q4_rq"),
    ("int4_dynamic", "kernel_q4_dyn"),
])
def test_fuse_lora_quantized_base(dtype, qkey):
    node, lora = _node_and_lora(jax.random.PRNGKey(0))
    base = {"attn": {"to_q": quantize_tree({"attn": {"to_q": node}}, _qcfg(dtype))["attn"]["to_q"]}}
    tree_lora = {"attn": {"to_q": lora}}
    fused = fuse_lora(base, tree_lora)

    # storage form preserved (no full-precision kernel materialized)
    fnode = fused["attn"]["to_q"]
    assert qkey in fnode and "kernel" not in fnode
    assert fnode[qkey].dtype == base["attn"]["to_q"][qkey].dtype

    # fused output ≈ exact W + scaling·a@b, up to one requant step of error.
    # Tolerance is self-calibrated: the pre-fuse quantized base already sits
    # one quant step from the exact W, so the fused tree may sit at most ~2×
    # that distance from the exact fused W (requant onto a slightly moved grid).
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64), jnp.float32)
    w_exact = node["kernel"] + 2.0 * (lora["a"] @ lora["b"])
    y_exact = x @ w_exact
    base_err = np.linalg.norm(dense(base["attn"]["to_q"], x) - x @ node["kernel"])
    rel = np.linalg.norm(dense(fnode, x) - y_exact)
    assert rel < 2.0 * base_err + 1e-3 * np.linalg.norm(y_exact), (dtype, rel, base_err)
    # and the delta must actually be present: fused ≠ base-only output
    delta_norm = np.linalg.norm(x @ (2.0 * (lora["a"] @ lora["b"])))
    moved = np.linalg.norm(dense(fnode, x) - dense(base["attn"]["to_q"], x))
    assert moved > 0.5 * delta_norm, (dtype, moved, delta_norm)


def test_fuse_lora_full_precision_unchanged():
    node, lora = _node_and_lora(jax.random.PRNGKey(2))
    fused = fuse_lora({"m": node}, {"m": lora})
    w_exact = node["kernel"] + 2.0 * (lora["a"] @ lora["b"])
    np.testing.assert_allclose(np.asarray(fused["m"]["kernel"]), np.asarray(w_exact),
                               atol=1e-5)
