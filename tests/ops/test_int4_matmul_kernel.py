"""Fused int4-dequant Pallas matmul (opt-in QFLUX_FUSED_INT4): exactness vs
the XLA dequant path + straight-through gradient."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.ops.int4_matmul import int4_matmul, supports
from qflux_tpu.ops.quant import dequantize_kernel_int4, quantize_kernel_int4

K, N = 3072, 640


@pytest.fixture(scope="module")
def qw():
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (K, N)) * 0.05
    q4, s = quantize_kernel_int4(w, 128)
    return q4, s


def test_supports():
    assert supports(3072, 3072) and supports(12288, 3072)
    assert not supports(100, 3072)      # K not tileable
    assert not supports(3072, 100)      # N not lane-aligned


def test_fwd_matches_dequant(qw):
    q4, s = qw
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, K), jnp.bfloat16)
    y = int4_matmul(x, q4, s)
    wd = dequantize_kernel_int4(q4, s, jnp.float32)
    y_ref = (x.astype(jnp.float32).reshape(-1, K) @ wd).reshape(3, 7, N)
    assert np.abs(np.asarray(y, np.float32) - np.asarray(y_ref)).max() < 0.3


def test_grad_matches_dequant(qw):
    q4, s = qw
    x = jax.random.normal(jax.random.PRNGKey(2), (4, K), jnp.bfloat16)
    wd = dequantize_kernel_int4(q4, s, jnp.float32)
    g = jax.grad(lambda x: jnp.sum(int4_matmul(x, q4, s).astype(jnp.float32) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(
        (x.astype(jnp.float32) @ wd) ** 2))(x)
    rel = (np.abs(np.asarray(g, np.float32) - np.asarray(g_ref, np.float32)).max()
           / np.abs(np.asarray(g_ref, np.float32)).max())
    assert rel < 0.05
