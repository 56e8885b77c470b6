"""Ring attention (sequence parallel) vs single-device SDPA on the virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, AxisType

from qflux_tpu.ops.attention import sdpa_reference
from qflux_tpu.ops.ring_attention import ring_attention_sharded


@pytest.fixture(scope="module")
def sp_mesh():
    devs = np.asarray(jax.devices()[:4])
    return Mesh(devs, ("sp",), axis_types=(AxisType.Auto,))


def _qkv(key, b, s, h, d):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, s, h, d)) for k in ks)


def test_ring_matches_sdpa(sp_mesh):
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, 128, 2, 16)
    out = ring_attention_sharded(q, k, v, sp_mesh, "sp")
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_with_segments(sp_mesh):
    key = jax.random.PRNGKey(1)
    q, k, v = _qkv(key, 1, 128, 2, 16)
    seg = np.ones((1, 128), np.int32)
    seg[0, 100:] = 0       # padding
    seg[0, :40] = 2        # a second segment
    seg = jnp.asarray(seg)
    out = ring_attention_sharded(q, k, v, sp_mesh, "sp", segment_ids=seg)
    ref = sdpa_reference(q, k, v, segment_ids=seg)
    valid = np.asarray(seg)[0] != 0
    np.testing.assert_allclose(np.asarray(out)[0, valid], np.asarray(ref)[0, valid],
                               atol=2e-5)


def test_ring_gradients_flow(sp_mesh):
    q, k, v = _qkv(jax.random.PRNGKey(2), 1, 64, 1, 8)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention_sharded(q, k, v, sp_mesh, "sp") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
