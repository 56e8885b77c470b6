"""Flash-attention kernel (interpret mode on CPU) vs the XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qflux_tpu.ops.attention import sdpa_reference
from qflux_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, b, s, h, d, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    shape = (b, s, h, d)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


def test_flash_matches_sdpa_full():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, 256, 2, 64)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_sdpa_segments():
    key = jax.random.PRNGKey(1)
    q, k, v = _rand_qkv(key, 2, 256, 2, 64)
    seg = np.ones((2, 256), np.int32)
    seg[0, 200:] = 0          # padding on sample 0
    seg[1, :128] = 1
    seg[1, 128:] = 2          # two segments on sample 1
    seg = jnp.asarray(seg)
    out = flash_attention(q, k, v, segment_ids=seg, block_q=128, block_k=128)
    ref = sdpa_reference(q, k, v, segment_ids=seg)
    valid = np.asarray(seg) != 0
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], atol=2e-5
    )


def test_flash_pads_non_multiple_seq():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 200, 2, 64)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_gradients_match_xla():
    key = jax.random.PRNGKey(3)
    q, k, v = _rand_qkv(key, 1, 256, 2, 64)
    seg = np.ones((1, 256), np.int32)
    seg[0, 224:] = 0
    seg = jnp.asarray(seg)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, segment_ids=seg, block_q=128, block_k=128)
        return jnp.sum((o * (seg[..., None, None] != 0)) ** 2)

    def loss_ref(q, k, v):
        o = sdpa_reference(q, k, v, segment_ids=seg)
        return jnp.sum((o * (seg[..., None, None] != 0)) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_masked_rows_zero_and_grads_clean_without_cotangent_masking():
    """Regression (found on-chip, round 3): with real padding (segment id 0
    on live rows) and an UNMASKED loss — nonzero cotangents on padded rows —
    the backward recompute p = exp(s - lse) used to give p = 1 across
    fully-masked rows (s ≡ lse ≡ NEG_INF in f32), a ~S× overweight that
    leaked into dk/dv of VALID keys. Both impls must now (a) output exactly
    0 on fully-masked rows, (b) produce matching grads everywhere even when
    the caller does NOT zero padded-row cotangents."""
    key = jax.random.PRNGKey(5)
    q, k, v = _rand_qkv(key, 1, 256, 2, 64)
    do = jax.random.normal(jax.random.PRNGKey(6), q.shape, q.dtype)
    seg = np.ones((1, 256), np.int32)
    seg[0, 239:] = 0  # real (non-block-aligned) padding
    seg = jnp.asarray(seg)

    out_f = flash_attention(q, k, v, segment_ids=seg, block_q=128, block_k=128)
    out_r = sdpa_reference(q, k, v, segment_ids=seg)
    pad = np.asarray(seg)[0] == 0
    assert np.all(np.asarray(out_f)[:, pad] == 0.0), "flash padded rows must be 0"
    assert np.all(np.asarray(out_r)[:, pad] == 0.0), "sdpa padded rows must be 0"
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), atol=2e-5)

    def loss(fn):
        # deliberately NO (seg != 0) factor on the output
        return lambda q_, k_, v_: jnp.sum(
            fn(q_, k_, v_, segment_ids=seg) * do)

    g_f = jax.grad(loss(lambda *a, **kw: flash_attention(
        *a, block_q=128, block_k=128, **kw)), argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss(sdpa_reference), argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_f, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-4,
                                   err_msg=f"d{name} mismatch")
        assert np.isfinite(np.asarray(gf)).all()
    # grads w.r.t. padded q rows are exactly zero (their output is constant 0)
    assert np.all(np.asarray(g_f[0])[:, pad] == 0.0)


def test_flash_bf16_close():
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 1, 256, 2, 64, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    ref = sdpa_reference(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref), atol=2e-2)


def test_merged_backward_gradients_match_xla():
    """block_k == S routes the backward through the merged dq+dk+dv kernel
    (_dqdkv_kernel) — the headline path. Grads must match XLA, masked and
    unmasked, including nonzero cotangents on padded rows."""
    from qflux_tpu.ops.flash_attention import _merged_bwd_block_q

    assert _merged_bwd_block_q(256, 64) is not None  # gate really opens
    key = jax.random.PRNGKey(7)
    q, k, v = _rand_qkv(key, 2, 256, 2, 64)
    do = jax.random.normal(jax.random.PRNGKey(8), q.shape, q.dtype)
    seg = np.ones((2, 256), np.int32)
    seg[0, 230:] = 0
    seg[1, :100] = 1
    seg[1, 100:] = 2
    seg = jnp.asarray(seg)

    for kw in ({}, {"segment_ids": seg}):
        g_f = jax.grad(lambda q_, k_, v_: jnp.sum(flash_attention(
            q_, k_, v_, block_q=128, block_k=256, **kw) * do),
            argnums=(0, 1, 2))(q, k, v)
        g_r = jax.grad(lambda q_, k_, v_: jnp.sum(
            sdpa_reference(q_, k_, v_, **kw) * do), argnums=(0, 1, 2))(q, k, v)
        for gf, gr, name in zip(g_f, g_r, "qkv"):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=5e-4, err_msg=f"d{name} mismatch")


def test_merged_bwd_block_q_budget():
    from qflux_tpu.ops.flash_attention import (MERGED_BWD_VMEM_BUDGET,
                                               _merged_bwd_block_q)

    assert _merged_bwd_block_q(2560, 128) == 256   # headline shape
    assert _merged_bwd_block_q(4096, 128) == 128   # fits only at bq=128
    assert _merged_bwd_block_q(8192, 128) is None  # falls back to split
    for sk in (2560, 4096):
        bq = _merged_bwd_block_q(sk, 128)
        assert 8 * bq * sk + 16 * sk * 128 + 8 * bq * 128 <= MERGED_BWD_VMEM_BUDGET


def test_bwd_block_k_divides_and_respects_cap():
    """The backward re-chunking rule must always produce a 128-multiple that
    divides the padded sequence and stays under the Mosaic compile boundary
    (bk=4096 fails on v5e; 3968 verified working)."""
    from qflux_tpu.ops.flash_attention import BLOCK_K_CAP_BWD, _bwd_block_k

    for sk in (128, 2560, 3968, 4096, 4352, 8704, 128 * 31, 128 * 62):
        bk = _bwd_block_k(sk)
        assert sk % bk == 0 and bk % 128 == 0, (sk, bk)
        if sk > BLOCK_K_CAP_BWD:
            assert bk <= BLOCK_K_CAP_BWD, (sk, bk)
