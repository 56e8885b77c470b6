"""Fused qk-RMSNorm+RoPE flash attention (interpret mode) vs the XLA
composition — forward exact, gradients (incl. norm scales) vs autodiff.

In f32 the pipeline's intermediate casts are identity, so fused and XLA
paths must agree to float tolerance on values AND grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qflux_tpu.ops.attention import sdpa_reference
from qflux_tpu.ops.flash_nr import (apply_qk_norm_rope, flash_attention_nr,
                                    supports)

B, S, H, D = 2, 256, 2, 128
ST = 96  # txt/img boundary


def _inputs(key=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 7)
    q, k, v = (jax.random.normal(ks[i], (B, S, H, D), dtype) for i in range(3))
    qs2 = 1.0 + 0.1 * jax.random.normal(ks[3], (2, D), dtype)
    ks2 = 1.0 + 0.1 * jax.random.normal(ks[4], (2, D), dtype)
    ang = jax.random.uniform(ks[5], (S, D // 2), jnp.float32, 0, 6.28)
    cos = jnp.concatenate([jnp.cos(ang)] * 2, -1)
    sin = jnp.concatenate([jnp.sin(ang)] * 2, -1)
    do = jax.random.normal(ks[6], (B, S, H, D), dtype)
    return q, k, v, qs2, ks2, cos, sin, do


def _oracle(q, k, v, qs2, ks2, cos, sin, seg=None):
    qn = apply_qk_norm_rope(q, qs2, cos, sin, ST)
    kn = apply_qk_norm_rope(k, ks2, cos, sin, ST)
    return sdpa_reference(qn, kn, v, segment_ids=seg)


def test_supports_gate():
    assert supports(256, 256, 128)
    assert supports(2560, 2560, 128)
    assert not supports(256, 512, 128)     # cross-attention
    assert not supports(256, 256, 64)      # non-128 head dim
    assert not supports(16384, 16384, 128)  # K exceeds one block


def test_forward_matches_oracle_unmasked():
    q, k, v, qs2, ks2, cos, sin, _ = _inputs()
    out = flash_attention_nr(q, k, v, qs2, ks2, cos, sin, ST)
    ref = _oracle(q, k, v, qs2, ks2, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_forward_matches_oracle_masked():
    q, k, v, qs2, ks2, cos, sin, _ = _inputs(1)
    seg = np.ones((B, S), np.int32)
    seg[0, 230:] = 0
    seg[1, :ST] = 1
    seg[1, ST:] = 2
    seg = jnp.asarray(seg)
    out = flash_attention_nr(q, k, v, qs2, ks2, cos, sin, ST,
                             segment_ids=seg)
    ref = _oracle(q, k, v, qs2, ks2, cos, sin, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    assert np.all(np.asarray(out)[0, 230:] == 0.0)


@pytest.mark.parametrize("masked", [False, True])
def test_gradients_match_autodiff(masked):
    q, k, v, qs2, ks2, cos, sin, do = _inputs(2)
    seg = None
    if masked:
        s = np.ones((B, S), np.int32)
        s[0, 239:] = 0
        seg = jnp.asarray(s)

    def loss_fused(q_, k_, v_, a_, b_):
        return jnp.sum(flash_attention_nr(q_, k_, v_, a_, b_, cos, sin, ST,
                                          segment_ids=seg) * do)

    def loss_ref(q_, k_, v_, a_, b_):
        return jnp.sum(_oracle(q_, k_, v_, a_, b_, cos, sin, seg) * do)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, qs2, ks2)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, qs2, ks2)
    for gf, gr, name in zip(g_f, g_r, ("dq", "dk", "dv", "dqs", "dks")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-3, rtol=2e-3,
                                   err_msg=f"{name} mismatch")


def test_non_block_aligned_seq_pads():
    q, k, v, qs2, ks2, cos, sin, do = _inputs(3)
    q, k, v, do = (x[:, :200] for x in (q, k, v, do))
    cos, sin = cos[:200], sin[:200]
    out = flash_attention_nr(q, k, v, qs2, ks2, cos, sin, ST)
    ref = _oracle(q, k, v, qs2, ks2, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    g = jax.grad(lambda q_: jnp.sum(flash_attention_nr(
        q_, k, v, qs2, ks2, cos, sin, ST) * do))(q)
    g_r = jax.grad(lambda q_: jnp.sum(_oracle(
        q_, k, v, qs2, ks2, cos, sin) * do))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_r), atol=2e-3,
                               rtol=2e-3)


def test_single_stream_boundary_zero():
    """st=0 → every row uses scale row 1 (single-stream blocks pass the same
    scale twice, so either boundary convention works)."""
    q, k, v, qs2, ks2, cos, sin, _ = _inputs(4)
    out0 = flash_attention_nr(q, k, v, qs2, ks2, cos, sin, 0)
    qn = apply_qk_norm_rope(q, qs2, cos, sin, 0)
    kn = apply_qk_norm_rope(k, ks2, cos, sin, 0)
    ref = sdpa_reference(qn, kn, v)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref), atol=3e-5)


# ---------------------------------------------------------------------------
# int8 score GEMM (s_int8=True): quantization noise is bounded, masking and
# gradients stay correct


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def test_s_int8_forward_close_and_masked_rows_zero():
    q, k, v, qs2, ks2, cos, sin, _ = _inputs(5)
    seg = np.ones((B, S), np.int32)
    seg[0, 230:] = 0
    seg = jnp.asarray(seg)
    out = flash_attention_nr(q, k, v, qs2, ks2, cos, sin, ST,
                             segment_ids=seg, s_int8=True)
    ref = _oracle(q, k, v, qs2, ks2, cos, sin, seg)
    assert _rel(out, ref) < 0.03, _rel(out, ref)
    assert np.all(np.asarray(out)[0, 230:] == 0.0)


def test_s_int8_gradients_close_to_autodiff():
    q, k, v, qs2, ks2, cos, sin, do = _inputs(6)

    def loss_fused(q_, k_, v_, a_, b_):
        return jnp.sum(flash_attention_nr(q_, k_, v_, a_, b_, cos, sin, ST,
                                          s_int8=True) * do)

    def loss_ref(q_, k_, v_, a_, b_):
        return jnp.sum(_oracle(q_, k_, v_, a_, b_, cos, sin) * do)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, qs2, ks2)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, qs2, ks2)
    for gf, gr, name in zip(g_f, g_r, ("dq", "dk", "dv", "dqs", "dks")):
        assert _rel(gf, gr) < 0.05, f"{name}: {_rel(gf, gr)}"


def test_s_int8_supports_and_dispatch():
    from qflux_tpu.ops.attention import qk_norm_rope_attention

    assert supports(2560, 2560, 128, s_int8=True)
    # CPU: impl="int8" degrades to the bf16 XLA composition (no int8 kernel)
    q, k, v, qs2, ks2, cos, sin, _ = _inputs(7)
    out = qk_norm_rope_attention(q, k, v, qs2, ks2, cos, sin, ST,
                                 impl="int8")
    ref = _oracle(q, k, v, qs2, ks2, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_folded_layout_matches_legacy(masked, monkeypatch):
    """The folded [B,S,H·D] kernel layout (default) and the legacy
    [B,H,S,D]-transposed layout are the same kernel math over different
    BlockSpec windows — values and every gradient must agree."""
    q, k, v, qs2, ks2, cos, sin, do = _inputs(8)
    seg = None
    if masked:
        s = np.ones((B, S), np.int32)
        s[0, 200:] = 0
        seg = jnp.asarray(s)

    def loss(q_, k_, v_, a_, b_):
        return jnp.sum(flash_attention_nr(q_, k_, v_, a_, b_, cos, sin, ST,
                                          segment_ids=seg) * do)

    monkeypatch.setenv("QFLUX_NR_FOLD", "1")
    out_f = flash_attention_nr(q, k, v, qs2, ks2, cos, sin, ST,
                               segment_ids=seg)
    g_f = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, qs2, ks2)
    monkeypatch.setenv("QFLUX_NR_FOLD", "0")
    out_l = flash_attention_nr(q, k, v, qs2, ks2, cos, sin, ST,
                               segment_ids=seg)
    g_l = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, qs2, ks2)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_l),
                               atol=1e-6)
    for gf, gl, name in zip(g_f, g_l, ("dq", "dk", "dv", "dqs", "dks")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gl), atol=2e-5,
                                   err_msg=name)


def test_fwd_block_upgrade_rules(monkeypatch):
    """Round 5: the forward kernel sizes its block independently of the
    merged backward (fwd=256/bwd=128 at headline shapes under the raised
    scoped-VMEM limit) — pin the selection rules."""
    from qflux_tpu.ops import flash_nr

    # interpret mode counts as "raised": 256 at the headline K block
    assert flash_nr._nr_fwd_block_q(2560, 128) == 256
    # the backward keeps the 13 MiB budget → 128 at the same shape
    assert flash_nr._nr_block_q(2560, 128) == 128

    # without the raised limit there is no upgrade at all
    monkeypatch.setattr(flash_nr, "_interpret", lambda: False)
    import qflux_tpu.runtime.tpu_env as tpu_env
    monkeypatch.setattr(tpu_env, "scoped_vmem_raised", lambda: False)
    assert flash_nr._nr_fwd_block_q(2560, 128) == 128


def test_split_blocks_no_extra_padding():
    """A sequence divisible by 128 but not 256 must keep the backward's
    block for the forward too — upgrading would grow the padded shape and
    flip an unmasked call onto the masked path."""
    s_odd = 384  # 3 × 128 — not divisible by 256
    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    q, k, v = (jax.random.normal(ks[i], (B, s_odd, H, D)) for i in range(3))
    qs2 = 1.0 + 0.1 * jax.random.normal(ks[3], (2, D))
    ks2 = 1.0 + 0.1 * jax.random.normal(ks[4], (2, D))
    ang = jax.random.uniform(ks[5], (s_odd, D // 2), jnp.float32, 0, 6.28)
    cos = jnp.concatenate([jnp.cos(ang)] * 2, -1)
    sin = jnp.concatenate([jnp.sin(ang)] * 2, -1)
    out = flash_attention_nr(q, k, v, qs2, ks2, cos, sin, ST)
    ref = _oracle(q, k, v, qs2, ks2, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
