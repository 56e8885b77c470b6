"""Rotate-half rope layout: equivalence with the torch interleaved convention
after the q/k weight permutation, and LoRA import/export permutation
consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.ops.rope import (
    apply_rope,
    half_to_interleaved_perm,
    interleaved_to_half_perm,
    rope_from_coords,
)


def test_perms_are_inverses():
    for d in (8, 16, 128):
        p = interleaved_to_half_perm(d)
        inv = half_to_interleaved_perm(d)
        np.testing.assert_array_equal(p[inv], np.arange(d))
        np.testing.assert_array_equal(inv[p], np.arange(d))


def test_half_layout_rotation_equivalent():
    """rope(half)(x[perm]) == rope(interleaved)(x)[perm] — so permuting q/k
    weights preserves dot products exactly."""
    rng = np.random.default_rng(0)
    d = 16
    coords = jnp.asarray(rng.normal(size=(5, 2)).astype(np.float32) * 3)
    axes = (4, 12)
    x = jnp.asarray(rng.normal(size=(5, d)).astype(np.float32))
    perm = interleaved_to_half_perm(d)

    cos_i, sin_i = rope_from_coords(coords, axes, layout="interleaved")
    cos_h, sin_h = rope_from_coords(coords, axes, layout="half")
    # the half cos/sin are the permutation of the interleaved ones
    np.testing.assert_allclose(np.asarray(cos_i)[:, perm], np.asarray(cos_h), atol=1e-6)

    y_i = apply_rope(x, cos_i, sin_i, layout="interleaved")
    y_h = apply_rope(x[:, perm], cos_h, sin_h, layout="half")
    np.testing.assert_allclose(np.asarray(y_i)[:, perm], np.asarray(y_h), atol=1e-6)

    # dot products between rotated q/k are identical in both layouts
    q2 = jnp.asarray(rng.normal(size=(5, d)).astype(np.float32))
    qi = apply_rope(q2, cos_i, sin_i, layout="interleaved")
    qh = apply_rope(q2[:, perm], cos_h, sin_h, layout="half")
    np.testing.assert_allclose(np.asarray((y_i * qi).sum(-1)),
                               np.asarray((y_h * qh).sum(-1)), atol=1e-5)


def test_ported_model_equivalent_to_interleaved_reference():
    """A synthetic torch-layout checkpoint run through the converter (which
    permutes q/k) must produce the same outputs as an explicit interleaved-
    convention computation of one attention block."""
    rng = np.random.default_rng(1)
    d_model, n_h, dh = 32, 2, 16
    s = 6
    wq = rng.normal(size=(d_model, d_model)).astype(np.float32) * 0.1
    wk = rng.normal(size=(d_model, d_model)).astype(np.float32) * 0.1
    x = jnp.asarray(rng.normal(size=(1, s, d_model)).astype(np.float32))
    coords = jnp.asarray(np.arange(s, dtype=np.float32))[:, None].repeat(2, 1)
    axes = (8, 8)

    def heads(y):
        return y.reshape(1, s, n_h, dh)

    # torch-convention: interleaved rope on unpermuted projections
    ci, si = rope_from_coords(coords, axes, layout="interleaved")
    q_ref = apply_rope(heads(x @ wq), ci[None, :, None, :], si[None, :, None, :],
                       layout="interleaved")
    k_ref = apply_rope(heads(x @ wk), ci[None, :, None, :], si[None, :, None, :],
                       layout="interleaved")
    logits_ref = jnp.einsum("bqhd,bkhd->bhqk", q_ref, k_ref)

    # ours: permuted weights + half rope
    from qflux_tpu.models.porting import _permute_qk

    wq_p = _permute_qk({"kernel": wq}, dh)["kernel"]
    wk_p = _permute_qk({"kernel": wk}, dh)["kernel"]
    ch, sh = rope_from_coords(coords, axes, layout="half")
    q_h = apply_rope(heads(x @ wq_p), ch[None, :, None, :], sh[None, :, None, :],
                     layout="half")
    k_h = apply_rope(heads(x @ wk_p), ch[None, :, None, :], sh[None, :, None, :],
                     layout="half")
    logits_h = jnp.einsum("bqhd,bkhd->bhqk", q_h, k_h)
    np.testing.assert_allclose(np.asarray(logits_ref), np.asarray(logits_h), atol=1e-5)


def test_lora_qk_permutation_roundtrip(tmp_path):
    """export→import through the diffusers format is the identity for q/k
    lora B matrices (permutation + inverse)."""
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.utils.lora_io import export_lora, import_lora

    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lora = build_lora_tree(jax.random.PRNGKey(1), params,
                           [r"attn/(to_q|to_k|to_v)"], rank=4, alpha=4)
    # randomize b (zeros at init; constants would hide the permutation)
    lora = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(int(x.size) % 97), x.shape)
        if x.ndim >= 2 else x, lora)
    flat = export_lora(lora, head_dim=cfg.attention_head_dim)
    back = import_lora(flat, head_dim=cfg.attention_head_dim)
    for path in [("dual", "attn", "to_q"), ("dual", "attn", "to_k"),
                 ("dual", "attn", "to_v")]:
        orig, imp = lora, back
        for p in path:
            orig, imp = orig[p], imp[p]
        np.testing.assert_allclose(np.asarray(orig["b"]), imp["b"], atol=1e-6, err_msg=str(path))
    # and the exported (torch-layout) B differs from ours for q/k but not v
    b_ours = np.asarray(lora["dual"]["attn"]["to_q"]["b"][0])
    b_torch = flat["transformer.transformer_blocks.0.attn.to_q.lora_B.weight"].T
    assert not np.allclose(b_ours, b_torch)
    b_ours_v = np.asarray(lora["dual"]["attn"]["to_v"]["b"][0])
    b_torch_v = flat["transformer.transformer_blocks.0.attn.to_v.lora_B.weight"].T
    np.testing.assert_allclose(b_ours_v, b_torch_v)
