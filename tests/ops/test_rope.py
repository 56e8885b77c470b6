import jax.numpy as jnp
import numpy as np
import torch

from qflux_tpu.ops.rope import (
    apply_rope,
    dreamomni2_control_ids,
    flux_image_ids,
    qwen_rope,
    qwen_video_coords,
    rope_from_coords,
)


def _torch_rope_oracle(pos: np.ndarray, dim: int, theta: float = 10000.0):
    """Independent torch oracle for diffusers get_1d_rotary_pos_embed with
    use_real=True, repeat_interleave_real=True (float64 freqs)."""
    pos_t = torch.from_numpy(pos).double()
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2).double() / dim))
    args = torch.outer(pos_t, freqs)
    cos = args.cos().repeat_interleave(2, dim=-1)
    sin = args.sin().repeat_interleave(2, dim=-1)
    return cos.float().numpy(), sin.float().numpy()


def test_rope_matches_diffusers_convention():
    pos = np.array([0.0, 1.0, 5.0, -3.0, 100.0], dtype=np.float32)
    coords = jnp.asarray(pos)[:, None]
    cos, sin = rope_from_coords(coords, (16,), layout="interleaved")
    ocos, osin = _torch_rope_oracle(pos, 16)
    np.testing.assert_allclose(np.asarray(cos), ocos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), osin, atol=1e-5)


def test_rope_multi_axis_concat():
    coords = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)).astype(np.float32) * 10)
    cos, sin = rope_from_coords(coords, (16, 56, 56), layout="interleaved")
    assert cos.shape == (7, 128)
    # each axis segment equals single-axis computation
    c0, _ = rope_from_coords(coords[:, :1], (16,), layout="interleaved")
    np.testing.assert_allclose(np.asarray(cos[:, :16]), np.asarray(c0), atol=1e-6)
    # half layout: same values, permuted
    from qflux_tpu.ops.rope import interleaved_to_half_perm
    ch, _ = rope_from_coords(coords, (16, 56, 56), layout="half")
    np.testing.assert_allclose(np.asarray(cos)[:, interleaved_to_half_perm(128)],
                               np.asarray(ch), atol=1e-6)


def test_apply_rope_is_norm_preserving_and_relative():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 16)).astype(np.float32))  # [B, H, S, D]
    coords = jnp.asarray(np.arange(4, dtype=np.float32))[:, None]
    cos, sin = rope_from_coords(coords, (16,))
    y = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1), np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5
    )
    # relative property: <R(p)q, R(k)v> depends only on p-k
    q = jnp.asarray(rng.normal(size=(1, 1, 1, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 1, 1, 16)).astype(np.float32))

    def dot_at(p, k):
        cq, sq_ = rope_from_coords(jnp.array([[p]], dtype=jnp.float32), (16,))
        ck, sk = rope_from_coords(jnp.array([[k]], dtype=jnp.float32), (16,))
        return float(jnp.sum(apply_rope(q, cq, sq_) * apply_rope(v, ck, sk)))

    assert np.isclose(dot_at(3.0, 1.0), dot_at(7.0, 5.0), atol=1e-4)


def test_flux_ids_layout():
    ids = flux_image_ids(2, 3, set_id=1)
    assert ids.shape == (6, 3)
    assert (ids[:, 0] == 1).all()
    assert ids[4].tolist() == [1.0, 1.0, 1.0]  # row 1, col 1


def test_dreamomni2_cumulative_offsets():
    ids = dreamomni2_control_ids([(2, 2), (2, 2)])
    assert ids.shape == (8, 3)
    # second image offset by (2, 2), set id 2
    assert ids[4].tolist() == [2.0, 2.0, 2.0]
    assert ids[7].tolist() == [2.0, 3.0, 3.0]


def test_qwen_scale_rope_centering():
    coords = qwen_video_coords(1, 4, 6, idx=0, scale_rope=True)
    hs = coords[:, 1].reshape(4, 6)
    assert hs[:, 0].tolist() == [-2.0, -1.0, 0.0, 1.0]
    ws = coords[:, 2].reshape(4, 6)
    assert ws[0].tolist() == [-3.0, -2.0, -1.0, 0.0, 1.0, 2.0]


def test_qwen_rope_shapes_and_txt_offset():
    vc, vs, tc, ts = qwen_rope([(1, 4, 6), (1, 4, 6)], txt_seq_len=5, axes_dim=(4, 6, 6))
    assert vc.shape == (48, 16)
    assert tc.shape == (5, 16)
    # txt token 0 sits at max(h//2, w//2) = 3 on every axis
    expect, _ = rope_from_coords(jnp.full((1, 3), 3.0), (4, 6, 6))
    np.testing.assert_allclose(np.asarray(tc[0]), np.asarray(expect[0]), atol=1e-6)
