"""Qwen-Image DiT + 3D VAE shape/consistency tests."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.models.qwen import transformer as qdit
from qflux_tpu.models.qwen import vae as qvae


@pytest.fixture(scope="module")
def tiny_dit():
    cfg = qdit.QwenImageConfig.tiny()
    params = qdit.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def _inputs(cfg, b=2, grid=(4, 6), txt_len=7, ctrl_grid=None):
    s_img = grid[0] * grid[1]
    shapes = [(1, grid[0], grid[1])]
    if ctrl_grid:
        s_img += ctrl_grid[0] * ctrl_grid[1]
        shapes.append((1, ctrl_grid[0], ctrl_grid[1]))
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    img = jax.random.normal(ks[0], (b, s_img, cfg.in_channels))
    txt = jax.random.normal(ks[1], (b, txt_len, cfg.joint_attention_dim))
    return img, txt, shapes


def test_forward_shapes(tiny_dit):
    cfg, params = tiny_dit
    img, txt, shapes = _inputs(cfg, ctrl_grid=(4, 6))
    out = qdit.forward(params, cfg, img, txt, jnp.full((2,), 0.4), shapes, remat=False)
    assert out.shape == (2, img.shape[1], cfg.patch_size ** 2 * cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_text_padding_invariance(tiny_dit):
    """Padding the text stream (with segment masking) must not change image
    outputs — the multi-res invariant for the joint attention."""
    cfg, params = tiny_dit
    img, txt, shapes = _inputs(cfg, b=1, txt_len=5)
    t = jnp.full((1,), 0.7)
    out_ref = qdit.forward(params, cfg, img, txt, t, shapes, remat=False)

    pad = 3
    txt_p = jnp.pad(txt, ((0, 0), (0, pad), (0, 0)))
    seg = jnp.asarray(np.concatenate([
        np.ones((1, 5), np.int32), np.zeros((1, pad), np.int32),
        np.ones((1, img.shape[1]), np.int32)], axis=1))
    out_pad = qdit.forward(params, cfg, img, txt_p, t, shapes,
                           segment_ids=seg, remat=False)
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_ref), atol=2e-4)


def test_scale_rope_shifts_text_offset(tiny_dit):
    cfg, params = tiny_dit
    img, txt, shapes = _inputs(cfg)
    t = jnp.full((2,), 0.5)
    o1 = qdit.forward(params, cfg, img, txt, t, shapes, remat=False)
    cfg2 = dataclasses.replace(cfg, scale_rope=False)
    o2 = qdit.forward(params, cfg2, img, txt, t, shapes, remat=False)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-5


def test_qwen_vae_roundtrip_shapes():
    cfg = qvae.QwenVAEConfig.tiny()
    params = qvae.init(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 24, 3))
    lat = qvae.encode(params, cfg, img)
    assert lat.shape == (2, 8, 12, cfg.z_dim)  # one downsample stage in tiny
    out = qvae.decode(params, cfg, lat)
    assert out.shape == (2, 16, 24, 3)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(qvae.encode(params, cfg, img)))


def test_qwen_vae_latent_normalization():
    cfg = qvae.QwenVAEConfig.tiny()
    params = qvae.init(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    # with mean=0 std=1 (tiny), encode == raw moments mean part
    moments = qvae.encode_moments(params, cfg, img)
    lat = qvae.encode(params, cfg, img)
    np.testing.assert_allclose(np.asarray(moments[..., :cfg.z_dim]), np.asarray(lat),
                               atol=1e-6)
