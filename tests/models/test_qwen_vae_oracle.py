"""Qwen 3D-VAE parity vs the first-party torch Wan-VAE oracle.

The reference consumes diffusers' AutoencoderKLQwenImage as an installed
dependency (reference src/qflux/models/load_model.py:4-14; nothing vendored,
diffusers absent here), so the strongest offline check is an independent
torch implementation of the published Wan 2.1 architecture running the SAME
weights — tests/oracles/wan_vae_stub.py. Crucially the oracle keeps REAL
causal 3D convolutions (front-padded time, full kt-tap contraction) on
[B, C, T, H, W] video, while the JAX port specializes to T=1 by convolving
only the last time tap (qflux_tpu/models/qwen/vae.py:64-72) — these tests
prove that specialization exact, not just plausible.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from qflux_tpu.models.qwen import vae as qvae
from tests.oracles import wan_vae_stub as oracle


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(a) + np.linalg.norm(b) + 1e-12)


def _to_video(img_nhwc):
    """JAX NHWC image batch → torch [B, C, T=1, H, W] single-frame video."""
    x = torch.from_numpy(np.array(img_nhwc))
    return x.permute(0, 3, 1, 2).unsqueeze(2).contiguous()


def _from_video(x):
    """torch [B, C, 1, H, W] → NHWC numpy."""
    return x.squeeze(2).permute(0, 2, 3, 1).detach().numpy()


@pytest.fixture(scope="module", params=["tiny", "deep"])
def vae_pair(request):
    if request.param == "tiny":
        cfg = qvae.QwenVAEConfig.tiny()
    else:
        # full stage count at narrow width: 3 downsamples, channel-changing
        # shortcut convs, 4-stage decoder — the real model's topology
        cfg = qvae.QwenVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2, 4, 4),
                                 num_res_blocks=1,
                                 latents_mean=(0.0,) * 4,
                                 latents_std=(1.0,) * 4)
    params = qvae.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    np_params = jax.tree.map(np.asarray, params)
    return cfg, params, np_params


def test_encoder_matches_oracle(vae_pair):
    cfg, params, np_params = vae_pair
    hw = cfg.downscale * 4
    img = jax.random.normal(jax.random.PRNGKey(1), (2, hw, hw + cfg.downscale, 3))

    moments_jax = qvae.encode_moments(params, cfg, img)

    with torch.no_grad():
        moments_t = oracle.encode_moments(np_params, cfg, _to_video(img))

    err = rel_err(moments_jax, _from_video(moments_t))
    assert err < 5e-6, f"encoder rel err {err:.2e}"


def test_decoder_matches_oracle(vae_pair):
    cfg, params, np_params = vae_pair
    hw = 4
    lat = 0.3 * jax.random.normal(jax.random.PRNGKey(2),
                                  (2, hw, hw + 1, cfg.z_dim))

    out_jax = qvae.decode(params, cfg, lat)

    with torch.no_grad():
        # oracle takes unnormalized z; tiny/deep cfgs use identity stats so
        # qvae.decode's denormalization is a no-op and inputs match exactly
        out_t = oracle.decode(np_params, cfg, _to_video(lat))

    err = rel_err(out_jax, _from_video(out_t))
    assert err < 5e-6, f"decoder rel err {err:.2e}"


def test_latent_stats_applied_once():
    """encode = (mean_moments - latents_mean) / latents_std with the real
    released tables (reference qwen_image_edit_trainer.py:863-889)."""
    cfg = qvae.QwenVAEConfig(base_dim=8, z_dim=16, dim_mult=(1, 2),
                             num_res_blocks=1)
    params = qvae.init(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    img = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 3))
    moments = qvae.encode_moments(params, cfg, img)
    lat = qvae.encode(params, cfg, img)
    mu = np.asarray(cfg.latents_mean)
    std = np.asarray(cfg.latents_std)
    expect = (np.asarray(moments)[..., :16] - mu) / std
    np.testing.assert_allclose(np.asarray(lat), expect, rtol=1e-6, atol=1e-6)
