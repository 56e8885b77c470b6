"""Flux2-Klein converter validation: topology derived from config.json and
coverage auditing of checkpoint tensors (round-1 weak item: klein layer
counts were asserted, not derived; renamed keys could silently stay random)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from qflux_tpu.models.porting import (
    convert_flux_transformer,
    convert_with_coverage,
)
from qflux_tpu.trainer.flux2_klein import flux2_config, flux2_config_from_json


def _synth_flux2_sd(cfg):
    """Diffusers-named state dict with the full key inventory the converter
    expects for a FLUX.2-style (no pooled text) transformer."""
    d = cfg.dim
    hid = int(d * cfg.mlp_ratio)
    rng = np.random.default_rng(0)

    def lin(i, o, bias=True):
        out = {"weight": rng.normal(0, 0.02, (o, i)).astype(np.float32)}
        if bias:
            out["bias"] = np.zeros(o, np.float32)
        return out

    sd = {}

    def put(name, p):
        for k, v in p.items():
            sd[f"{name}.{k}"] = v

    put("x_embedder", lin(cfg.in_channels, d))
    put("context_embedder", lin(cfg.joint_attention_dim, d))
    put("time_text_embed.timestep_embedder.linear_1", lin(256, d))
    put("time_text_embed.timestep_embedder.linear_2", lin(d, d))
    put("time_text_embed.guidance_embedder.linear_1", lin(256, d))
    put("time_text_embed.guidance_embedder.linear_2", lin(d, d))
    put("norm_out.linear", lin(d, 2 * d))
    put("proj_out", lin(d, cfg.patch_size ** 2 * cfg.out_channels))
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        put(f"{b}.norm1.linear", lin(d, 6 * d))
        put(f"{b}.norm1_context.linear", lin(d, 6 * d))
        for proj in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            put(f"{b}.attn.{proj}", lin(d, d))
        put(f"{b}.attn.to_out.0", lin(d, d))
        put(f"{b}.attn.to_add_out", lin(d, d))
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{b}.attn.{n}.weight"] = np.ones(cfg.attention_head_dim, np.float32)
        put(f"{b}.ff.net.0.proj", lin(d, hid))
        put(f"{b}.ff.net.2", lin(hid, d))
        put(f"{b}.ff_context.net.0.proj", lin(d, hid))
        put(f"{b}.ff_context.net.2", lin(hid, d))
    for i in range(cfg.num_single_layers):
        b = f"single_transformer_blocks.{i}"
        put(f"{b}.norm.linear", lin(d, 3 * d))
        for proj in ("to_q", "to_k", "to_v"):
            put(f"{b}.attn.{proj}", lin(d, d))
        for n in ("norm_q", "norm_k"):
            sd[f"{b}.attn.{n}.weight"] = np.ones(cfg.attention_head_dim, np.float32)
        put(f"{b}.proj_mlp", lin(d, hid))
        put(f"{b}.proj_out", lin(d + hid, d))
    return sd


TINY = dict(num_layers=2, num_single_layers=3, attention_head_dim=16,
            num_attention_heads=2, joint_attention_dim=24, in_channels=8,
            out_channels=8, axes_dims_rope=(4, 4, 4, 4))


def test_config_from_json(tmp_path):
    cfg_json = tmp_path / "config.json"
    cfg_json.write_text(json.dumps({
        "_class_name": "Flux2Transformer2DModel", **TINY,
        "axes_dims_rope": [4, 4, 4, 4], "patch_size": 1,
        "guidance_embeds": True}))
    cfg = flux2_config_from_json(cfg_json)
    assert cfg.num_layers == 2 and cfg.num_single_layers == 3
    assert cfg.attention_head_dim == 16 and cfg.axes_dims_rope == (4, 4, 4, 4)
    assert cfg.pooled_projection_dim == 0  # klein default preserved


def test_full_coverage_roundtrip():
    cfg = flux2_config(**TINY)
    sd = _synth_flux2_sd(cfg)
    tree, unconsumed = convert_with_coverage(
        convert_flux_transformer, sd, cfg.num_layers, cfg.num_single_layers,
        head_dim=cfg.attention_head_dim, strict=True)
    assert unconsumed == []
    assert "pooled_in" not in tree  # no pooled text path on FLUX.2
    assert tree["dual"]["attn"]["to_q"]["kernel"].shape == (2, cfg.dim, cfg.dim)
    # and the converted tree actually runs
    import jax
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.trainer.flux2_klein import latent_ids_4d

    params = jax.tree.map(jnp.asarray, tree)
    ids = jnp.asarray(latent_ids_4d(2, 2))
    out = flux.forward(params, cfg,
                       jnp.zeros((1, 4, cfg.in_channels)),
                       jnp.zeros((1, 3, cfg.joint_attention_dim)),
                       None, jnp.asarray([0.5]), ids,
                       jnp.zeros((3, 4)), guidance=jnp.asarray([1.0]),
                       remat=False, attn_impl="xla")
    assert out.shape == (1, 4, cfg.out_channels)


def test_unconsumed_key_raises_in_strict_mode():
    cfg = flux2_config(**TINY)
    sd = _synth_flux2_sd(cfg)
    sd["transformer_blocks.0.attn.to_q.lora_magnitude"] = np.zeros(4, np.float32)
    with pytest.raises(ValueError, match="NOT consumed"):
        convert_with_coverage(convert_flux_transformer, sd, cfg.num_layers,
                              cfg.num_single_layers,
                              head_dim=cfg.attention_head_dim, strict=True)


def test_missing_key_raises():
    cfg = flux2_config(**TINY)
    sd = _synth_flux2_sd(cfg)
    del sd["transformer_blocks.1.attn.to_k.weight"]
    with pytest.raises(KeyError):
        convert_with_coverage(convert_flux_transformer, sd, cfg.num_layers,
                              cfg.num_single_layers,
                              head_dim=cfg.attention_head_dim, strict=True)


def test_unknown_architecture_key_refused(tmp_path, monkeypatch):
    """An unconsumed config.json architecture knob must be a hard error —
    loading weights into math that ignores it would be silently wrong
    (docs/PARITY.md Flux2-Klein audit)."""
    cfg_json = tmp_path / "config.json"
    cfg_json.write_text(json.dumps({
        "_class_name": "Flux2Transformer2DModel", **TINY,
        "patch_size": 1, "parallel_blocks": True}))
    with pytest.raises(ValueError, match="parallel_blocks"):
        flux2_config_from_json(cfg_json)
    monkeypatch.setenv("QFLUX_FLUX2_ALLOW_UNKNOWN", "1")
    cfg = flux2_config_from_json(cfg_json)  # downgraded to a warning
    assert cfg.num_layers == 2
