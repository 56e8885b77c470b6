import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.models.flux import transformer as flux
from qflux_tpu.ops.layers import build_lora_tree, dense, merge_lora
from qflux_tpu.utils.lora_io import (
    classify_lora_weight,
    export_lora,
    flux_module_name,
    flux_tree_path,
    import_lora,
    load_lora_safetensors,
    save_lora_safetensors,
)


def test_module_name_roundtrip():
    cases = [
        (("dual", "attn", "to_q"), 3, "transformer_blocks.3.attn.to_q"),
        (("dual", "attn", "add_out"), 0, "transformer_blocks.0.attn.to_add_out"),
        (("dual", "img_mlp", "in"), 7, "transformer_blocks.7.ff.net.0.proj"),
        (("single", "proj_mlp"), 11, "single_transformer_blocks.11.proj_mlp"),
        (("single", "mod", "proj"), 2, "single_transformer_blocks.2.norm.linear"),
    ]
    for path, layer, name in cases:
        assert flux_module_name(path, layer) == name
        back_path, back_layer = flux_tree_path(name)
        assert back_path == path and back_layer == layer


def test_export_import_roundtrip():
    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lora = build_lora_tree(jax.random.PRNGKey(1), params,
                           [r"attn/(to_q|add_v)", r"img_mlp/in"], rank=4, alpha=8)
    flat = export_lora(lora)
    assert classify_lora_weight(flat) == "diffusers"
    # expected key shapes: lora_A [r, in]
    a_key = "transformer.transformer_blocks.0.attn.to_q.lora_A.weight"
    assert flat[a_key].shape == (4, cfg.dim)
    assert float(flat["transformer.transformer_blocks.0.attn.to_q.alpha"]) == 8.0

    back = import_lora(flat)
    for path in [("dual", "attn", "to_q"), ("dual", "attn", "add_v"), ("dual", "img_mlp", "in")]:
        orig = lora
        imp = back
        for p in path:
            orig, imp = orig[p], imp[p]
        np.testing.assert_allclose(np.asarray(orig["a"]), imp["a"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(orig["b"]), imp["b"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(orig["scaling"]), imp["scaling"], atol=1e-6)


def test_save_load_file(tmp_path):
    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lora = build_lora_tree(jax.random.PRNGKey(1), params, [r"attn/to_q"], rank=2, alpha=2)
    p = save_lora_safetensors(lora, tmp_path)
    assert p.name == "pytorch_lora_weights.safetensors"
    back = load_lora_safetensors(tmp_path)
    out = merge_lora(params, jax.tree.map(jnp.asarray, back))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, cfg.dim))
    node0 = jax.tree.map(lambda v: v[0], out["dual"]["attn"]["to_q"])  # layer 0 slice
    y1 = dense(node0, x)  # runs with imported lora merged
    assert np.isfinite(np.asarray(y1)).all()


def test_peft_format_import():
    """PEFT-prefixed keys classify and import (reference
    utils/lora_utils.py:12-22 classification)."""
    rng = np.random.default_rng(0)
    sd = {
        "base_model.model.transformer_blocks.0.attn.to_q.lora_A.weight":
            rng.normal(size=(4, 16)).astype(np.float32),
        "base_model.model.transformer_blocks.0.attn.to_q.lora_B.weight":
            rng.normal(size=(16, 4)).astype(np.float32),
    }
    assert classify_lora_weight(sd) == "peft"
    tree = import_lora(sd)
    node = tree["dual"]["attn"]["to_q"]
    assert node["a"].shape == (1, 16, 4)  # stacked single layer
    assert float(node["scaling"][0]) == 1.0  # no alpha → alpha=r


def test_lora_math_matches_torch_peft_semantics():
    """y = Wx + (alpha/r)·B(Ax) — verify our dense+lora against an explicit
    torch computation with the exported matrices."""
    import torch

    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lora = build_lora_tree(jax.random.PRNGKey(5), params, [r"attn/to_q"], rank=4, alpha=8)
    # give b real values
    lora = jax.tree.map(lambda x: x + 0.02 if x.ndim >= 2 else x, lora)
    merged = merge_lora(params, lora)

    node = merged["dual"]["attn"]["to_q"]
    x = np.random.default_rng(1).normal(size=(3, cfg.dim)).astype(np.float32)
    y = dense({k: jax.tree.map(lambda v: v[0], v) if k in ("lora",) else v[0]
               for k, v in node.items()}, jnp.asarray(x))

    W = torch.from_numpy(np.asarray(node["kernel"][0]))
    bias = torch.from_numpy(np.asarray(node["bias"][0]))
    A = torch.from_numpy(np.asarray(lora["dual"]["attn"]["to_q"]["a"][0]))
    B = torch.from_numpy(np.asarray(lora["dual"]["attn"]["to_q"]["b"][0]))
    xt = torch.from_numpy(x)
    ref = xt @ W + bias + (8 / 4) * ((xt @ A) @ B)
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=2e-5)
