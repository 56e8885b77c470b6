"""DiT forward parity vs the reference's vendored torch modules — NEVER skipped.

Fixtures in tests/fixtures/dit_goldens/ were captured by
scripts/capture_dit_goldens.py: the reference's vendored torch transformers
(reference src/qflux/models/transformer_flux.py, transformer_qwenimage.py; the
exact classes that load the real checkpoints) run at tiny width on random
weights, with inputs/outputs/state_dict saved. Here the same state_dict goes
through the production weight converters and the JAX forward must reproduce
the torch output — the offline tier of the real-weights parity runbook
(docs/PARITY.md); the checkpoint-gated tier (tests/models/
test_real_weight_parity.py) stays for real weights.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = Path(__file__).parent.parent / "fixtures" / "dit_goldens"


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(a) + np.linalg.norm(b) + 1e-12)


def _load(name):
    z = np.load(FIXTURES / name)
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd.")}
    inputs = {k[3:]: z[k] for k in z.files if k.startswith("in.")}
    return inputs, z["out"], sd


def test_flux_forward_matches_torch_oracle():
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.models.porting import convert_flux_transformer, convert_with_coverage

    inputs, out_ref, sd = _load("flux_tiny.npz")
    cfg = flux.FluxConfig.tiny()
    params, unconsumed = convert_with_coverage(
        convert_flux_transformer, sd, num_layers=cfg.num_layers,
        num_single_layers=cfg.num_single_layers, head_dim=cfg.attention_head_dim,
        strict=True)
    assert not unconsumed

    out = flux.forward(
        params, cfg,
        jnp.asarray(inputs["hidden_states"]),
        jnp.asarray(inputs["encoder_hidden_states"]),
        jnp.asarray(inputs["pooled_projections"]),
        jnp.asarray(inputs["timestep"]),
        jnp.asarray(inputs["img_ids"]),
        jnp.asarray(inputs["txt_ids"]),
        guidance=jnp.asarray(inputs["guidance"]),
        remat=False)
    assert out.shape == out_ref.shape
    err = _rel_err(out, out_ref)
    assert err < 2e-5, f"FLUX DiT forward diverges from torch oracle: rel err {err:.2e}"


def test_qwen_forward_matches_torch_oracle():
    from qflux_tpu.models.qwen import transformer as qwen
    from qflux_tpu.models.porting import convert_with_coverage
    from qflux_tpu.models.qwen.porting import convert_qwen_image_transformer

    inputs, out_ref, sd = _load("qwen_tiny.npz")
    cfg = qwen.QwenImageConfig.tiny()
    params, unconsumed = convert_with_coverage(
        convert_qwen_image_transformer, sd, num_layers=cfg.num_layers,
        head_dim=cfg.attention_head_dim, strict=True)
    assert not unconsumed

    img_shapes = [tuple(int(v) for v in row) for row in inputs["img_shapes"]]
    out = qwen.forward(
        params, cfg,
        jnp.asarray(inputs["hidden_states"]),
        jnp.asarray(inputs["encoder_hidden_states"]),
        jnp.asarray(inputs["timestep"]),
        img_shapes,
        remat=False)
    assert out.shape == out_ref.shape
    err = _rel_err(out, out_ref)
    assert err < 2e-5, f"Qwen DiT forward diverges from torch oracle: rel err {err:.2e}"


@pytest.mark.parametrize("name", ["flux_tiny.npz", "qwen_tiny.npz"])
def test_fixture_present_and_wellformed(name):
    inputs, out, sd = _load(name)
    assert out.ndim == 3 and len(sd) > 50 and inputs
