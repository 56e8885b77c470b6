"""Model-config inspection: dump / compare configurations across model
families (reference utils/get_model_config.py:13-135)."""

from __future__ import annotations

import dataclasses
import json
from typing import Any

KNOWN_CONFIGS = {
    "flux-kontext": "qflux_tpu.models.flux.transformer.FluxConfig",
    "flux-vae": "qflux_tpu.models.flux.vae.VAEConfig",
    "clip-text": "qflux_tpu.models.flux.text_encoders.CLIPTextConfig",
    "t5": "qflux_tpu.models.flux.text_encoders.T5Config",
    "qwen-image": "qflux_tpu.models.qwen.transformer.QwenImageConfig",
    "qwen-vae": "qflux_tpu.models.qwen.vae.QwenVAEConfig",
    "qwen-vl-vision": "qflux_tpu.models.qwen.vl_encoder.VLVisionConfig",
    "qwen-vl-text": "qflux_tpu.models.qwen.vl_encoder.VLTextConfig",
    "qwen3": "qflux_tpu.models.flux2.text_encoder.Qwen3Config",
}


def get_model_config(name: str) -> dict[str, Any]:
    from qflux_tpu.utils.instantiate import resolve_symbol

    if name not in KNOWN_CONFIGS:
        raise KeyError(f"unknown model config {name!r}; known: {sorted(KNOWN_CONFIGS)}")
    cls = resolve_symbol(KNOWN_CONFIGS[name])
    return dataclasses.asdict(cls())


def dump_model_config(name: str) -> str:
    return json.dumps(get_model_config(name), indent=2, default=str)


def compare_model_configs(name_a: str, name_b: str) -> dict[str, tuple]:
    """Field-level diff of two model configs (shared keys with differing
    values + keys unique to each)."""
    a, b = get_model_config(name_a), get_model_config(name_b)
    out: dict[str, tuple] = {}
    for k in sorted(set(a) | set(b)):
        va, vb = a.get(k, "<absent>"), b.get(k, "<absent>")
        if va != vb:
            out[k] = (va, vb)
    return out
