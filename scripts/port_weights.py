#!/usr/bin/env python
"""Convert a local diffusers/transformers checkpoint tree into qflux_tpu
param pytrees and report shape/coverage statistics.

Usage:
  python scripts/port_weights.py --family flux-kontext --root /path/to/FLUX.1-Kontext-dev
  python scripts/port_weights.py --family qwen-image-edit --root /path/to/Qwen-Image-Edit

This is a dry-run validator: it loads every safetensors shard, runs the
converter, and prints per-component parameter counts so porting problems
surface before a training run. (The Trainer does the same conversion lazily
at load time; reference models/flux_kontext_loader.py / load_model.py.)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _load_dir(p: Path) -> dict[str, np.ndarray]:
    from qflux_tpu.models.porting import load_safetensors

    sd: dict[str, np.ndarray] = {}
    files = sorted(p.glob("*.safetensors")) if p.is_dir() else [p]
    for f in files:
        sd.update(load_safetensors(str(f)))
    if not sd:
        raise FileNotFoundError(f"no safetensors under {p}")
    return sd


def _count(tree) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True,
                    choices=["flux-kontext", "qwen-image-edit", "flux2-klein"])
    ap.add_argument("--root", required=True)
    args = ap.parse_args(argv)
    root = Path(args.root)

    if args.family == "flux-kontext":
        from qflux_tpu.models.flux.transformer import FluxConfig
        from qflux_tpu.models.porting import (
            convert_clip_text, convert_flux_transformer, convert_flux_vae,
            convert_t5_encoder)

        cfg = FluxConfig()
        jobs = [
            ("transformer", root / "transformer",
             lambda sd: convert_flux_transformer(sd, cfg.num_layers, cfg.num_single_layers)),
            ("vae", root / "vae", convert_flux_vae),
            ("text_encoder (CLIP)", root / "text_encoder", convert_clip_text),
            ("text_encoder_2 (T5)", root / "text_encoder_2", convert_t5_encoder),
        ]
    elif args.family == "qwen-image-edit":
        from qflux_tpu.models.qwen.porting import (
            convert_qwen_image_transformer, convert_vl_text, convert_vl_vision)
        from qflux_tpu.models.qwen.vl_encoder import VLTextConfig, VLVisionConfig

        jobs = [
            ("transformer", root / "transformer",
             lambda sd: convert_qwen_image_transformer(sd)),
            ("text_encoder (VL vision)", root / "text_encoder",
             lambda sd: convert_vl_vision(sd, VLVisionConfig().depth)),
            ("text_encoder (VL text)", root / "text_encoder",
             lambda sd: convert_vl_text(sd, VLTextConfig().num_layers)),
        ]
    else:
        from qflux_tpu.models.flux2.text_encoder import Qwen3Config, convert_qwen3
        from qflux_tpu.models.porting import convert_flux_transformer, convert_flux_vae
        from qflux_tpu.trainer.flux2_klein import flux2_config, flux2_config_from_json

        cfg_json = root / "transformer" / "config.json"
        cfg = flux2_config_from_json(cfg_json) if cfg_json.exists() else flux2_config()
        print(f"transformer topology: {cfg.num_layers}+{cfg.num_single_layers} layers, "
              f"{cfg.num_attention_heads}x{cfg.attention_head_dim} heads"
              + (" (from config.json)" if cfg_json.exists() else " (klein-4B defaults)"))
        jobs = [
            ("transformer", root / "transformer",
             lambda sd: convert_flux_transformer(
                 sd, cfg.num_layers, cfg.num_single_layers,
                 head_dim=cfg.attention_head_dim)),
            ("vae", root / "vae", convert_flux_vae),
            ("text_encoder (Qwen3)", root / "text_encoder",
             lambda sd: convert_qwen3(sd, Qwen3Config().num_layers)),
        ]

    failures = 0
    for name, path, fn in jobs:
        try:
            from qflux_tpu.models.porting import convert_with_coverage

            sd = _load_dir(path)
            # strict: every checkpoint tensor must be consumed; a missing
            # expected tensor raises KeyError inside the converter
            tree, _ = convert_with_coverage(fn, sd, strict=True)
            print(f"{name:28s}: {len(sd):5d} tensors -> {_count(tree):,} params  OK (full coverage)")
        except Exception as e:
            failures += 1
            print(f"{name:28s}: FAILED — {type(e).__name__}: {e}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
