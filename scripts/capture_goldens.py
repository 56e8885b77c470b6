"""Real-weights parity runbook — golden capture (VERDICT round-2 #9).

Given REAL checkpoint directories (downloaded with network access, e.g.
`huggingface-cli download black-forest-labs/FLUX.1-Kontext-dev`), this script
runs the PyTorch reference stack on fixed-seed inputs and stores the outputs
as .npz goldens; `tests/models/test_real_weight_parity.py` then ports the
same checkpoints through qflux_tpu's converters and asserts relative error —
the reference's own test strategy (reference tests/conftest.py:102-140 with
its TsienDragon/qwen-image-finetune-test-resources manifest).

Runbook (documented in docs/PARITY.md):

  1. huggingface-cli download black-forest-labs/FLUX.1-Kontext-dev \
         --local-dir /ckpts/flux-kontext
  2. python scripts/capture_goldens.py --model flux \
         --checkpoint /ckpts/flux-kontext --out goldens/flux
  3. QFLUX_GOLDENS=goldens QFLUX_CKPT_FLUX=/ckpts/flux-kontext \
         python -m pytest tests/models/test_real_weight_parity.py -v

Stages (each skipped with a notice if its dependency is missing):
  text   — CLIP + T5 hidden states (transformers)        [flux]
           Qwen2.5-VL hidden states (transformers)       [qwen]
           Qwen3 multi-layer hidden states (transformers)[flux2]
  vae    — VAE encode posterior mode (diffusers)         [flux, qwen]
  dit    — transformer forward on random latents (diffusers)
  sample — 4-step Euler latents from fixed noise (diffusers pipeline)

All tensors are saved float32 with the RNG inputs alongside, so the JAX side
reproduces the exact same inputs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PROMPT = "a photo of a cat wearing a tiny hat"
SEED = 1234


def _save(out_dir: Path, name: str, **arrays):
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_dir / f"{name}.npz",
                        **{k: np.asarray(v, np.float32) if np.asarray(v).dtype.kind == "f"
                           else np.asarray(v) for k, v in arrays.items()})
    print(f"captured {name}: " + ", ".join(
        f"{k}{tuple(np.shape(v))}" for k, v in arrays.items()))


def _torch():
    import torch

    torch.manual_seed(SEED)
    return torch


def capture_flux_text(ckpt: Path, out: Path):
    torch = _torch()
    from transformers import (AutoTokenizer, CLIPTextModel, CLIPTokenizer,
                              T5EncoderModel)

    tok_c = CLIPTokenizer.from_pretrained(ckpt / "tokenizer")
    tok_t = AutoTokenizer.from_pretrained(ckpt / "tokenizer_2")
    clip = CLIPTextModel.from_pretrained(ckpt / "text_encoder",
                                         torch_dtype=torch.float32).eval()
    t5 = T5EncoderModel.from_pretrained(ckpt / "text_encoder_2",
                                        torch_dtype=torch.float32).eval()
    cids = tok_c([PROMPT], padding="max_length", truncation=True, max_length=77,
                 return_tensors="pt").input_ids
    tids = tok_t([PROMPT], padding="max_length", truncation=True, max_length=512,
                 return_tensors="pt").input_ids
    with torch.no_grad():
        c = clip(input_ids=cids)
        t = t5(input_ids=tids)
    _save(out, "text", clip_ids=cids.numpy(), t5_ids=tids.numpy(),
          pooled=c.pooler_output.numpy(), t5_hidden=t.last_hidden_state.numpy())


def capture_qwen_text(ckpt: Path, out: Path):
    torch = _torch()
    from transformers import AutoProcessor, Qwen2_5_VLForConditionalGeneration

    proc = AutoProcessor.from_pretrained(ckpt / "processor"
                                         if (ckpt / "processor").exists() else ckpt)
    vl = Qwen2_5_VLForConditionalGeneration.from_pretrained(
        ckpt / "text_encoder", torch_dtype=torch.float32).eval()
    rng = np.random.default_rng(SEED)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    template = ("<|im_start|>system\nDescribe the key features of the input "
                "image (color, shape, size, texture, objects, background), "
                "then explain how the user's text instruction should alter or "
                "modify the image. Generate a new image that meets the user's "
                "requirements while maintaining consistency with the original "
                "input where appropriate.<|im_end|>\n<|im_start|>user\n"
                "<|vision_start|><|image_pad|><|vision_end|>%s<|im_end|>\n"
                "<|im_start|>assistant\n")
    inputs = proc(text=[template % PROMPT], images=[img], return_tensors="pt")
    with torch.no_grad():
        h = vl(**inputs, output_hidden_states=True).hidden_states[-1]
    _save(out, "text", image=img, input_ids=inputs["input_ids"].numpy(),
          hidden=h.numpy())


def capture_vae(ckpt: Path, out: Path, model: str):
    torch = _torch()
    import diffusers

    rng = np.random.default_rng(SEED)
    img = rng.integers(0, 255, (1, 3, 128, 128), np.uint8)
    x = torch.from_numpy(img.astype(np.float32) / 127.5 - 1.0)
    if model == "qwen":
        vae = diffusers.AutoencoderKLQwenImage.from_pretrained(
            ckpt / "vae", torch_dtype=torch.float32).eval()
        x = x.unsqueeze(2)  # [B, C, T=1, H, W]
    else:
        vae = diffusers.AutoencoderKL.from_pretrained(
            ckpt / "vae", torch_dtype=torch.float32).eval()
    with torch.no_grad():
        post = vae.encode(x).latent_dist
        lat = post.mode()
    _save(out, "vae", image=img, latents_mode=lat.numpy())


def capture_dit(ckpt: Path, out: Path, model: str):
    torch = _torch()
    import diffusers

    rng = np.random.default_rng(SEED)
    if model == "qwen":
        dit = diffusers.QwenImageTransformer2DModel.from_pretrained(
            ckpt / "transformer", torch_dtype=torch.float32).eval()
        h = rng.standard_normal((1, 256, dit.config.in_channels)).astype(np.float32)
        txt = rng.standard_normal((1, 32, dit.config.joint_attention_dim)).astype(np.float32)
        with torch.no_grad():
            outp = dit(hidden_states=torch.from_numpy(h),
                       encoder_hidden_states=torch.from_numpy(txt),
                       encoder_hidden_states_mask=torch.ones(1, 32, dtype=torch.long),
                       timestep=torch.tensor([500.0]) / 1000,
                       img_shapes=[[(1, 16, 16)]],
                       txt_seq_lens=[32], return_dict=False)[0]
        _save(out, "dit", hidden=h, txt=txt, timestep=[0.5], out=outp.numpy())
    else:
        dit = diffusers.FluxTransformer2DModel.from_pretrained(
            ckpt / "transformer", torch_dtype=torch.float32).eval()
        h = rng.standard_normal((1, 256, dit.config.in_channels)).astype(np.float32)
        txt = rng.standard_normal((1, 64, dit.config.joint_attention_dim)).astype(np.float32)
        pooled = rng.standard_normal((1, dit.config.pooled_projection_dim)).astype(np.float32)
        img_ids = np.stack(np.meshgrid(np.arange(16), np.arange(16),
                                       indexing="ij"), -1).reshape(-1, 2)
        img_ids = np.concatenate([np.zeros((256, 1)), img_ids], -1).astype(np.float32)
        txt_ids = np.zeros((64, 3), np.float32)
        with torch.no_grad():
            outp = dit(hidden_states=torch.from_numpy(h),
                       encoder_hidden_states=torch.from_numpy(txt),
                       pooled_projections=torch.from_numpy(pooled),
                       timestep=torch.tensor([0.5]),
                       guidance=torch.tensor([3.5]),
                       img_ids=torch.from_numpy(img_ids),
                       txt_ids=torch.from_numpy(txt_ids),
                       return_dict=False)[0]
        _save(out, "dit", hidden=h, txt=txt, pooled=pooled, timestep=[0.5],
              guidance=[3.5], img_ids=img_ids, txt_ids=txt_ids, out=outp.numpy())


def capture_sample(ckpt: Path, out: Path, model: str):
    """4-step Euler latents from fixed noise — end-to-end sampler parity."""
    torch = _torch()
    import diffusers

    if model != "flux":
        print("sample stage: flux only for now"); return
    pipe = diffusers.FluxKontextPipeline.from_pretrained(
        ckpt, torch_dtype=torch.float32)
    gen = torch.Generator().manual_seed(SEED)
    lat = pipe(prompt=PROMPT, num_inference_steps=4, height=128, width=128,
               generator=gen, output_type="latent").images
    _save(out, "sample", latents=lat.numpy(), steps=[4], hw=[128, 128])


STAGES = {
    ("flux", "text"): capture_flux_text,
    ("qwen", "text"): capture_qwen_text,
    ("flux", "vae"): lambda c, o: capture_vae(c, o, "flux"),
    ("qwen", "vae"): lambda c, o: capture_vae(c, o, "qwen"),
    ("flux", "dit"): lambda c, o: capture_dit(c, o, "flux"),
    ("qwen", "dit"): lambda c, o: capture_dit(c, o, "qwen"),
    ("flux", "sample"): lambda c, o: capture_sample(c, o, "flux"),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", choices=("flux", "qwen"), required=True)
    ap.add_argument("--checkpoint", required=True,
                    help="local checkpoint dir (diffusers layout)")
    ap.add_argument("--out", required=True, help="goldens output dir")
    ap.add_argument("--stages", default="text,vae,dit,sample")
    args = ap.parse_args()
    ckpt, out = Path(args.checkpoint), Path(args.out)
    manifest = {"model": args.model, "checkpoint": str(ckpt), "seed": SEED,
                "prompt": PROMPT, "stages": []}
    for st in args.stages.split(","):
        fn = STAGES.get((args.model, st))
        if fn is None:
            print(f"stage {st}: not defined for {args.model}"); continue
        try:
            fn(ckpt, out)
            manifest["stages"].append(st)
        except ImportError as e:
            print(f"stage {st}: SKIPPED (missing dependency: {e})")
        except Exception as e:
            print(f"stage {st}: FAILED ({type(e).__name__}: {e})")
            raise
    out.mkdir(parents=True, exist_ok=True)
    (out / "manifest.json").write_text(json.dumps(manifest, indent=1))
    print(f"manifest: {out / 'manifest.json'} (stages: {manifest['stages']})")


if __name__ == "__main__":
    main()
