"""Capture tiny-width torch-oracle goldens for the FLUX / Qwen DiT forward.

Runs the reference's VENDORED torch transformer modules
(reference src/qflux/models/transformer_flux.py, transformer_qwenimage.py)
with their diffusers imports stubbed (tests/oracles/diffusers_stub.py), at the
same tiny topology as FluxConfig.tiny() / QwenImageConfig.tiny(), on random
weights — and saves inputs + outputs + the full torch state_dict as npz
fixtures under tests/fixtures/dit_goldens/.

The committed fixtures make tests/models/test_dit_goldens.py a NEVER-skipped
parity tier (VERDICT r3 "shrink the real-weights parity IOU"); re-run this
script only to regenerate them (requires the reference checkout):

    QFLUX_REFERENCE_ROOT=/root/reference python scripts/capture_dit_goldens.py
"""

from __future__ import annotations

import importlib.util
import os
import sys
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tests.oracles import diffusers_stub  # noqa: E402

OUT_DIR = REPO / "tests" / "fixtures" / "dit_goldens"


def _load_vendored(name: str):
    root = Path(os.environ.get("QFLUX_REFERENCE_ROOT", "/root/reference"))
    path = root / "src" / "qflux" / "models" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"vendored_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _save(path: Path, inputs: dict, output: np.ndarray, sd: dict):
    arrs = {f"in.{k}": np.asarray(v) for k, v in inputs.items()}
    arrs["out"] = np.asarray(output)
    arrs.update({f"sd.{k}": v.detach().numpy() for k, v in sd.items()})
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrs)
    print(f"wrote {path} ({path.stat().st_size/1e6:.2f} MB, {len(sd)} sd tensors)")


def capture_flux():
    tf = _load_vendored("transformer_flux")
    torch.manual_seed(0)
    # topology of qflux_tpu.models.flux.FluxConfig.tiny()
    model = tf.FluxTransformer2DModel(
        patch_size=1, in_channels=16, out_channels=16, num_layers=2,
        num_single_layers=4, attention_head_dim=32, num_attention_heads=4,
        joint_attention_dim=64, pooled_projection_dim=32, guidance_embeds=True,
        axes_dims_rope=(8, 12, 12)).eval()

    b, h, w, txt = 2, 4, 4, 8
    g = torch.Generator().manual_seed(7)
    # target grid (set 0) + one control grid (set 1) concatenated along seq —
    # the trainer's control-image conditioning (reference flux_kontext_trainer
    # .py:400,419: control ids get ids[...,0] = i+1)
    def grid_ids(set_id):
        ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        return torch.stack([torch.full((h * w,), float(set_id)),
                            ys.reshape(-1).float(), xs.reshape(-1).float()], dim=-1)

    img_ids = torch.cat([grid_ids(0), grid_ids(1)], dim=0)          # [2hw, 3]
    txt_ids = torch.zeros(txt, 3)
    hidden = torch.randn(b, 2 * h * w, 16, generator=g)
    enc = torch.randn(b, txt, 64, generator=g)
    pooled = torch.randn(b, 32, generator=g)
    t = torch.tensor([0.5, 0.25])
    guidance = torch.tensor([2.5, 2.5])

    with torch.no_grad():
        out = model(hidden_states=hidden, encoder_hidden_states=enc,
                    pooled_projections=pooled, timestep=t, img_ids=img_ids,
                    txt_ids=txt_ids, guidance=guidance, return_dict=False)[0]
    _save(OUT_DIR / "flux_tiny.npz",
          {"hidden_states": hidden, "encoder_hidden_states": enc,
           "pooled_projections": pooled, "timestep": t, "img_ids": img_ids,
           "txt_ids": txt_ids, "guidance": guidance},
          out, model.state_dict())


def capture_qwen():
    tq = _load_vendored("transformer_qwenimage")
    torch.manual_seed(1)
    # topology of qflux_tpu.models.qwen.QwenImageConfig.tiny()
    model = tq.QwenImageTransformer2DModel(
        patch_size=2, in_channels=16, out_channels=4, num_layers=2,
        attention_head_dim=32, num_attention_heads=4, joint_attention_dim=48,
        guidance_embeds=False, axes_dims_rope=(8, 12, 12)).eval()

    b, h, w, txt = 2, 4, 4, 8
    g = torch.Generator().manual_seed(11)
    # target plane + one control plane (the Qwen-Image-Edit conditioning
    # layout: control latents concatenated along sequence, reference
    # qwen_image_edit_trainer.py:827-836 drives RoPE via img_shapes)
    img_shapes = [(1, h, w), (1, h, w)]
    s_img = sum(f * hh * ww for f, hh, ww in img_shapes)
    hidden = torch.randn(b, s_img, 16, generator=g)
    enc = torch.randn(b, txt, 48, generator=g)
    enc_mask = torch.ones(b, txt, dtype=torch.long)
    t = torch.tensor([0.5, 0.25])

    with torch.no_grad():
        out = model(hidden_states=hidden, encoder_hidden_states=enc,
                    encoder_hidden_states_mask=enc_mask, timestep=t,
                    img_shapes=[img_shapes], txt_seq_lens=[txt, txt],
                    return_dict=False)[0]
    _save(OUT_DIR / "qwen_tiny.npz",
          {"hidden_states": hidden, "encoder_hidden_states": enc,
           "timestep": t, "img_shapes": np.asarray(img_shapes),
           "txt_len": np.asarray(txt)},
          out, model.state_dict())


if __name__ == "__main__":
    diffusers_stub.install()
    capture_flux()
    capture_qwen()
