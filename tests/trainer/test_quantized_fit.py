"""int8 weight-only quantized base + LoRA training end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp

from qflux_tpu.config import Config
from qflux_tpu.data.dataset import ImageDataset
from qflux_tpu.data.loader import DataLoader
from qflux_tpu.data.preprocess import ImageProcessor
from qflux_tpu.trainer.base import Trainer


def test_quantized_base_fit(tmp_path, rng):
    from PIL import Image

    img_dir = tmp_path / "data"
    (img_dir / "training_images").mkdir(parents=True)
    (img_dir / "control_images").mkdir(parents=True)
    for i in range(2):
        stem = f"img_{i:03d}"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            img_dir / "training_images" / f"{stem}.png")
        (img_dir / "training_images" / f"{stem}.txt").write_text("q")
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            img_dir / "control_images" / f"{stem}.png")

    cfg = Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "model": {"variant": "test", "quantize": True,
                  "lora": {"r": 2, "lora_alpha": 2}},
        "data": {"init_args": {"dataset_path": str(img_dir)},
                 "processor": {"process_type": "resize", "target_size": [32, 32]}},
        "train": {"max_train_steps": 2, "checkpointing_steps": 100,
                  "weight_dtype": "float32"},
        "logging": {"output_dir": str(tmp_path / "out"), "report_to": "none"},
    })
    proc = ImageProcessor(cfg.data.processor)
    ds = ImageDataset(dataset_path=str(img_dir), processor=proc)
    t = Trainer(cfg)
    state = t.fit(DataLoader(ds, batch_size=1, shuffle=False, drop_last=False))
    assert int(state.step) == 2
    # base weights really are int8 on the dense kernels
    node = t.bundle.dit_params["dual"]["attn"]["to_q"]
    assert "kernel_q" in node and node["kernel_q"].dtype == jnp.int8
    # and LoRA trained on top of them
    assert (t.output_dir / "checkpoint-last-2" / "pytorch_lora_weights.safetensors").exists()


@pytest.mark.parametrize("dtype,key", [("int8_dynamic", "kernel_q_dyn"),
                                       ("int4", None)])
def test_quantized_dtypes_fit_from_yaml(tmp_path, rng, tmp_image_dir, dtype, key):
    """int8_dynamic (W8A8 MXU matmuls) and grouped int4 bases train from the
    YAML surface. Tiny dims aren't 128-group/int4-tileable everywhere, so
    int4 uses group_size=8 and skips odd in-dims automatically."""
    cfg = Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "model": {"variant": "test",
                  "quantize": {"enabled": True, "dtype": dtype, "group_size": 8},
                  "lora": {"r": 2, "lora_alpha": 2}},
        "data": {"init_args": {"dataset_path": str(tmp_image_dir)},
                 "processor": {"process_type": "resize", "target_size": [32, 48]}},
        "train": {"max_train_steps": 2, "checkpointing_steps": 100,
                  "weight_dtype": "float32"},
        "logging": {"output_dir": str(tmp_path / "out"), "report_to": "none"},
    })
    proc = ImageProcessor(cfg.data.processor)
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=proc)
    t = Trainer(cfg)
    state = t.fit(DataLoader(ds, batch_size=1, shuffle=False, drop_last=False))
    assert int(state.step) == 2
    node = t.bundle.dit_params["dual"]["attn"]["to_q"]
    if key:
        assert key in node
    else:  # int4: quantized where tileable
        assert "kernel_q4" in node or "kernel" in node
