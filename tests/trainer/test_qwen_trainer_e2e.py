"""Qwen-Image-Edit trainer e2e at test scale: cache → fit → predict."""

import numpy as np
import pytest

from qflux_tpu.config import Config
from qflux_tpu.data.dataset import ImageDataset
from qflux_tpu.data.loader import DataLoader
from qflux_tpu.data.preprocess import ImageProcessor
from qflux_tpu.trainer.base import Trainer


@pytest.fixture(scope="module")
def qwen_pipeline(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(1)
    tmp_path = tmp_path_factory.mktemp("qwen_e2e")
    img_dir = tmp_path / "data"
    (img_dir / "training_images").mkdir(parents=True)
    (img_dir / "control_images").mkdir(parents=True)
    for i in range(2):
        stem = f"img_{i:03d}"
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            img_dir / "training_images" / f"{stem}.png")
        (img_dir / "training_images" / f"{stem}.txt").write_text(f"edit request {i}")
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            img_dir / "control_images" / f"{stem}.png")

    cfg = Config.model_validate({
        "trainer": "QwenImageEditTrainer",
        "mesh": {"dp": 1, "fsdp": 1, "tp": 1},
        "model": {"variant": "test", "lora": {"r": 4, "lora_alpha": 4}},
        "data": {
            "init_args": {"dataset_path": str(img_dir)},
            "processor": {"process_type": "resize", "target_size": [64, 64]},
            "batch_size": 1,
        },
        "cache": {"use_cache": True, "cache_dir": str(tmp_path / "cache")},
        "train": {"max_train_steps": 2, "checkpointing_steps": 100,
                  "weight_dtype": "float32",
                  "timestep_sampling": "logit_normal"},
        "logging": {"output_dir": str(tmp_path / "out"), "project": "qwen_e2e",
                    "report_to": "none"},
    })
    return tmp_path, cfg, img_dir


def test_qwen_cache_and_fit(qwen_pipeline):
    tmp_path, cfg, img_dir = qwen_pipeline
    proc = ImageProcessor(cfg.data.processor)
    ds = ImageDataset(dataset_path=str(img_dir), processor=proc,
                      cache_dir=cfg.cache.cache_dir, use_cache=False)
    trainer = Trainer(cfg)
    n = trainer.cache(DataLoader(ds, batch_size=1, shuffle=False, drop_last=False,
                                 bucket_by_shape=False))
    assert n == 2

    ds_cached = ImageDataset(dataset_path=str(img_dir), processor=proc,
                             cache_dir=cfg.cache.cache_dir, use_cache=True)
    item = ds_cached[0]
    assert item["cached"]
    assert "prompt_embeds" in item and "img_shapes_arr" in item

    state = trainer.fit(DataLoader(ds_cached, batch_size=1, shuffle=False,
                                   drop_last=False))
    assert int(state.step) == 2
    ckpt = trainer.output_dir / "checkpoint-last-2"
    assert (ckpt / "pytorch_lora_weights.safetensors").exists()
    # lora export uses the Qwen module naming
    from qflux_tpu.models.porting import load_safetensors

    sd = load_safetensors(str(ckpt / "pytorch_lora_weights.safetensors"))
    assert any(k.startswith("transformer.transformer_blocks.0.attn.to_q.lora_A")
               for k in sd)

    # predict end-to-end
    ctl = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(
        img_dir / "control_images" / "img_000.png"))
    imgs = trainer.predict(ctl, "make it blue", num_inference_steps=2)
    assert imgs.shape[0] == 1 and imgs.dtype == np.uint8
