"""Qwen-Image-Edit-Plus full pipeline: multi-control dataset → cache → fit →
multi-image predict."""

import numpy as np
import pytest

from qflux_tpu.config import Config
from qflux_tpu.data.dataset import ImageDataset
from qflux_tpu.data.loader import DataLoader
from qflux_tpu.data.preprocess import ImageProcessor
from qflux_tpu.trainer.base import Trainer


def test_plus_multicontrol_pipeline(tmp_path, rng):
    from PIL import Image

    img_dir = tmp_path / "data"
    (img_dir / "training_images").mkdir(parents=True)
    (img_dir / "control_images").mkdir(parents=True)
    for i in range(2):
        stem = f"img_{i:03d}"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            img_dir / "training_images" / f"{stem}.png")
        (img_dir / "training_images" / f"{stem}.txt").write_text("compose them")
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            img_dir / "control_images" / f"{stem}.png")
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            img_dir / "control_images" / f"{stem}_control_1.png")

    cfg = Config.model_validate({
        "trainer": "QwenImageEditPlusTrainer",
        "model": {"variant": "test", "lora": {"r": 2, "lora_alpha": 2}},
        "data": {"init_args": {"dataset_path": str(img_dir)},
                 "processor": {"process_type": "resize", "target_size": [32, 32]}},
        "cache": {"use_cache": True, "cache_dir": str(tmp_path / "cache")},
        "train": {"max_train_steps": 2, "checkpointing_steps": 100,
                  "weight_dtype": "float32"},
        "logging": {"output_dir": str(tmp_path / "out"), "report_to": "none"},
    })
    proc = ImageProcessor(cfg.data.processor)
    ds = ImageDataset(dataset_path=str(img_dir), processor=proc,
                      cache_dir=cfg.cache.cache_dir, use_cache=False)
    assert "control_1" in ds[0]  # two controls per sample
    t = Trainer(cfg)
    assert t.cache(DataLoader(ds, batch_size=1, shuffle=False, drop_last=False,
                              bucket_by_shape=False)) == 2

    ds_c = ImageDataset(dataset_path=str(img_dir), processor=proc,
                        cache_dir=cfg.cache.cache_dir, use_cache=True)
    item = ds_c[0]
    assert item["cached"]
    # both control planes cached: control latents cover 2 × target tokens
    assert item["control_latents"].shape[0] == 2 * item["image_latents"].shape[0]

    state = t.fit(DataLoader(ds_c, batch_size=1, shuffle=False, drop_last=False))
    assert int(state.step) == 2

    # multi-image predict through the Plus template
    imgs = t.predict([rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                      rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)],
                     "merge the two subjects", num_inference_steps=2)
    assert imgs.shape == (1, 32, 32, 3)
