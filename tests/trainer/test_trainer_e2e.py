"""Full-pipeline e2e on the tiny FLUX stack: cache pass → cached fit →
checkpoint → resume → predict.  This is the reference's
test_example_fluxkontext config reproduced at test scale (SURVEY.md §7 step 4)."""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from qflux_tpu.config import Config, load_config_from_yaml
from qflux_tpu.data.dataset import ImageDataset
from qflux_tpu.data.loader import DataLoader
from qflux_tpu.data.preprocess import ImageProcessor
from qflux_tpu.trainer.base import Trainer


def _config(tmp_path, tmp_image_dir, use_cache=True) -> Config:
    return Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "mesh": {"dp": 1, "fsdp": 1, "tp": 1},
        "model": {"variant": "test", "lora": {"r": 4, "lora_alpha": 4}},
        "data": {
            "init_args": {"dataset_path": str(tmp_image_dir)},
            "processor": {"process_type": "resize", "target_size": [32, 48]},
            "batch_size": 1,
            "caption_dropout_rate": 0.1,
        },
        "cache": {"use_cache": use_cache, "cache_dir": str(tmp_path / "cache")},
        "train": {"max_train_steps": 3, "checkpointing_steps": 2,
                  "weight_dtype": "float32"},
        "logging": {"output_dir": str(tmp_path / "out"), "project": "e2e",
                    "report_to": "tensorboard"},
        "optimizer": {"class_path": "optax.adamw", "learning_rate": 1e-3,
                      "init_args": {}},
    })


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory, rng):
    """Run cache + fit once; several tests assert on the artifacts."""
    from PIL import Image

    tmp_path = tmp_path_factory.mktemp("e2e")
    img_dir = tmp_path / "data"
    (img_dir / "training_images").mkdir(parents=True)
    (img_dir / "control_images").mkdir(parents=True)
    for i in range(3):
        stem = f"img_{i:03d}"
        Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
            img_dir / "training_images" / f"{stem}.png")
        (img_dir / "training_images" / f"{stem}.txt").write_text(f"prompt {i}")
        Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
            img_dir / "control_images" / f"{stem}.png")

    cfg = _config(tmp_path, img_dir)
    proc = ImageProcessor(cfg.data.processor)

    # --- cache pass
    ds = ImageDataset(dataset_path=str(img_dir), processor=proc,
                      cache_dir=cfg.cache.cache_dir, use_cache=False)
    trainer = Trainer(cfg)
    n = trainer.cache(DataLoader(ds, batch_size=1, shuffle=False, drop_last=False,
                                 bucket_by_shape=False))
    assert n == 3

    # --- cached fit
    ds_cached = ImageDataset(dataset_path=str(img_dir), processor=proc,
                             cache_dir=cfg.cache.cache_dir, use_cache=True)
    dl = DataLoader(ds_cached, batch_size=1, shuffle=True, drop_last=False)
    state = trainer.fit(dl)
    return tmp_path, cfg, trainer, state, img_dir


def test_cache_hits(pipeline):
    tmp_path, cfg, trainer, state, img_dir = pipeline
    proc = ImageProcessor(cfg.data.processor)
    ds = ImageDataset(dataset_path=str(img_dir), processor=proc,
                      cache_dir=cfg.cache.cache_dir, use_cache=True)
    item = ds[0]
    assert item["cached"]
    assert "image_latents" in item and "prompt_embeds" in item


def test_fit_produced_checkpoints(pipeline):
    tmp_path, cfg, trainer, state, _ = pipeline
    assert int(state.step) == 3
    out = trainer.output_dir
    ckpts = sorted(p.name for p in out.iterdir() if p.name.startswith("checkpoint"))
    assert any("checkpoint-2" == c for c in ckpts)
    assert any(c.startswith("checkpoint-last-3") for c in ckpts)
    last = out / "checkpoint-last-3"
    assert (last / "pytorch_lora_weights.safetensors").exists()
    assert (last / "optimizer_state.npz").exists()
    st = json.loads((last / "state.json").read_text())
    assert st["global_step"] == 3 and st["is_last"]
    assert (out / "train_config.yaml").exists()


def test_resume_restores_step(pipeline):
    tmp_path, cfg, trainer, state, img_dir = pipeline
    last = trainer.output_dir / "checkpoint-last-3"
    cfg2 = cfg.model_copy(deep=True)
    cfg2.resume = str(last)
    cfg2.train.max_train_steps = 5
    proc = ImageProcessor(cfg2.data.processor)
    ds = ImageDataset(dataset_path=str(img_dir), processor=proc,
                      cache_dir=cfg2.cache.cache_dir, use_cache=True)
    t2 = Trainer(cfg2)
    state2 = t2.fit(DataLoader(ds, batch_size=1, shuffle=False, drop_last=False))
    assert t2.global_step == 5  # resumed from 3, ran 2 more


def test_predict_returns_images(pipeline):
    tmp_path, cfg, trainer, state, img_dir = pipeline
    ctl = np.asarray(
        __import__("PIL.Image", fromlist=["Image"]).open(
            img_dir / "control_images" / "img_000.png"))
    imgs = trainer.predict(ctl, "turn the sky purple", num_inference_steps=2)
    assert imgs.shape == (1, 32, 48, 3)
    assert imgs.dtype == np.uint8


def test_cli_cache_mode(tmp_path, tmp_image_dir):
    from qflux_tpu.main import main

    cfg = _config(tmp_path, tmp_image_dir)
    cfg.data.processor.target_size = [64, 96]
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(json.loads(cfg.model_dump_json())))
    main(["--config", str(cfg_path), "--cache"])
    assert (tmp_path / "cache" / "metadata").exists()
