"""Trainer edge cases: interrupt handling, versioned-dir GC, epoch exhaustion."""

import json
import signal

import numpy as np
import pytest

from qflux_tpu.config import Config
from qflux_tpu.data.dataset import ImageDataset
from qflux_tpu.data.loader import DataLoader
from qflux_tpu.data.preprocess import ImageProcessor
from qflux_tpu.trainer.base import Trainer


def _mini_dataset(tmp_path, rng, n=2):
    from PIL import Image

    img_dir = tmp_path / "data"
    (img_dir / "training_images").mkdir(parents=True)
    (img_dir / "control_images").mkdir(parents=True)
    for i in range(n):
        stem = f"img_{i:03d}"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            img_dir / "training_images" / f"{stem}.png")
        (img_dir / "training_images" / f"{stem}.txt").write_text("p")
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            img_dir / "control_images" / f"{stem}.png")
    return img_dir


def _cfg(tmp_path, img_dir, **train):
    return Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "model": {"variant": "test", "lora": {"r": 2, "lora_alpha": 2}},
        "data": {"init_args": {"dataset_path": str(img_dir)},
                 "processor": {"process_type": "resize", "target_size": [32, 32]}},
        "train": {"max_train_steps": 100, "checkpointing_steps": 1000,
                  "weight_dtype": "float32", **train},
        "logging": {"output_dir": str(tmp_path / "out"), "project": "edge",
                    "report_to": "none"},
    })


def test_interrupt_saves_last_checkpoint(tmp_path, rng):
    img_dir = _mini_dataset(tmp_path, rng)
    cfg = _cfg(tmp_path, img_dir)
    t = Trainer(cfg)
    ds = ImageDataset(dataset_path=str(img_dir),
                      processor=ImageProcessor(cfg.data.processor))

    class OneStepThenInterrupt:
        def __init__(self, dl, trainer):
            self.dl, self.t = dl, trainer

        def __iter__(self):
            for i, b in enumerate(self.dl):
                if i == 1:
                    self.t._interrupted = True  # simulate SIGINT mid-epoch
                yield b

    dl = OneStepThenInterrupt(DataLoader(ds, batch_size=1, shuffle=False,
                                         drop_last=False), t)
    state = t.fit(dl)
    # interrupt arrives during the (prefetched) fetch of batch 2 → the
    # in-flight step 1 completes, the prefetched batch is dropped, training
    # saves and exits
    assert int(state.step) == 1
    last = [p for p in t.output_dir.iterdir() if p.name.startswith("checkpoint-last")]
    assert last and json.loads((last[0] / "state.json").read_text())["is_last"]


def test_epoch_exhaustion_stops_at_num_epochs(tmp_path, rng):
    img_dir = _mini_dataset(tmp_path, rng)
    cfg = _cfg(tmp_path, img_dir, max_train_steps=1000, num_epochs=2)
    t = Trainer(cfg)
    ds = ImageDataset(dataset_path=str(img_dir),
                      processor=ImageProcessor(cfg.data.processor))
    state = t.fit(DataLoader(ds, batch_size=1, shuffle=False, drop_last=False))
    assert int(state.step) == 4  # 2 samples × 2 epochs


def test_versioned_dir_gc(tmp_path, rng):
    img_dir = _mini_dataset(tmp_path, rng)
    cfg = _cfg(tmp_path, img_dir)
    root = tmp_path / "out" / "edge"
    # fabricate an invalid old run (step<5, no ckpt) and a valid one
    (root / "v0").mkdir(parents=True)
    (root / "v0" / "state.json").write_text(json.dumps({"global_step": 1}))
    (root / "v3").mkdir(parents=True)
    (root / "v3" / "ckpt").mkdir()
    (root / "v3" / "ckpt" / "x.safetensors").write_bytes(b"\0" * 8)
    t = Trainer(cfg)
    out = t.setup_versioned_dir()
    assert not (root / "v0").exists()   # GC'd
    assert (root / "v3").exists()       # kept
    assert out.name == "v4"             # next version after the kept one
