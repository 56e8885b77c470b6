"""Remat-policy auto-degrade: a compile-class failure on the first train step
(HBM memory-assignment overflow at long-sequence buckets — the 'flash'
policy's saved residuals scale with S; docs/PERF.md round 4) falls back to
mesh.remat: full with a warning and the fit completes.  Non-compile errors
must re-raise unchanged."""

import numpy as np
import pytest

import qflux_tpu.trainer.base as base_mod
from qflux_tpu.config import Config
from qflux_tpu.data.dataset import ImageDataset
from qflux_tpu.data.loader import DataLoader
from qflux_tpu.data.preprocess import ImageProcessor
from qflux_tpu.trainer.base import Trainer


def _config(tmp_path, img_dir) -> Config:
    return Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "mesh": {"dp": 1, "fsdp": 1, "tp": 1, "remat": "flash"},
        "model": {"variant": "test", "lora": {"r": 4, "lora_alpha": 4}},
        "data": {
            "init_args": {"dataset_path": str(img_dir)},
            "processor": {"process_type": "resize", "target_size": [32, 48]},
            "batch_size": 1,
        },
        "cache": {"use_cache": False},
        "train": {"max_train_steps": 2, "checkpointing_steps": 100,
                  "weight_dtype": "float32"},
        "logging": {"output_dir": str(tmp_path / "out"), "project": "rematfb",
                    "report_to": "tensorboard"},
        "optimizer": {"class_path": "optax.adamw", "learning_rate": 1e-3,
                      "init_args": {}},
        "predict": {"num_inference_steps": 2},
    })


@pytest.fixture()
def img_dir(tmp_path, rng):
    from PIL import Image

    d = tmp_path / "data"
    (d / "training_images").mkdir(parents=True)
    (d / "control_images").mkdir(parents=True)
    for i in range(2):
        stem = f"img_{i:03d}"
        Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
            d / "training_images" / f"{stem}.png")
        (d / "training_images" / f"{stem}.txt").write_text(f"prompt {i}")
        Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
            d / "control_images" / f"{stem}.png")
    return d


def _fit(tmp_path, img_dir, first_step_error):
    """Fit with the FIRST make_train_step product replaced by a step that
    raises `first_step_error`; subsequent make_train_step calls (the degrade
    path) return the real step."""
    real = base_mod.make_train_step
    calls = {"n": 0}

    def fake(predict, criterion, optimizer, step_cfg, mesh=None):
        calls["n"] += 1
        if calls["n"] == 1:
            def exploding(*a, **k):
                raise first_step_error
            return exploding
        return real(predict, criterion, optimizer, step_cfg, mesh=mesh)

    cfg = _config(tmp_path, img_dir)
    proc = ImageProcessor(cfg.data.processor)
    ds = ImageDataset(dataset_path=str(img_dir), processor=proc, use_cache=False)
    dl = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    trainer = Trainer(cfg)
    import unittest.mock as mock

    with mock.patch.object(base_mod, "make_train_step", fake):
        state = trainer.fit(dl)
    return trainer, state, calls


def test_compile_oom_degrades_to_full(tmp_path, img_dir, caplog):
    err = RuntimeError(
        "INTERNAL: http://127.0.0.1:8083/remote_compile: HTTP 500: "
        "tpu_compile_helper subprocess exit code 1")
    trainer, state, calls = _fit(tmp_path, img_dir, err)
    assert int(state.step) == 2          # fit completed after the retry
    assert calls["n"] == 2               # degrade rebuilt the step exactly once
    assert trainer.adapter.remat_policy == "full"


def test_resource_exhausted_degrades(tmp_path, img_dir):
    err = RuntimeError("RESOURCE_EXHAUSTED: Attempting to allocate 4.21G")
    trainer, state, _ = _fit(tmp_path, img_dir, err)
    assert int(state.step) == 2
    assert trainer.adapter.remat_policy == "full"


def test_non_compile_error_reraises(tmp_path, img_dir):
    with pytest.raises(ValueError, match="user bug"):
        _fit(tmp_path, img_dir, ValueError("user bug in the loss"))


def test_runtime_oom_after_donation_reraises(tmp_path, img_dir, caplog):
    """A memory error raised AFTER the donated state buffers were consumed
    (runtime allocation failure, not a compile-stage one) must re-raise the
    original error instead of retrying the rebuilt step on deleted arrays
    (which would crash with 'Array has been deleted' and mask the cause)."""
    import unittest.mock as mock

    err = RuntimeError("RESOURCE_EXHAUSTED: Attempting to allocate 4.21G")
    real = base_mod.make_train_step
    calls = {"n": 0}
    trainer_box = {}

    def fake(predict, criterion, optimizer, step_cfg, mesh=None):
        calls["n"] += 1
        if calls["n"] == 1:
            def exploding(*a, **k):
                # simulate donate_argnums=(0,) consuming the state before
                # the runtime failure surfaced
                for leaf in jax.tree.leaves(trainer_box["t"].state):
                    leaf.delete()
                raise err
            return exploding
        return real(predict, criterion, optimizer, step_cfg, mesh=mesh)

    import jax

    cfg = _config(tmp_path, img_dir)
    proc = ImageProcessor(cfg.data.processor)
    ds = ImageDataset(dataset_path=str(img_dir), processor=proc,
                      use_cache=False)
    dl = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    trainer = Trainer(cfg)
    trainer_box["t"] = trainer
    with mock.patch.object(base_mod, "make_train_step", fake), \
            pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        trainer.fit(dl)
    assert calls["n"] == 1  # no retry was attempted on the dead state
    assert "donated" in caplog.text


def test_full_policy_never_retries(tmp_path, img_dir):
    """A compile-class failure under remat=full is terminal (nothing leaner
    to degrade to) — no infinite retry loop."""
    import dataclasses

    err = RuntimeError("RESOURCE_EXHAUSTED: Attempting to allocate 17.2G")
    real = base_mod.make_train_step

    def fake(predict, criterion, optimizer, step_cfg, mesh=None):
        def exploding(*a, **k):
            raise err
        return exploding

    cfg = _config(tmp_path, img_dir)
    cfg = cfg.model_copy(update={})
    proc = ImageProcessor(cfg.data.processor)
    ds = ImageDataset(dataset_path=str(img_dir), processor=proc, use_cache=False)
    dl = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    trainer = Trainer(cfg)
    trainer.load_model()
    trainer.adapter = dataclasses.replace(trainer.adapter, remat_policy="full")
    import unittest.mock as mock

    with mock.patch.object(base_mod, "make_train_step", fake), \
            pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        trainer.fit(dl)
