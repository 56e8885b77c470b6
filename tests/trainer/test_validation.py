"""In-training validation sampling + logging."""

import numpy as np
import pytest

from qflux_tpu.config import Config
from qflux_tpu.trainer.base import Trainer
from qflux_tpu.utils.logger import LoggerManager


def test_run_validation_logs_images(tmp_path, rng):
    from PIL import Image

    ctl_path = tmp_path / "ctl.png"
    Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(ctl_path)

    cfg = Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "model": {"variant": "test"},
        "train": {"weight_dtype": "float32"},
        "data": {"processor": {"process_type": "resize", "target_size": [32, 48]}},
        "validation": {
            "enabled": True, "steps": 1, "num_inference_steps": 2,
            "samples": [{"images": [str(ctl_path)], "prompt": "validate me"}],
        },
        "logging": {"output_dir": str(tmp_path / "out"), "report_to": "tensorboard"},
    })
    t = Trainer(cfg)
    t.load_model()
    t.output_dir = tmp_path / "out"
    t.output_dir.mkdir(parents=True, exist_ok=True)
    t.logger = LoggerManager(report_to="tensorboard", log_dir=t.output_dir / "logs")
    t.run_validation()
    t.logger.close()
    # a tensorboard event file with image data was written
    logs = list((t.output_dir / "logs").rglob("events*"))
    assert logs and logs[0].stat().st_size > 1000


def test_validation_embeddings_precomputed_once(tmp_path, rng):
    """Embeddings are encoded ONCE at setup and reused across validation steps
    (reference validation.py:217-279); errors fail loud by default."""
    from PIL import Image

    ctl_path = tmp_path / "ctl.png"
    Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(ctl_path)
    cfg = Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "model": {"variant": "test"},
        "train": {"weight_dtype": "float32"},
        "data": {"processor": {"process_type": "resize", "target_size": [32, 48]}},
        "validation": {
            "enabled": True, "steps": 1, "num_inference_steps": 2,
            "samples": [{"images": [str(ctl_path)], "prompt": "validate me"}],
        },
        "logging": {"output_dir": str(tmp_path / "out"), "report_to": "none"},
    })
    t = Trainer(cfg)
    t.load_model()
    t.output_dir = tmp_path / "out"
    t.output_dir.mkdir(parents=True, exist_ok=True)
    t.logger = LoggerManager(report_to="none", log_dir=t.output_dir / "logs")

    calls = {"n": 0}
    orig = type(t.adapter).prepare_embeddings

    def counting(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    import unittest.mock as mock

    with mock.patch.object(type(t.adapter), "prepare_embeddings", counting):
        t.run_validation()
        t.run_validation()
    assert calls["n"] == 1  # setup encoded once; 2nd validation reused it


def test_validation_fails_loud(tmp_path, rng):
    from PIL import Image

    ctl_path = tmp_path / "ctl.png"
    Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(ctl_path)
    cfg = Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "model": {"variant": "test"},
        "train": {"weight_dtype": "float32"},
        "data": {"processor": {"process_type": "resize", "target_size": [32, 48]}},
        "validation": {"enabled": True, "steps": 1, "num_inference_steps": 2,
                       "samples": [{"images": [str(ctl_path)], "prompt": "x"}]},
        "logging": {"output_dir": str(tmp_path / "out"), "report_to": "none"},
    })
    t = Trainer(cfg)
    t.load_model()
    t.output_dir = tmp_path / "out"
    t.output_dir.mkdir(parents=True, exist_ok=True)
    t.logger = LoggerManager(report_to="none", log_dir=t.output_dir / "logs")
    t.setup_validation()
    t._validation_embeddings[0]["emb"]["prompt_embeds"] = np.zeros((1, 2))  # corrupt
    with pytest.raises(Exception):
        t.run_validation()
