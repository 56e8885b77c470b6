"""true-CFG predict path with negative prompts (all families, test scale)."""

import numpy as np
import pytest

from qflux_tpu.config import Config
from qflux_tpu.trainer.base import Trainer


@pytest.mark.parametrize("trainer_kind", ["FluxKontextLoraTrainer",
                                          "QwenImageEditTrainer"])
def test_predict_with_true_cfg(trainer_kind, tmp_path, rng):
    cfg = Config.model_validate({
        "trainer": trainer_kind,
        "model": {"variant": "test"},
        "train": {"weight_dtype": "float32"},
        "data": {"processor": {"process_type": "resize", "target_size": [32, 32]}},
        "predict": {"num_inference_steps": 2, "true_cfg_scale": 3.0},
        "logging": {"output_dir": str(tmp_path), "report_to": "none"},
    })
    t = Trainer(cfg)
    ctl = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    imgs = t.predict(ctl, "make it night", negative_prompt="blurry, low quality",
                     num_inference_steps=2)
    assert imgs.shape[0] == 1 and imgs.dtype == np.uint8
    # CFG actually changes the output vs scale 1.0
    cfg2 = cfg.model_copy(deep=True)
    cfg2.predict.true_cfg_scale = 1.0
    t2 = Trainer(cfg2)
    imgs_nocfg = t2.predict(ctl, "make it night", num_inference_steps=2)
    assert not np.array_equal(imgs, imgs_nocfg)
