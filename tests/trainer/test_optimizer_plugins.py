"""Optimizer plugin path (config class_path → resolve_symbol): the reference
ships Prodigy via its class_path config (configs/face_seg_flux_kontext_fp16_
prodigy.yaml, base_trainer.py optimizer instantiation); the TPU analogue is
any optax constructor — including optax.contrib.prodigy and optax.lion —
driven purely from YAML."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.config import Config
from qflux_tpu.trainer.base import Trainer


def _cfg(class_path, init_args):
    return Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "model": {"variant": "test"},
        "data": {"init_args": {"dataset_path": "/nonexistent"}},
        "train": {"max_train_steps": 10, "weight_dtype": "float32"},
        "logging": {"output_dir": "/tmp/qflux_opt_plugin", "project": "t",
                    "report_to": "none"},
        "optimizer": {"class_path": class_path, "learning_rate": 1e-2,
                      "init_args": init_args},
    })


@pytest.mark.parametrize("class_path,init_args", [
    ("optax.adamw", {}),
    ("optax.lion", {}),
    # estim_lr0 lifted from its 1e-6 default so the first updates don't
    # underflow the f32 grid of a weight at 1.0 in a 2-step test
    ("optax.contrib.prodigy", {"weight_decay": 0.01, "estim_lr0": 0.01}),
])
def test_optimizer_class_path_updates_params(class_path, init_args):
    opt = Trainer(_cfg(class_path, init_args)).build_optimizer()
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: jnp.sum((p["w"] @ jnp.ones(4) + p["b"]) ** 2))(params)
        updates, state = opt.update(grads, state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), state

    p1, state = step(params, state)
    p2, _ = step(p1, state)
    assert np.isfinite(np.asarray(p2["w"])).all()
    # the optimizer must actually move the weights over two steps (prodigy's
    # estimated lr starts at 1e-6, so compare exactly, not within tolerance)
    assert (np.asarray(p2["w"]) != np.asarray(params["w"])).any()
