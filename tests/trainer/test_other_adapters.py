"""Qwen-Edit-Plus, DreamOmni2, and FLUX.2-Klein adapters: end-to-end light
(prepare embeddings → one train step → sampling shape)."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.config import Config
from qflux_tpu.losses import MseLoss
from qflux_tpu.ops.layers import build_lora_tree
from qflux_tpu.trainer.train_step import TrainState, TrainStepConfig, make_train_step


def _cfg(trainer: str) -> Config:
    return Config.model_validate({
        "trainer": trainer,
        "model": {"variant": "test"},
        "train": {"weight_dtype": "float32"},
    })


def _pixel_batch(rng, b=1, size=32, n_controls=1):
    batch = {
        "image": rng.integers(0, 255, (b, size, size, 3), dtype=np.uint8),
        "prompt": ["compose the subjects"] * b,
        "control": rng.integers(0, 255, (b, size, size, 3), dtype=np.uint8),
    }
    for i in range(1, n_controls):
        batch[f"control_{i}"] = rng.integers(0, 255, (b, size, size, 3), dtype=np.uint8)
    return batch


def _run_one_step(adapter, bundle, emb):
    emb = {k: (jnp.asarray(v) if not isinstance(v, (list, tuple)) else v)
           for k, v in emb.items()}
    opt = optax.sgd(1e-3)
    step = make_train_step(adapter.predict_velocity, MseLoss(), opt, TrainStepConfig())
    lora = build_lora_tree(jax.random.PRNGKey(1), bundle.dit_params,
                           list(adapter.default_lora_targets), rank=2, alpha=2)
    state, metrics = step(TrainState.create(lora, opt), bundle.dit_params, emb,
                          jax.random.PRNGKey(0))
    return float(metrics["loss"])


def test_qwen_edit_plus_multi_image(rng):
    from qflux_tpu.trainer.qwen_edit_plus import QwenImageEditPlusAdapter

    adapter, bundle = QwenImageEditPlusAdapter.load(_cfg("QwenImageEditPlusTrainer"),
                                                    dtype=jnp.float32)
    assert "Picture 1" in adapter.format_prompt("x", 2) and "Picture 2" in adapter.format_prompt("x", 2)
    batch = _pixel_batch(rng, n_controls=2)
    emb = adapter.prepare_embeddings(bundle, batch)
    # two control planes → 3 img_shapes rows, control latents 2× target length
    assert emb["img_shapes_arr"].shape[0] == 3
    assert emb["control_latents"].shape[1] == 2 * emb["image_latents"].shape[1]
    loss = _run_one_step(adapter, bundle, emb)
    assert np.isfinite(loss)


def test_condition_image_resize():
    from qflux_tpu.trainer.qwen_edit_plus import resize_condition_image

    img = np.zeros((800, 1200, 3), np.uint8)
    out = resize_condition_image(img)
    assert out.shape[0] * out.shape[1] <= 384 * 384
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    small = np.zeros((64, 64, 3), np.uint8)
    assert resize_condition_image(small).shape == (64, 64, 3)


def test_dreamomni2_cumulative_ids(rng):
    from qflux_tpu.trainer.dreamomni2 import DreamOmni2Adapter

    adapter, bundle = DreamOmni2Adapter.load(_cfg("DreamOmni2Trainer"), dtype=jnp.float32)
    batch = _pixel_batch(rng, n_controls=2)
    emb = adapter.prepare_embeddings(bundle, batch)
    ids = np.asarray(emb["img_ids"])
    s_img = emb["image_latents"].shape[1]
    # target ids: set 0; control 1: set 1 no offset; control 2: set 2 offset by grid
    assert (ids[:s_img, 0] == 0).all()
    ctl1 = ids[s_img:2 * s_img]
    ctl2 = ids[2 * s_img:]
    assert (ctl1[:, 0] == 1).all() and (ctl2[:, 0] == 2).all()
    gh = int(ctl1[:, 1].max()) + 1
    assert ctl2[:, 1].min() == gh  # cumulative h offset
    loss = _run_one_step(adapter, bundle, emb)
    assert np.isfinite(loss)


def test_flux2_klein_stack(rng):
    from qflux_tpu.trainer.flux2_klein import Flux2KleinAdapter, latent_ids_4d, text_ids_4d

    adapter, bundle = Flux2KleinAdapter.load(_cfg("Flux2KleinLoraTrainer"),
                                             dtype=jnp.float32)
    # 4-axis ids layout
    ids = latent_ids_4d(2, 3, set_id=1)
    assert ids.shape == (6, 4)
    assert (ids[:, 0] == 1).all() and ids[:, 3].max() == 0
    tids = text_ids_4d(5)
    assert (tids[:, :3] == 0).all() and tids[4, 3] == 4

    batch = _pixel_batch(rng, size=32)
    emb = adapter.prepare_embeddings(bundle, batch)
    # 3-layer concat: embeds channel dim = 3 × hidden
    assert emb["prompt_embeds"].shape[-1] == 3 * bundle.text_cfgs["qwen3"].hidden_size
    assert emb["pooled_prompt_embeds"].shape[-1] == emb["prompt_embeds"].shape[-1]
    assert emb["img_ids"].shape[-1] == 4
    loss = _run_one_step(adapter, bundle, emb)
    assert np.isfinite(loss)
