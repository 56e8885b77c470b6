"""Multi-resolution padded-batch training path.

Core invariant (the reference validates its multi-res custom transformers the
same way, tests/src/models/test_qwen_custom.py:1-80): a padded+segment-masked
mixed batch must produce the same predictions on valid tokens as each sample
run alone.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.config import Config
from qflux_tpu.data.collate import collate
from qflux_tpu.losses import AttentionMaskMseLoss
from qflux_tpu.trainer.base import Trainer


def _cfg(trainer, tmp_path, loss="qflux_tpu.losses.AttentionMaskMseLoss"):
    return Config.model_validate({
        "trainer": trainer,
        "model": {"variant": "test"},
        "train": {"weight_dtype": "float32"},
        "loss": {"class_path": loss},
        "logging": {"output_dir": str(tmp_path), "report_to": "none"},
    })


def _cache_items(trainer, rng, sizes):
    """Simulate the per-sample cache outputs for two resolutions."""
    items = []
    for i, (h, w) in enumerate(sizes):
        batch = {
            "image": rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8),
            "control": rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8),
            "prompt": [f"sample {i}"],
            "file_hashes": [{k: f"h{i}" for k in
                             ("image_hash", "prompt_hash", "empty_prompt_hash",
                              "control_hash", "controls_sum_hash", "main_hash",
                              "control_prompt_hash", "control_empty_prompt_hash")}],
        }
        arrays, _ = trainer.adapter.cache_embeddings(trainer.bundle, batch)
        items.append({**arrays, "cached": True})
    return items


@pytest.mark.parametrize("trainer_kind", ["FluxKontextLoraTrainer", "QwenImageEditTrainer"])
def test_padded_mixed_batch_matches_per_sample(trainer_kind, tmp_path, rng):
    t = Trainer(_cfg(trainer_kind, tmp_path))
    t.load_model()
    items = _cache_items(t, rng, [(32, 32), (32, 48)])

    # per-sample predictions
    singles = []
    for item in items:
        single = collate([item])
        emb = t._embeddings_for_batch(single)
        emb = {k: jnp.asarray(v) for k, v in emb.items() if not isinstance(v, (list, dict))}
        lat = emb["image_latents"].astype(jnp.float32)
        sigma = jnp.full((1,), 0.5, jnp.float32)
        noisy = 0.5 * lat  # deterministic "noisy" input
        pred = t.adapter.predict_velocity(t.bundle.dit_params, emb, noisy, sigma)
        singles.append(np.asarray(pred))

    # padded mixed batch
    batch = collate(items)
    assert "valid_masks" in batch
    emb = t._embeddings_for_batch(batch)
    assert "segment_ids" in emb and "attention_mask" in emb
    emb_j = {k: jnp.asarray(v) for k, v in emb.items() if not isinstance(v, (list, dict))}
    lat = emb_j["image_latents"].astype(jnp.float32)
    sigma = jnp.full((2,), 0.5, jnp.float32)
    pred = np.asarray(t.adapter.predict_velocity(t.bundle.dit_params, emb_j,
                                                 0.5 * lat, sigma))
    for i, single in enumerate(singles):
        n = single.shape[1]
        np.testing.assert_allclose(pred[i:i + 1, :n], single, atol=3e-3,
                                   err_msg=f"{trainer_kind} sample {i}")


def test_multires_train_step_runs(tmp_path, rng):
    import optax

    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.trainer.train_step import TrainState, TrainStepConfig, make_train_step

    t = Trainer(_cfg("FluxKontextLoraTrainer", tmp_path))
    t.load_model()
    items = _cache_items(t, rng, [(32, 32), (32, 48)])
    batch = collate(items)
    emb = t._embeddings_for_batch(batch)
    emb = {k: jnp.asarray(v) for k, v in emb.items() if not isinstance(v, (list, dict))}

    opt = optax.adamw(1e-3)
    step = make_train_step(t.adapter.predict_velocity, AttentionMaskMseLoss(), opt,
                           TrainStepConfig())
    lora = build_lora_tree(jax.random.PRNGKey(1), t.bundle.dit_params,
                           [r"attn/to_q"], rank=2, alpha=2)
    state, metrics = step(TrainState.create(lora, opt), t.bundle.dit_params, emb,
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
