import numpy as np
import optax

import jax
import jax.numpy as jnp

from qflux_tpu.losses import MseLoss
from qflux_tpu.models.flux import transformer as flux
from qflux_tpu.ops.layers import build_lora_tree
from qflux_tpu.ops.rope import flux_image_ids, flux_text_ids
from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
from qflux_tpu.trainer.train_step import TrainState, TrainStepConfig, make_train_step


def test_lora_scaling_stays_constant():
    """alpha/r scaling leaves must never be updated (they are constants, not
    trainable params — AdamW weight decay would otherwise drift them)."""
    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lora = build_lora_tree(jax.random.PRNGKey(1), params, [r"attn/to_q"], rank=4, alpha=8)
    scaling_before = np.asarray(lora["dual"]["attn"]["to_q"]["scaling"]).copy()

    adapter = FluxKontextAdapter(cfg, attn_impl="xla", remat=False)
    opt = optax.adamw(1e-2, weight_decay=0.1)
    step = make_train_step(adapter.predict_velocity, MseLoss(), opt, TrainStepConfig())
    h = w = 4
    s = h * w
    batch = {
        "image_latents": jax.random.normal(jax.random.PRNGKey(2), (1, s, cfg.in_channels)),
        "control_latents": jax.random.normal(jax.random.PRNGKey(3), (1, s, cfg.in_channels)),
        "prompt_embeds": jax.random.normal(jax.random.PRNGKey(4), (1, 8, cfg.joint_attention_dim)),
        "pooled_prompt_embeds": jax.random.normal(jax.random.PRNGKey(5), (1, cfg.pooled_projection_dim)),
        "img_ids": jnp.asarray(np.concatenate([flux_image_ids(h, w, 0), flux_image_ids(h, w, 1)])),
        "txt_ids": jnp.asarray(flux_text_ids(8)),
    }
    state = TrainState.create(lora, opt)
    for _ in range(3):
        state, _ = step(state, params, batch, jax.random.PRNGKey(0))
    scaling_after = np.asarray(state.lora["dual"]["attn"]["to_q"]["scaling"])
    np.testing.assert_array_equal(scaling_before, scaling_after)
    # while the actual adapter matrices did move
    assert np.abs(np.asarray(state.lora["dual"]["attn"]["to_q"]["b"])).max() > 0
