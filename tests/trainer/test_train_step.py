"""End-to-end jitted train step + sampler on the tiny FLUX stack, including
GSPMD sharding over the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from qflux_tpu.losses import MseLoss
from qflux_tpu.models.flux import transformer as flux
from qflux_tpu.ops.layers import build_lora_tree
from qflux_tpu.ops.rope import flux_image_ids, flux_text_ids
from qflux_tpu.parallel import MeshConfig, build_mesh, shard_pytree
from qflux_tpu.parallel.partitioning import mmdit_rules
from qflux_tpu.scheduler import FlowMatchScheduler
from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
from qflux_tpu.trainer.sampling import SamplingConfig, make_sampler
from qflux_tpu.trainer.train_step import TrainState, TrainStepConfig, make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lora = build_lora_tree(jax.random.PRNGKey(1), params, [r"attn/(to_q|to_v)"],
                           rank=4, alpha=4)
    # the train step donates its state; keep the fixture's lora on host so
    # every test gets fresh device copies
    lora = jax.tree.map(np.asarray, lora)
    adapter = FluxKontextAdapter(cfg, attn_impl="xla", remat=False)
    return cfg, params, lora, adapter


def _batch(cfg, b=2, grid=(4, 4), txt_len=8):
    h, w = grid
    s = h * w
    k = jax.random.PRNGKey(7)
    ks = jax.random.split(k, 4)
    return {
        "image_latents": jax.random.normal(ks[0], (b, s, cfg.in_channels)),
        "control_latents": jax.random.normal(ks[1], (b, s, cfg.in_channels)),
        "prompt_embeds": jax.random.normal(ks[2], (b, txt_len, cfg.joint_attention_dim)),
        "pooled_prompt_embeds": jax.random.normal(ks[3], (b, cfg.pooled_projection_dim)),
        "img_ids": jnp.asarray(np.concatenate([flux_image_ids(h, w, 0), flux_image_ids(h, w, 1)])),
        "txt_ids": jnp.asarray(flux_text_ids(txt_len)),
    }


def test_train_step_reduces_loss(setup):
    cfg, params, lora, adapter = setup
    step = make_train_step(adapter.predict_velocity, MseLoss(), optax.adamw(1e-2),
                           TrainStepConfig(max_grad_norm=1.0))
    state = TrainState.create(lora, optax.adamw(1e-2))
    batch = _batch(cfg)
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(25):
        state, metrics = step(state, params, batch, rng)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 25
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert all(np.isfinite(losses))


def test_grad_accum_matches_big_batch(setup):
    """accum=2 over half-batches must roughly equal one big-batch step (same
    RNG folding differs, so compare gradient magnitudes not exact values)."""
    cfg, params, lora, adapter = setup
    opt = optax.sgd(1e-3)
    step1 = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                            TrainStepConfig(grad_accum_steps=1, max_grad_norm=0))
    step2 = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                            TrainStepConfig(grad_accum_steps=2, max_grad_norm=0))
    batch = _batch(cfg, b=4)
    micro = jax.tree.map(lambda x: x.reshape((2, 2) + x.shape[1:])
                         if x.shape and x.shape[0] == 4 else jnp.stack([x, x]), batch)
    # train_step donates its state — each call needs its own device copy
    fresh = lambda: jax.tree.map(jnp.asarray, lora)
    s1, m1 = step1(TrainState.create(fresh(), opt), params, batch, jax.random.PRNGKey(3))
    s2, m2 = step2(TrainState.create(fresh(), opt), params, micro, jax.random.PRNGKey(3))
    assert np.isfinite(float(m2["loss"]))
    # same order of magnitude losses
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 2.0


def test_train_step_sharded(setup):
    cfg, params, lora, adapter = setup
    mesh = build_mesh(MeshConfig(dp=2, fsdp=4, tp=1))
    params_sh = shard_pytree(params, mmdit_rules(), mesh)
    batch = _batch(cfg, b=8)
    bsh = NamedSharding(mesh, P(("dp", "fsdp")))
    batch = {k: jax.device_put(v, bsh) if v.ndim >= 2 and v.shape[0] == 8 else v
             for k, v in batch.items()}
    opt = optax.adamw(1e-2)
    step = make_train_step(adapter.predict_velocity, MseLoss(), opt, TrainStepConfig(),
                           mesh=mesh)
    lora_rep = jax.device_put(lora, NamedSharding(mesh, P()))
    state = TrainState.create(lora_rep, opt)
    state, metrics = step(state, params_sh, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # lora stays replicated (every device holds the full adapter)
    leaf = state.lora["dual"]["attn"]["to_q"]["a"]
    assert leaf.sharding.is_fully_replicated


def test_sampler_runs_and_cfg_path(setup):
    cfg, params, lora, adapter = setup
    batch = _batch(cfg, b=1)
    batch["neg_prompt_embeds"] = jnp.zeros_like(batch["prompt_embeds"])
    batch["neg_pooled_prompt_embeds"] = jnp.zeros_like(batch["pooled_prompt_embeds"])
    sch = FlowMatchScheduler()
    plan = sch.sampling_plan(8, image_seq_len=16)
    lat0 = jax.random.normal(jax.random.PRNGKey(0), batch["image_latents"][:1].shape)
    for cfg_scale in (1.0, 3.0):
        sampler = make_sampler(adapter.predict_velocity,
                               SamplingConfig(true_cfg_scale=cfg_scale))
        out = sampler(params, batch, lat0, jnp.asarray(plan.sigmas))
        assert out.shape == lat0.shape
        assert np.isfinite(np.asarray(out)).all()
