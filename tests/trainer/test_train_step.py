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
    """accum=2 takes the SAME flat [B,…] batch as accum=1 (the step reshapes
    internally) and its SGD update must exactly equal the manual average of
    the two microbatch gradients (same per-microbatch RNG folding)."""
    from qflux_tpu.trainer.train_step import _loss_for_microbatch

    cfg, params, lora, adapter = setup
    lr = 1e-3
    opt = optax.sgd(lr)
    step_cfg = TrainStepConfig(grad_accum_steps=2, max_grad_norm=0)
    step2 = make_train_step(adapter.predict_velocity, MseLoss(), opt, step_cfg)
    batch = _batch(cfg, b=4)
    fresh = lambda: jax.tree.map(jnp.asarray, lora)
    rng = jax.random.PRNGKey(3)
    s2, m2 = step2(TrainState.create(fresh(), opt), params, batch, rng)
    assert np.isfinite(float(m2["loss"]))

    # manual reference: fold_in(step=0), split into 2 microbatch rngs
    rngs = jax.random.split(jax.random.fold_in(rng, 0), 2)
    grads, losses = [], []
    for i in range(2):
        mb = {k: (v[2 * i: 2 * i + 2] if v.shape[0] == 4 else v)
              for k, v in batch.items()}
        l, g = jax.value_and_grad(
            lambda lo: _loss_for_microbatch(params, lo, mb, rngs[i],
                                            adapter.predict_velocity, MseLoss(),
                                            step_cfg))(fresh())
        grads.append(g)
        losses.append(float(l))
    mean_grad = jax.tree.map(lambda a, b: (a + b) / 2, *grads)
    # the step zeroes updates on "scaling" leaves (constants, not trainable)
    expect_lora = jax.tree_util.tree_map_with_path(
        lambda path, p, g: p if any(getattr(k, "key", None) == "scaling"
                                    for k in path) else p - lr * g,
        fresh(), mean_grad)
    np.testing.assert_allclose(float(m2["loss"]), np.mean(losses), rtol=1e-5)
    for got, want in zip(jax.tree.leaves(s2.lora), jax.tree.leaves(expect_lora)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=1e-6)


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
