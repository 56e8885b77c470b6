"""Named remat save points (ops/layers.named_checkpoint + the flash_mlp
policy): the saved hidden must eliminate the producing GEMM from the backward
recompute, keep gradients exact, and train the tiny model identically to the
flash policy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.ops.layers import named_checkpoint


def _flops(fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return ca.get("flops")


def test_named_checkpoint_is_identity():
    h = jax.random.normal(jax.random.PRNGKey(0), (8, 64), jnp.float32) * 100
    y = named_checkpoint(h, "t")
    np.testing.assert_array_equal(np.asarray(y), np.asarray(h))
    g = jax.grad(lambda h: jnp.sum(named_checkpoint(h, "t") ** 2))(h)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(h), rtol=1e-6)


def test_named_save_eliminates_gemm_recompute_under_scan():
    """HLO cost analysis: with the hidden saved, the backward scan body must
    NOT re-run the hidden GEMM. (XLA cost analysis counts the scan body
    ONCE — per-iteration flops.)"""
    M, K, H, L = 512, 512, 2048, 4
    Ws = jax.random.normal(jax.random.PRNGKey(0), (L, K, H), jnp.float32) * 0.05
    Vs = jax.random.normal(jax.random.PRNGKey(1), (L, H, K), jnp.float32) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(2), (M, K))

    def make(saved):
        def block(c, wv):
            w, v = wv
            h = named_checkpoint(c @ w, "h")
            return jax.nn.gelu(h) @ v + c, None

        pol = jax.checkpoint_policies.save_only_these_names(
            *(("h",) if saved else ()))
        blk = jax.checkpoint(block, policy=pol, prevent_cse=False)
        return jax.grad(lambda x: jnp.sum(jax.lax.scan(blk, x, (Ws, Vs))[0] ** 2))

    f_nosave = _flops(make(False), x)
    f_saved = _flops(make(True), x)
    gemm_per_layer = 2 * M * K * H
    assert f_nosave - f_saved > 0.5 * gemm_per_layer, (f_nosave, f_saved)


def test_flash_mlp_policy_trains_tiny_flux_exactly():
    """Tiny FLUX under remat_policy=flash_mlp must reproduce the flash-policy
    loss trajectory exactly (the save point is a no-op on values)."""
    import optax

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.trainer.train_step import (TrainState, TrainStepConfig,
                                              make_train_step)
    from __graft_entry__ import _flux_inputs

    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = _flux_inputs(cfg, batch=2, grid_h=4, grid_w=4, txt_len=8,
                         dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)

    def losses(policy):
        adapter = FluxKontextAdapter(cfg, attn_impl="xla", remat=True,
                                     remat_policy=policy)
        opt = optax.adamw(1e-3)
        step = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                               TrainStepConfig())
        lora = build_lora_tree(jax.random.PRNGKey(1), params,
                               [r"attn/(to_q|to_k|to_v)"], rank=2, alpha=2)
        state = TrainState.create(lora, opt)
        out = []
        for _ in range(5):
            state, m = step(state, params, batch, rng)
            out.append(float(m["loss"]))
        return out

    l_flash = losses("flash")
    l_mlp = losses("flash_mlp")
    assert all(np.isfinite(l_mlp))
    np.testing.assert_allclose(l_mlp, l_flash, rtol=1e-5)


def test_flash_offload_policy_trains_tiny_flux_exactly():
    """remat_policy=flash_offload (flash residuals parked in host memory
    across fwd→bwd — the 16 GB-chip escape hatch for the 832×576 wall) must
    reproduce the flash-policy loss trajectory exactly: offload only moves
    residuals, never changes values."""
    import optax

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.trainer.train_step import (TrainState, TrainStepConfig,
                                              make_train_step)
    from __graft_entry__ import _flux_inputs

    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = _flux_inputs(cfg, batch=1, grid_h=4, grid_w=4, txt_len=8,
                         dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)

    def losses(policy):
        adapter = FluxKontextAdapter(cfg, attn_impl="xla", remat=True,
                                     remat_policy=policy)
        opt = optax.adamw(1e-3)
        step = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                               TrainStepConfig())
        lora = build_lora_tree(jax.random.PRNGKey(1), params,
                               [r"attn/(to_q|to_k|to_v)"], rank=2, alpha=2)
        state = TrainState.create(lora, opt)
        out = []
        for _ in range(3):
            state, m = step(state, params, batch, rng)
            out.append(float(m["loss"]))
        return out

    np.testing.assert_allclose(losses("flash_offload"), losses("flash"),
                               rtol=1e-5)


def test_flash_single_policy_trains_tiny_flux_exactly():
    """remat_policy=flash_single (flash saves on single blocks, full
    recompute on dual blocks — the long-sequence HBM middle ground) must
    reproduce the flash-policy loss trajectory exactly."""
    import optax

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.trainer.train_step import (TrainState, TrainStepConfig,
                                              make_train_step)
    from __graft_entry__ import _flux_inputs

    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = _flux_inputs(cfg, batch=1, grid_h=4, grid_w=4, txt_len=8,
                         dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)

    def losses(policy):
        adapter = FluxKontextAdapter(cfg, attn_impl="xla", remat=True,
                                     remat_policy=policy)
        opt = optax.adamw(1e-3)
        step = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                               TrainStepConfig())
        lora = build_lora_tree(jax.random.PRNGKey(1), params,
                               [r"attn/(to_q|to_k|to_v)"], rank=2, alpha=2)
        state = TrainState.create(lora, opt)
        out = []
        for _ in range(4):
            state, m = step(state, params, batch, rng)
            out.append(float(m["loss"]))
        return out

    l_flash = losses("flash")
    l_single = losses("flash_single")
    assert all(np.isfinite(l_single))
    np.testing.assert_allclose(l_single, l_flash, rtol=1e-5)
