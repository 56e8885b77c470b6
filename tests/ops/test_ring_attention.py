"""Ring attention (sequence parallel) vs single-device SDPA on the virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, AxisType

from qflux_tpu.ops.attention import sdpa_reference
from qflux_tpu.ops.ring_attention import ring_attention_sharded


@pytest.fixture(scope="module")
def sp_mesh():
    devs = np.asarray(jax.devices()[:4])
    return Mesh(devs, ("sp",), axis_types=(AxisType.Auto,))


def _qkv(key, b, s, h, d):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, s, h, d)) for k in ks)


def test_ring_matches_sdpa(sp_mesh):
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, 128, 2, 16)
    out = ring_attention_sharded(q, k, v, sp_mesh, "sp")
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_with_segments(sp_mesh):
    key = jax.random.PRNGKey(1)
    q, k, v = _qkv(key, 1, 128, 2, 16)
    seg = np.ones((1, 128), np.int32)
    seg[0, 100:] = 0       # padding
    seg[0, :40] = 2        # a second segment
    seg = jnp.asarray(seg)
    out = ring_attention_sharded(q, k, v, sp_mesh, "sp", segment_ids=seg)
    ref = sdpa_reference(q, k, v, segment_ids=seg)
    valid = np.asarray(seg)[0] != 0
    np.testing.assert_allclose(np.asarray(out)[0, valid], np.asarray(ref)[0, valid],
                               atol=2e-5)


def test_ring_gradients_flow(sp_mesh):
    q, k, v = _qkv(jax.random.PRNGKey(2), 1, 64, 1, 8)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention_sharded(q, k, v, sp_mesh, "sp") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_ring_custom_vjp_matches_sdpa_grads(sp_mesh):
    """The O(S_local) custom VJP must produce the same dq/dk/dv as autodiff
    through the dense SDPA reference."""
    q, k, v = _qkv(jax.random.PRNGKey(2), 1, 128, 2, 16)
    seg = np.ones((1, 128), np.int32)
    seg[0, 112:] = 0
    seg = jnp.asarray(seg)

    def loss_ring(q, k, v):
        out = ring_attention_sharded(q, k, v, sp_mesh, "sp", segment_ids=seg)
        return jnp.sum(jnp.where(seg[..., None, None] != 0, out, 0.0) ** 2)

    def loss_ref(q, k, v):
        out = sdpa_reference(q, k, v, segment_ids=seg)
        return jnp.sum(jnp.where(seg[..., None, None] != 0, out, 0.0) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=5e-5, rtol=1e-4)


def test_train_step_sp2_matches_sp1():
    """Full jitted LoRA train step with attn routed through ring attention
    (sp=2 mesh) must match the sp=1 XLA-attention step numerically."""
    import optax

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.parallel import MeshConfig, build_mesh
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.trainer.train_step import (TrainState, TrainStepConfig,
                                              make_train_step)
    from qflux_tpu.ops.rope import flux_image_ids, flux_text_ids

    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lora = jax.tree.map(np.asarray, build_lora_tree(
        jax.random.PRNGKey(1), params, [r"attn/(to_q|to_v)"], rank=4, alpha=4))
    # joint seq = 8 txt + 2*64 img/ctl = 136 — divisible by sp=2
    h = w = 8
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    batch = {
        "image_latents": jax.random.normal(ks[0], (2, h * w, cfg.in_channels)),
        "control_latents": jax.random.normal(ks[1], (2, h * w, cfg.in_channels)),
        "prompt_embeds": jax.random.normal(ks[2], (2, 8, cfg.joint_attention_dim)),
        "pooled_prompt_embeds": jax.random.normal(ks[3], (2, cfg.pooled_projection_dim)),
        "img_ids": jnp.asarray(np.concatenate([flux_image_ids(h, w, 0),
                                               flux_image_ids(h, w, 1)])),
        "txt_ids": jnp.asarray(flux_text_ids(8)),
    }
    opt = optax.sgd(1e-3)
    results = {}
    for name, mc, impl in [("sp1", MeshConfig(dp=1, fsdp=1, sp=1), "xla"),
                           ("sp2", MeshConfig(dp=1, fsdp=1, sp=2), "auto")]:
        mesh = build_mesh(mc)  # sets the active mesh the dispatcher sees
        adapter = FluxKontextAdapter(cfg, attn_impl=impl, remat=False)
        step = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                               TrainStepConfig(max_grad_norm=0))
        state = TrainState.create(jax.tree.map(jnp.asarray, lora), opt)
        state, m = step(state, params, batch, jax.random.PRNGKey(3))
        results[name] = (float(m["loss"]), jax.tree.map(np.asarray, state.lora))
    build_mesh(MeshConfig(dp=1, fsdp=1))  # restore an sp=1 active mesh
    np.testing.assert_allclose(results["sp1"][0], results["sp2"][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(results["sp1"][1]),
                    jax.tree.leaves(results["sp2"][1])):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-4)


def test_train_step_sp2_fsdp2_sharded_base_matches_replicated():
    """Ring attention composed with an FSDP-SHARDED frozen base — the
    realistic long-sequence pod configuration (VERDICT r4 #6: sp had only
    ever run with replicated weights).  A dp2xfsdp2xsp2 train step with
    shard_pytree(mmdit_rules()) base params must match the same step with a
    fully replicated base bit-for-tolerance."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.parallel import MeshConfig, build_mesh, shard_pytree
    from qflux_tpu.parallel.partitioning import mmdit_rules
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.trainer.train_step import (TrainState, TrainStepConfig,
                                              make_train_step)
    from qflux_tpu.ops.rope import flux_image_ids, flux_text_ids

    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lora = jax.tree.map(np.asarray, build_lora_tree(
        jax.random.PRNGKey(1), params, [r"attn/(to_q|to_v)"], rank=4, alpha=4))
    h = w = 8
    bsz = 4  # divides dp*fsdp = 4
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    batch = {
        "image_latents": jax.random.normal(ks[0], (bsz, h * w, cfg.in_channels)),
        "control_latents": jax.random.normal(ks[1], (bsz, h * w, cfg.in_channels)),
        "prompt_embeds": jax.random.normal(ks[2], (bsz, 8, cfg.joint_attention_dim)),
        "pooled_prompt_embeds": jax.random.normal(ks[3], (bsz, cfg.pooled_projection_dim)),
        "img_ids": jnp.asarray(np.concatenate([flux_image_ids(h, w, 0),
                                               flux_image_ids(h, w, 1)])),
        "txt_ids": jnp.asarray(flux_text_ids(8)),
    }
    opt = optax.sgd(1e-3)
    results = {}
    for name in ("replicated", "fsdp_sharded"):
        mesh = build_mesh(MeshConfig(dp=2, fsdp=2, tp=1, sp=2))
        if name == "fsdp_sharded":
            base = shard_pytree(params, mmdit_rules(), mesh)
            # at least one kernel must actually be split over fsdp for the
            # test to mean anything
            shardings = {s.spec for s in jax.tree.leaves(
                jax.tree.map(lambda x: x.sharding, base))}
            assert any(s != P() for s in shardings), shardings
        else:
            base = jax.device_put(params, NamedSharding(mesh, P()))
        adapter = FluxKontextAdapter(cfg, attn_impl="auto", remat=False)
        step = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                               TrainStepConfig(max_grad_norm=0), mesh=mesh)
        state = TrainState.create(jax.tree.map(jnp.asarray, lora), opt)
        state, m = step(state, base, batch, jax.random.PRNGKey(3))
        results[name] = (float(m["loss"]), jax.tree.map(np.asarray, state.lora))
    build_mesh(MeshConfig(dp=1, fsdp=1))  # restore an sp=1 active mesh
    np.testing.assert_allclose(results["replicated"][0],
                               results["fsdp_sharded"][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(results["replicated"][1]),
                    jax.tree.leaves(results["fsdp_sharded"][1])):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-4)


def test_ring_kernel_hop_path_matches_sdpa(sp_mesh, monkeypatch):
    """The Pallas-kernel hop path (TPU default; interpret mode here) must
    match SDPA for values AND the custom-VJP gradients, with segments."""
    import qflux_tpu.ops.ring_attention as ra

    monkeypatch.setattr(ra, "_use_kernel", lambda: True)
    q, k, v = _qkv(jax.random.PRNGKey(3), 1, 128, 2, 128)
    seg = np.ones((1, 128), np.int32)
    seg[0, 112:] = 0
    seg[0, :24] = 2
    seg = jnp.asarray(seg)

    out = ring_attention_sharded(q, k, v, sp_mesh, "sp", segment_ids=seg)
    ref = sdpa_reference(q, k, v, segment_ids=seg)
    valid = np.asarray(seg)[0] != 0
    np.testing.assert_allclose(np.asarray(out)[0, valid],
                               np.asarray(ref)[0, valid], atol=5e-5)

    def loss_ring(q, k, v):
        o = ring_attention_sharded(q, k, v, sp_mesh, "sp", segment_ids=seg)
        return jnp.sum(jnp.where(seg[..., None, None] != 0, o, 0.0) ** 2)

    def loss_ref(q, k, v):
        o = sdpa_reference(q, k, v, segment_ids=seg)
        return jnp.sum(jnp.where(seg[..., None, None] != 0, o, 0.0) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=1e-4, rtol=1e-4)


def test_ring_kernel_path_matches_einsum_path(sp_mesh, monkeypatch):
    """Kernel-hop ring vs einsum-hop ring under the SAME 4-device ppermute
    ring: both paths implement identical online-softmax math, so values and
    custom-VJP grads must agree to accumulation-order noise (VERDICT r3 #4 —
    the hop kernels composed with ppermute across >=2 devices)."""
    import qflux_tpu.ops.ring_attention as ra

    q, k, v = _qkv(jax.random.PRNGKey(9), 1, 128, 2, 128)
    seg = np.ones((1, 128), np.int32)
    seg[0, 112:] = 0
    seg[0, :24] = 2
    seg = jnp.asarray(seg)

    def run(force_kernel):
        monkeypatch.setattr(ra, "_use_kernel", lambda: force_kernel)

        def loss(q_, k_, v_):
            o = ring_attention_sharded(q_, k_, v_, sp_mesh, "sp", segment_ids=seg)
            return jnp.sum(jnp.where(seg[..., None, None] != 0, o, 0.0) ** 2)

        out = ring_attention_sharded(q, k, v, sp_mesh, "sp", segment_ids=seg)
        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return np.asarray(out), [np.asarray(g) for g in grads]

    out_k, g_k = run(True)
    out_e, g_e = run(False)
    valid = np.asarray(seg)[0] != 0
    np.testing.assert_allclose(out_k[0, valid], out_e[0, valid], atol=2e-6)
    for a, b in zip(g_k, g_e):
        np.testing.assert_allclose(a, b, atol=2e-5)
