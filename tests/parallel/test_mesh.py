import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from qflux_tpu.parallel import (
    MeshConfig,
    PartitionRules,
    build_mesh,
    named_sharding_tree,
    shard_pytree,
    spec_tree_from_rules,
)
from qflux_tpu.parallel.partitioning import clip_spec_to_shape, mmdit_rules


def test_mesh_resolution():
    assert MeshConfig(dp=2, fsdp=-1, tp=1).resolve(8) == {"dp": 2, "fsdp": 4, "tp": 1, "sp": 1}
    assert MeshConfig(dp=1, fsdp=4, tp=2).resolve(8) == {"dp": 1, "fsdp": 4, "tp": 2, "sp": 1}
    with pytest.raises(ValueError):
        MeshConfig(dp=3, fsdp=-1).resolve(8)


def test_build_mesh_8_cpu():
    mesh = build_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    assert dict(mesh.shape) == {"dp": 2, "fsdp": 2, "tp": 2, "sp": 1}


def test_clip_spec():
    mesh = build_mesh(MeshConfig(dp=1, fsdp=4, tp=2))
    # dim divisible: keep; not divisible: drop
    assert clip_spec_to_shape(P("fsdp", "tp"), (8, 6), mesh) == P("fsdp", "tp")
    assert clip_spec_to_shape(P("fsdp", "tp"), (6, 6), mesh) == P(None, "tp")
    assert clip_spec_to_shape(P("fsdp"), (3,), mesh) == P()


def test_rules_and_sharding():
    mesh = build_mesh(MeshConfig(dp=2, fsdp=4, tp=1))
    rules = PartitionRules([
        (r".*attn/to_q/kernel", P("fsdp", "tp")),
        (r".*bias", P()),
        (r".*", P("fsdp")),
    ])
    params = {
        "blocks": {"attn": {"to_q": {"kernel": jnp.zeros((8, 16)), "bias": jnp.zeros((16,))}}},
        "other": jnp.zeros((12, 4)),
    }
    specs = spec_tree_from_rules(params, rules, mesh)
    assert specs["blocks"]["attn"]["to_q"]["kernel"] == P("fsdp", "tp")
    assert specs["blocks"]["attn"]["to_q"]["bias"] == P()
    # specs right-align to trailing dims (leading stacked-layer axes replicate)
    assert specs["other"] == P(None, "fsdp")

    sharded = shard_pytree(params, rules, mesh)
    k = sharded["blocks"]["attn"]["to_q"]["kernel"]
    # actually distributed: each device holds 8/4 = 2 rows
    assert k.sharding.shard_shape(k.shape) == (2, 16)


def test_stacked_layer_axis_stays_replicated():
    """lax.scan requires xs dim 0 unsharded: a [L, in, out] kernel under a
    2-axis rule must shard (in, out), never L."""
    mesh = build_mesh(MeshConfig(dp=1, fsdp=4, tp=2))
    rules = PartitionRules([(r".*kernel", P("fsdp", "tp"))])
    params = {"blocks": {"kernel": jnp.zeros((19, 8, 6))}}
    spec = spec_tree_from_rules(params, rules, mesh)["blocks"]["kernel"]
    assert spec == P(None, "fsdp", "tp")


def test_mmdit_rules_smoke():
    mesh = build_mesh(MeshConfig(dp=1, fsdp=8, tp=1))
    rules = mmdit_rules()
    params = {
        "dual": {"attn": {"to_q": {"kernel": jnp.zeros((16, 16))}},
                 "img_mlp": {"in": {"kernel": jnp.zeros((16, 64))}}},
        "norm_out": {"proj": {"kernel": jnp.zeros((16, 32)), "bias": jnp.zeros((32,))}},
    }
    tree = named_sharding_tree(params, rules, mesh)
    assert tree["dual"]["attn"]["to_q"]["kernel"].spec == P("fsdp", "tp")


def test_psum_over_mesh():
    # real collective over the virtual 8-device mesh
    mesh = build_mesh(MeshConfig(dp=8, fsdp=1, tp=1))
    data = jnp.arange(8.0)

    @jax.jit
    def f(x):
        return jax.shard_map(
            lambda v: jax.lax.psum(v, "dp"),
            mesh=mesh, in_specs=P("dp"), out_specs=P(),
        )(x)

    np.testing.assert_allclose(f(data), np.full((1,), 28.0))
