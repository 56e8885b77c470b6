"""adamw8bit: blockwise-int8 moment states (reference bnb Adam8bit analogue,
base_trainer.py:884-916)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from qflux_tpu.ops.adam8bit import adamw8bit, scale_by_adam8bit


def _quad_problem():
    k = jax.random.PRNGKey(0)
    target = jax.random.normal(k, (64, 16))
    params = {"w": jnp.zeros((64, 16)), "b": jnp.zeros((257,))}  # odd size pads

    def loss(p):
        return jnp.mean((p["w"] - target) ** 2) + jnp.mean(p["b"] ** 2)

    return params, loss


def test_adam8bit_tracks_adamw():
    params, loss = _quad_problem()
    traj = {}
    for name, opt in [("adamw", optax.adamw(1e-2)),
                      ("adam8bit", adamw8bit(1e-2))]:
        p = jax.tree.map(jnp.asarray, params)
        state = opt.init(p)
        losses = []
        step = jax.jit(lambda p, s: (lambda g: opt.update(g, s, p))(jax.grad(loss)(p)))
        for _ in range(150):
            updates, state = step(p, state)
            p = optax.apply_updates(p, updates)
            losses.append(float(loss(p)))
        traj[name] = losses
    # both converge; 8-bit states track fp32 within a small factor
    assert traj["adam8bit"][-1] < 0.25 * traj["adam8bit"][0]
    assert abs(traj["adam8bit"][-1] - traj["adamw"][-1]) < 0.05 * traj["adamw"][0]


def test_moment_states_are_int8():
    params = {"w": jnp.zeros((300,))}
    opt = scale_by_adam8bit()
    state = opt.init(params)
    mom = state["moments"]["w"]
    assert mom["m"].q.dtype == jnp.float8_e4m3fn
    assert mom["v"].q.dtype == jnp.float8_e4m3fn
    assert mom["m"].scale.dtype == jnp.float32
    # 300 elements → 2 blocks of 256 (padded)
    assert mom["m"].q.shape == (512,) and mom["m"].scale.shape == (2,)


def test_state_memory_is_quarter_of_fp32():
    params = {"w": jnp.zeros((4096,))}
    s8 = scale_by_adam8bit().init(params)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(s8["moments"]))
    fp32 = 2 * 4096 * 4  # m+v float32
    assert nbytes < 0.3 * fp32


def test_config_instantiation():
    """Reachable from YAML via optimizer.class_path."""
    from qflux_tpu.utils.instantiate import resolve_symbol

    fn = resolve_symbol("qflux_tpu.ops.adam8bit.adamw8bit")
    opt = fn(learning_rate=1e-4, weight_decay=0.01)
    p = {"x": jnp.ones((10,))}
    state = opt.init(p)
    u, _ = opt.update({"x": jnp.ones((10,))}, state, p)
    assert np.isfinite(np.asarray(u["x"])).all()
