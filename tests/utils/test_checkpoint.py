import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.trainer.train_step import TrainState
from qflux_tpu.utils.checkpoint import AsyncCheckpointer


def test_async_checkpoint_roundtrip(tmp_path):
    lora = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    opt = optax.adamw(1e-3)
    state = TrainState.create(lora, opt)

    ckpt = AsyncCheckpointer(tmp_path / "ckpt")
    ckpt.save(5, state)
    ckpt.wait()
    assert ckpt.latest_step() == 5

    zeros = jax.tree.map(jnp.zeros_like, state)
    restored = ckpt.restore(template=zeros)
    assert restored is not None
    np.testing.assert_allclose(np.asarray(restored.lora["a"]),
                               np.asarray(state.lora["a"]))
    assert int(restored.step) == 0
    ckpt.close()


def test_checkpoint_keeps_latest(tmp_path):
    ckpt = AsyncCheckpointer(tmp_path / "c2")
    state = {"x": jnp.ones(3)}
    for s in (1, 2, 3):
        ckpt.save(s, {"x": jnp.full(3, float(s))})
    ckpt.wait()
    assert ckpt.latest_step() == 3
    r = ckpt.restore(template={"x": jnp.zeros(3)})
    np.testing.assert_allclose(np.asarray(r["x"]), 3.0)
    ckpt.close()


def test_restore_empty_returns_none(tmp_path):
    ckpt = AsyncCheckpointer(tmp_path / "c3")
    assert ckpt.latest_step() is None
    assert ckpt.restore(template={"x": jnp.zeros(1)}) is None
    ckpt.close()
