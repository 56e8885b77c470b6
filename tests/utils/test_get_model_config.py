import pytest

from qflux_tpu.utils.get_model_config import (
    KNOWN_CONFIGS,
    compare_model_configs,
    dump_model_config,
    get_model_config,
)


def test_all_known_configs_resolve():
    for name in KNOWN_CONFIGS:
        cfg = get_model_config(name)
        assert isinstance(cfg, dict) and cfg


def test_dump_and_compare():
    assert '"num_layers": 19' in dump_model_config("flux-kontext")
    diff = compare_model_configs("flux-kontext", "qwen-image")
    assert "num_layers" in diff  # 19 vs 60
    assert diff["num_layers"] == (19, 60)
    with pytest.raises(KeyError):
        get_model_config("nope")


def test_prodigy_optimizer_resolves():
    """The reference supports Prodigy via class_path (base_trainer.py:884-916);
    optax.contrib.prodigy serves the same config mechanism."""
    from qflux_tpu.utils.instantiate import resolve_symbol

    import jax.numpy as jnp

    opt = resolve_symbol("optax.contrib.prodigy")(learning_rate=1.0)
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    updates, _ = opt.update(jnp.ones(4) * 0.1 if False else {"w": jnp.ones(4) * 0.1},
                            state, params)
    assert "w" in updates
