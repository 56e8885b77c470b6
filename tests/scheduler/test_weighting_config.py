"""Timestep-weighting wiring: YAML knobs must actually change the loss
(round-1 gap: weighting_scheme was unreachable from config and
timestep_sampling=weighted silently degraded to uniform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qflux_tpu.config import Config
from qflux_tpu.scheduler.flow_match import sample_training_sigmas
from qflux_tpu.scheduler.weighting import (
    default_weighting_table,
    weights_for_sigmas,
)
from qflux_tpu.trainer.base import Trainer


def _trainer(**train):
    return Trainer(Config.model_validate({
        "mesh": {"dp": 1, "fsdp": 1, "tp": 1},
        "model": {"variant": "test"},
        "train": train,
    }))


def test_default_table_is_reference_shaped():
    tab = default_weighting_table()
    assert tab.shape == (1000,)
    assert abs(float(tab.mean()) - 1.0) < 1e-5  # mean-normalized
    # non-trivial shape: spans values on both sides of the mean
    assert tab.min() < 0.9 and tab.max() > 1.1
    assert tab[0] < 1.0  # high-noise end (index 0 ↔ σ=1) down-weighted


def test_step_config_resolves_weighted_scheme():
    t = _trainer(weighting_scheme="weighted")
    sc = t._build_step_config()
    assert sc.weighting_scheme == "table"
    assert sc.weighting_table is not None and len(sc.weighting_table) == 1000


def test_weighted_timestep_sampling_maps_to_table_weighting():
    t = _trainer(timestep_sampling="weighted")
    sc = t._build_step_config()
    assert sc.timestep_sampling == "uniform"
    assert sc.weighting_scheme == "table"


def test_custom_table_path(tmp_path):
    tab = np.linspace(2.0, 0.5, 10).astype(np.float32)
    p = tmp_path / "tab.npy"
    np.save(p, tab)
    t = _trainer(weighting_scheme="weighted", weighting_table=str(p))
    sc = t._build_step_config()
    np.testing.assert_allclose(sc.weighting_table, tab)


def test_bell_weighting_changes_loss():
    """Same batch/rng: bell-weighted loss must differ from unweighted."""
    from qflux_tpu.losses import MseLoss
    from qflux_tpu.trainer.train_step import TrainStepConfig, _loss_for_microbatch

    def fake_velocity(params, batch, noisy, sigma):
        return noisy * 0.1

    batch = {"image_latents": jax.random.normal(jax.random.PRNGKey(0), (4, 8, 4))}
    rng = jax.random.PRNGKey(1)
    l_none = _loss_for_microbatch({}, {}, batch, rng, fake_velocity, MseLoss(),
                                  TrainStepConfig(weighting_scheme="none"))
    l_bell = _loss_for_microbatch({}, {}, batch, rng, fake_velocity, MseLoss(),
                                  TrainStepConfig(weighting_scheme="bell"))
    tab = default_weighting_table()
    l_tab = _loss_for_microbatch(
        {}, {}, batch, rng, fake_velocity, MseLoss(),
        TrainStepConfig(weighting_scheme="table", weighting_table=tab))
    assert float(l_none) != float(l_bell)
    assert float(l_none) != float(l_tab)
    assert all(np.isfinite([float(l_none), float(l_bell), float(l_tab)]))


def test_table_weights_index_orientation():
    """σ=1 must hit table[0] (timestep 1000) and σ→0 the far end."""
    tab = np.arange(1000, dtype=np.float32)
    w = weights_for_sigmas(jnp.asarray([1.0, 0.001]), "table", table=tab)
    assert float(w[0]) == 0.0
    assert float(w[1]) == 999.0


def test_unknown_sampling_scheme_raises():
    with pytest.raises(ValueError, match="unknown timestep sampling"):
        sample_training_sigmas(jax.random.PRNGKey(0), 2, scheme="weighted")
