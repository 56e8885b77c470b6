import numpy as np
import pytest

import jax.numpy as jnp

from qflux_tpu.scheduler import FlowMatchScheduler
from qflux_tpu.trainer.sampling import SamplingConfig, make_sampler


def test_plan_single_step():
    plan = FlowMatchScheduler().sampling_plan(1, image_seq_len=256)
    assert plan.num_steps == 1
    assert plan.sigmas.tolist() == pytest.approx([1.0, 0.0])


def test_dynamic_shift_monotone_in_seq_len():
    """Longer sequences shift sigmas higher (more high-noise steps) — the
    FLUX dynamic-shift behavior."""
    s = FlowMatchScheduler()
    p_small = s.sampling_plan(10, image_seq_len=256)
    p_big = s.sampling_plan(10, image_seq_len=4096)
    assert (p_big.sigmas[1:-1] >= p_small.sigmas[1:-1]).all()


def test_sampler_deterministic():
    def fake_velocity(params, batch, lat, sigma):
        return lat * 0.1 + sigma[:, None, None] * 0.01

    sampler = make_sampler(fake_velocity, SamplingConfig())
    lat0 = jnp.ones((1, 4, 2))
    plan = FlowMatchScheduler().sampling_plan(4, image_seq_len=4)
    o1 = sampler(None, {}, lat0, jnp.asarray(plan.sigmas))
    o2 = sampler(None, {}, lat0, jnp.asarray(plan.sigmas))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_cfg_combination_math():
    """true-CFG: v = neg + s·(pos − neg); with pos == neg it must equal pos."""
    def vel(params, batch, lat, sigma):
        return jnp.ones_like(lat) * 0.5

    sampler = make_sampler(vel, SamplingConfig(true_cfg_scale=4.0))
    lat0 = jnp.zeros((1, 4, 2))
    batch = {"prompt_embeds": jnp.ones((1, 2, 3)),
             "neg_prompt_embeds": jnp.ones((1, 2, 3))}
    plan = FlowMatchScheduler().sampling_plan(2, image_seq_len=4)
    out = sampler(None, batch, lat0, jnp.asarray(plan.sigmas))
    # dx integrates v=0.5 from σ=1 → 0: x_final = 0 + (0-1)*0.5 = -0.5
    np.testing.assert_allclose(np.asarray(out), -0.5, atol=1e-5)
