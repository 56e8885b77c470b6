"""Scheduler/sampler parity against committed reference goldens.

The fixtures (tests/fixtures/scheduler_goldens.npz) were captured from the
reference's CustomFlowMatchEulerDiscreteScheduler + base-trainer sampling
recipe with diffusers stubbed (scripts/capture_scheduler_goldens.py) — this
tier NEVER skips, shrinking the real-weights parity IOU to VAE + weight
statistics only (VERDICT r4 #7).
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from qflux_tpu.scheduler.flow_match import (FlowMatchScheduler,
                                            calculate_shift)
from qflux_tpu.scheduler.weighting import (bell_weights,
                                           default_weighting_table,
                                           half_bell_weights,
                                           weights_for_sigmas)

FIX = Path(__file__).parents[1] / "fixtures" / "scheduler_goldens.npz"


@pytest.fixture(scope="module")
def g():
    return np.load(FIX)


@pytest.fixture(scope="module")
def sched():
    # the reference's scheduler_config (custom_flowmatch_scheduler.py:9-17)
    return FlowMatchScheduler(shift=3.0, use_dynamic_shifting=True)


def test_linear_train_grid(g, sched):
    ours = sched.train_timesteps(1000, "linear")
    np.testing.assert_allclose(ours, g["linear.timesteps"], rtol=1e-6)


def test_bell_weights_match(g):
    probe_t = g["weights.probe_timesteps"]
    # index math: the linear grid is linspace(1000, 1, 1000) → idx = 1000 - t
    sigmas = jnp.asarray(probe_t / 1000.0)
    np.testing.assert_allclose(np.asarray(weights_for_sigmas(sigmas, "bell")),
                               g["weights.bell"], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(weights_for_sigmas(sigmas, "half_bell")),
        g["weights.half_bell"], rtol=1e-5)
    # and the full tables agree entrywise with the closed-form recomputation
    np.testing.assert_allclose(bell_weights()[::97][: len(g["weights.bell"])],
                               g["weights.bell"], rtol=1e-5)
    assert half_bell_weights().shape == (1000,)


def test_weighting_table_is_the_references(g):
    np.testing.assert_allclose(default_weighting_table(),
                               g["weights.table"].astype(np.float32),
                               rtol=1e-6)


def test_get_sigmas_on_linear_grid(g):
    # reference get_sigmas maps a timestep on the train grid to σ = t/1000
    probe_t = g["weights.probe_timesteps"]
    np.testing.assert_allclose(probe_t / 1000.0, g["linear.sigmas_probe"],
                               rtol=1e-6)


def test_add_noise(g, sched):
    xt = sched.add_noise(jnp.asarray(g["noise.x0"]),
                         jnp.asarray(g["noise.eps"]),
                         jnp.asarray(g["noise.t"] / 1000.0))
    np.testing.assert_allclose(np.asarray(xt), g["noise.xt"],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("steps,seq", [(4, 1024), (20, 4096), (28, 1872),
                                       (50, 256)])
def test_dynamic_shift_plans(g, sched, steps, seq):
    mu = calculate_shift(seq)
    np.testing.assert_allclose(mu, g[f"plan.{steps}.{seq}.mu"], rtol=1e-9)
    plan = sched.sampling_plan(steps, image_seq_len=seq)
    np.testing.assert_allclose(plan.sigmas, g[f"plan.{steps}.{seq}.sigmas"],
                               rtol=2e-6)
    np.testing.assert_allclose(plan.timesteps,
                               g[f"plan.{steps}.{seq}.timesteps"], rtol=2e-6)


def test_static_shift_plan(g):
    s = FlowMatchScheduler(shift=3.0, use_dynamic_shifting=False)
    plan = s.sampling_plan(8)
    np.testing.assert_allclose(plan.sigmas, g["plan_static.sigmas"], rtol=2e-6)
    np.testing.assert_allclose(plan.timesteps, g["plan_static.timesteps"],
                               rtol=2e-6)


def test_shift_terminal_stretch(g):
    s = FlowMatchScheduler(shift=3.0, use_dynamic_shifting=False,
                           shift_terminal=0.1)
    plan = s.sampling_plan(8)
    np.testing.assert_allclose(plan.sigmas, g["plan_terminal.sigmas"],
                               rtol=2e-6)


def test_euler_trajectory(g, sched):
    plan = sched.sampling_plan(4, image_seq_len=1024)
    x = jnp.asarray(g["traj.x_init"])
    states = []
    for i, t_i in enumerate(plan.timesteps):
        v = 0.25 * x + t_i / 1000.0  # same deterministic "velocity" model
        x = FlowMatchScheduler.step(x, v, plan.sigmas[i], plan.sigmas[i + 1])
        states.append(np.asarray(x))
    np.testing.assert_allclose(np.stack(states), g["traj.states"],
                               rtol=1e-4, atol=1e-5)


def _deciles(x):
    return np.quantile(np.asarray(x, np.float64), np.linspace(0.05, 0.95, 19))


def test_sigmoid_grid_distribution(g, sched):
    ours = sched.train_timesteps(1000, "sigmoid",
                                 rng=np.random.default_rng(0))
    ref = g["sigmoid.timesteps"]
    assert ours[0] >= ours[-1] and 0 <= ours.min() and ours.max() <= 1000
    # torch vs numpy RNG streams differ — assert quantile-level agreement
    np.testing.assert_allclose(_deciles(ours), _deciles(ref), atol=35)


def test_lognorm_blend_grid_distribution(g, sched):
    """The reference rescales the lognormal draws by their own SAMPLE max
    ((1 − x/x.max())·1000), so every draw's quantiles shift by a random
    factor — point tolerances can't work across RNG streams.  Instead the
    golden draw must lie inside the envelope our sampler spans over seeds."""
    ref = g["lognorm_blend.timesteps"]
    draws = np.stack([
        _deciles(sched.train_timesteps(1000, "lognorm_blend",
                                       rng=np.random.default_rng(s)))
        for s in range(30)])
    ours0 = sched.train_timesteps(1000, "lognorm_blend",
                                  rng=np.random.default_rng(0))
    assert len(ours0) == len(ref) == 1000
    assert ours0[0] >= ours0[-1]
    lo, hi = draws.min(axis=0), draws.max(axis=0)
    ref_d = _deciles(ref)
    assert ((lo - 5 <= ref_d) & (ref_d <= hi + 5)).all(), (lo, ref_d, hi)
