import jax
import jax.numpy as jnp
import numpy as np

from qflux_tpu.scheduler import FlowMatchScheduler, calculate_shift
from qflux_tpu.scheduler.flow_match import sample_training_sigmas
from qflux_tpu.scheduler.weighting import bell_weights, half_bell_weights, weights_for_sigmas


def test_calculate_shift_endpoints():
    assert np.isclose(calculate_shift(256), 0.5)
    assert np.isclose(calculate_shift(4096), 1.15)
    # linear in between
    mid = calculate_shift((256 + 4096) / 2)
    assert np.isclose(mid, (0.5 + 1.15) / 2)


def test_sampling_plan_dynamic_shift():
    sch = FlowMatchScheduler(use_dynamic_shifting=True)
    plan = sch.sampling_plan(num_steps=20, image_seq_len=1024)
    assert plan.num_steps == 20
    assert plan.sigmas.shape == (21,)
    assert plan.sigmas[0] > plan.sigmas[-1]
    assert plan.sigmas[-1] == 0.0
    assert np.isclose(plan.sigmas[0], 1.0)  # time_shift(mu, 1, 1) == 1
    # monotonic decreasing
    assert np.all(np.diff(plan.sigmas) < 1e-9)


def test_sampling_plan_static_shift():
    sch = FlowMatchScheduler(use_dynamic_shifting=False, shift=3.0)
    plan = sch.sampling_plan(num_steps=10)
    # sigma' = 3σ/(1+2σ): at σ=1 → 1
    assert np.isclose(plan.sigmas[0], 1.0)


def test_add_noise_and_step_roundtrip():
    """One Euler step with the exact target velocity must reach x at σ_next."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 4))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 4))
    sigma = jnp.array([0.7, 0.7])
    xt = FlowMatchScheduler.add_noise(x0, noise, sigma)
    v = FlowMatchScheduler.training_target(x0, noise)
    x_next = FlowMatchScheduler.step(xt, v, 0.7, 0.4)
    expected = FlowMatchScheduler.add_noise(x0, noise, jnp.array([0.4, 0.4]))
    np.testing.assert_allclose(np.asarray(x_next), np.asarray(expected), atol=1e-5)


def test_training_sigma_schemes():
    key = jax.random.PRNGKey(0)
    for scheme in ["uniform", "logit_normal", "shift"]:
        s = sample_training_sigmas(key, 512, scheme=scheme)
        s = np.asarray(s)
        assert s.shape == (512,)
        assert (s >= 0).all() and (s <= 1).all()


def test_bell_weights_properties():
    w = bell_weights()
    assert w.shape == (1000,)
    assert np.isclose(w.mean(), 1.0)
    assert w.argmax() == 500
    assert np.isclose(w.min(), 0.0)
    h = half_bell_weights()
    assert np.allclose(h[500:], h.max())


def test_weights_for_sigmas_lookup():
    # σ=0.5 → timestep 500 → index ~500 (peak of the bell)
    w = weights_for_sigmas(jnp.array([0.5]), "bell")
    assert np.isclose(float(w[0]), bell_weights()[500], atol=1e-2)
    w_none = weights_for_sigmas(jnp.array([0.3, 0.9]), "none")
    np.testing.assert_allclose(np.asarray(w_none), 1.0)
