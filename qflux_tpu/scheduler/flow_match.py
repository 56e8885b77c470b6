"""Flow-match Euler scheduler as pure functions + a static plan object.

TPU-native re-design of the reference's scheduler layer (reference
scheduler/custom_flowmatch_scheduler.py:33-209 plus the diffusers
FlowMatchEulerDiscreteScheduler it extends): instead of a stateful object with
`.timesteps` mutated by `set_timesteps`, we build an immutable `SamplerPlan`
(numpy, host-side, static under jit) and run the Euler update as a pure
function inside `lax.scan`.

Conventions (identical to the reference):
  * sigma == t/1000 ∈ (0, 1]; x_t = (1 - σ) x0 + σ ε  (forward ODE,
    reference custom_flowmatch_scheduler.py:96-107)
  * model predicts v = ε - x0; Euler step: x_{i+1} = x_i + (σ_{i+1} - σ_i) v
  * dynamic shift: σ' = exp(μ) / (exp(μ) + (1/σ - 1)), with μ linear in image
    sequence length (calculate_shift, reference :20-30)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

NUM_TRAIN_TIMESTEPS = 1000

# FLUX/Qwen flow-match defaults (reference scheduler_config,
# custom_flowmatch_scheduler.py:9-17)
BASE_IMAGE_SEQ_LEN = 256
MAX_IMAGE_SEQ_LEN = 4096
BASE_SHIFT = 0.5
MAX_SHIFT = 1.15


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = BASE_IMAGE_SEQ_LEN,
    max_seq_len: int = MAX_IMAGE_SEQ_LEN,
    base_shift: float = BASE_SHIFT,
    max_shift: float = MAX_SHIFT,
) -> float:
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def time_shift(mu: float, sigma: float, t):
    """diffusers FlowMatch 'exponential' time shift."""
    return np.exp(mu) / (np.exp(mu) + (1 / t - 1) ** sigma)


@dataclasses.dataclass(frozen=True)
class SamplerPlan:
    """Static inference-time schedule: sigmas has num_steps+1 entries
    (terminal 0 appended), timesteps = sigmas[:-1] * 1000."""

    sigmas: np.ndarray
    timesteps: np.ndarray

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)


class FlowMatchScheduler:
    """Host-side planner + pure device-side math.

    shift: static shift factor used when use_dynamic_shifting=False
    (σ' = s·σ / (1 + (s-1)σ)).
    """

    def __init__(
        self,
        num_train_timesteps: int = NUM_TRAIN_TIMESTEPS,
        shift: float = 3.0,
        use_dynamic_shifting: bool = True,
        base_image_seq_len: int = BASE_IMAGE_SEQ_LEN,
        max_image_seq_len: int = MAX_IMAGE_SEQ_LEN,
        base_shift: float = BASE_SHIFT,
        max_shift: float = MAX_SHIFT,
        shift_terminal: float | None = None,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift
        self.use_dynamic_shifting = use_dynamic_shifting
        self.base_image_seq_len = base_image_seq_len
        self.max_image_seq_len = max_image_seq_len
        self.base_shift = base_shift
        self.max_shift = max_shift
        self.shift_terminal = shift_terminal

    # -- planning (host, static) ------------------------------------------

    def sampling_plan(self, num_steps: int, image_seq_len: int | None = None) -> SamplerPlan:
        sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
        if self.use_dynamic_shifting:
            if image_seq_len is None:
                raise ValueError("dynamic shifting requires image_seq_len")
            mu = calculate_shift(
                image_seq_len,
                self.base_image_seq_len,
                self.max_image_seq_len,
                self.base_shift,
                self.max_shift,
            )
            sigmas = time_shift(mu, 1.0, sigmas)
        else:
            sigmas = self.shift * sigmas / (1 + (self.shift - 1) * sigmas)
        if self.shift_terminal:
            # stretch so the schedule terminates at σ = shift_terminal instead
            # of σ_min (diffusers FlowMatch `stretch_shift_to_terminal`; the
            # reference reaches it through scheduler config passthrough)
            one_minus = 1.0 - sigmas
            scale = one_minus[-1] / (1.0 - self.shift_terminal)
            sigmas = 1.0 - one_minus / scale
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return SamplerPlan(sigmas=sigmas, timesteps=sigmas[:-1] * self.num_train_timesteps)

    def train_timesteps(
        self,
        num_timesteps: int,
        timestep_type: str = "linear",
        rng: np.random.Generator | None = None,
        alpha: float = 0.75,
        image_seq_len: int | None = None,
    ) -> np.ndarray:
        """Training-time timestep grids (descending, host-side numpy) —
        parity with the reference's `set_train_timesteps`
        (reference custom_flowmatch_scheduler.py:112-209):

        * "linear"/"weighted": linspace(1000, 1, n) — "weighted" uses the same
          grid; only the loss weights differ (weighting.weights_for_sigmas).
        * "sigmoid": t = 1000·(1 − sigmoid(z)), z ~ N(0,1), sorted descending
          (center-biased).
        * "shift": the dynamic/static-shift grid — identical math to
          `sampling_plan(n, image_seq_len).timesteps`.
        * "lognorm_blend": α·n draws t = (1 − x/max(x))·1000 with
          x ~ LogNormal(0, 0.333), blended with (1−α)·n linear steps, sorted
          descending, truncated to int.

        Randomized types use numpy's Generator — distributionally identical
        to the reference's torch draws (asserted against captured goldens in
        tests/scheduler/test_sampler_goldens.py), not bit-equal.
        """
        if timestep_type in ("linear", "weighted"):
            return np.linspace(1000.0, 1.0, num_timesteps, dtype=np.float32)
        if timestep_type == "sigmoid":
            if rng is None:
                raise ValueError("sigmoid grid needs an rng")
            t = 1.0 / (1.0 + np.exp(-rng.standard_normal(num_timesteps)))
            return np.sort((1.0 - t) * 1000.0)[::-1].astype(np.float32)
        if timestep_type == "shift":
            return self.sampling_plan(
                num_timesteps, image_seq_len=image_seq_len).timesteps
        if timestep_type == "lognorm_blend":
            if rng is None:
                raise ValueError("lognorm_blend grid needs an rng")
            n1 = int(num_timesteps * alpha)
            x = rng.lognormal(mean=0.0, sigma=0.333, size=n1)
            t1 = (1.0 - x / x.max()) * 1000.0
            t2 = np.linspace(1000.0, 1.0, int(num_timesteps * (1 - alpha)))
            ts = np.sort(np.concatenate([t1, t2]))[::-1]
            return ts.astype(np.int64).astype(np.float32)
        raise ValueError(f"invalid timestep type {timestep_type!r}")

    # -- training-time noising (device, pure) ------------------------------

    @staticmethod
    def add_noise(x0: jax.Array, noise: jax.Array, sigma: jax.Array) -> jax.Array:
        """x_t = (1-σ)x0 + σ·ε, σ ∈ [0,1], broadcast over trailing dims."""
        sigma = sigma.reshape(sigma.shape + (1,) * (x0.ndim - sigma.ndim))
        return (1.0 - sigma) * x0 + sigma * noise

    @staticmethod
    def training_target(x0: jax.Array, noise: jax.Array) -> jax.Array:
        return noise - x0

    # -- Euler step (device, pure) -----------------------------------------

    @staticmethod
    def step(latents: jax.Array, v_pred: jax.Array, sigma: jax.Array, sigma_next: jax.Array) -> jax.Array:
        return latents + (sigma_next - sigma) * v_pred.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Training-time timestep sampling

def compute_density_for_timestep_sampling(
    rng: jax.Array,
    batch_size: int,
    weighting_scheme: str = "uniform",
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    mode_scale: float = 1.29,
) -> jax.Array:
    """Sample training σ ∈ (0,1). Mirrors diffusers' helper used by the Qwen
    trainer (reference qwen_image_edit_trainer.py:796-811)."""
    if weighting_scheme == "logit_normal":
        u = jax.random.normal(rng, (batch_size,)) * logit_std + logit_mean
        return jax.nn.sigmoid(u)
    if weighting_scheme == "mode":
        u = jax.random.uniform(rng, (batch_size,))
        return 1.0 - u - mode_scale * (jnp.cos(jnp.pi * u / 2) ** 2 - 1.0 + u)
    if weighting_scheme != "uniform":
        raise ValueError(f"unknown timestep sampling scheme {weighting_scheme!r}")
    return jax.random.uniform(rng, (batch_size,))


def sample_training_sigmas(
    rng: jax.Array,
    batch_size: int,
    scheme: str = "uniform",
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    shift: float = 3.0,
) -> jax.Array:
    """σ sampling for the train step.

    "uniform" matches the FLUX trainer (t ~ U[0,1], reference
    flux_kontext_trainer.py:520-525); "logit_normal" + static shift matches the
    Qwen trainer's density sampling mapped through scheduler sigmas
    (reference qwen_image_edit_trainer.py:796-811).
    """
    if scheme == "shift":
        u = jax.random.uniform(rng, (batch_size,))
        return shift * u / (1 + (shift - 1) * u)
    sigmas = compute_density_for_timestep_sampling(rng, batch_size, scheme, logit_mean, logit_std)
    if scheme == "logit_normal":
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    return sigmas
