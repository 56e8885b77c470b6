"""First-party torch stand-in for diffusers.FlowMatchEulerDiscreteScheduler.

Same role as tests/oracles/diffusers_stub.py for the DiT oracle: run the
reference's CustomFlowMatchEulerDiscreteScheduler
(reference src/qflux/scheduler/custom_flowmatch_scheduler.py:33-209) without
diffusers installed, so scheduler/sampler goldens can be captured offline
(scripts/capture_scheduler_goldens.py) and asserted in a never-skipped test
tier (tests/scheduler/test_sampler_goldens.py).

Re-implements the PUBLIC diffusers flow-match Euler semantics the reference
subclass relies on — default sigma grid, `_sigma_to_t`, exponential
`time_shift`, `set_timesteps(sigmas=…, mu=…)`, the Euler `step` update, and
ConfigMixin's dict-like `config` with attribute fallback (the reference calls
`self.config.get(…)` and bare `self.shift`).  Karras/exponential/beta sigma
conversions and non-exponential shift types are deliberately absent: the
reference scheduler_config never enables them, and this stub raises if asked.
"""

from __future__ import annotations

import math

import numpy as np
import torch


class FrozenConfig(dict):
    """diffusers ConfigMixin's FrozenDict surface: mapping + attributes."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)


_DEFAULTS = dict(
    num_train_timesteps=1000,
    shift=1.0,
    use_dynamic_shifting=False,
    base_shift=0.5,
    max_shift=1.15,
    base_image_seq_len=256,
    max_image_seq_len=4096,
    invert_sigmas=False,
    shift_terminal=None,
    use_karras_sigmas=False,
    use_exponential_sigmas=False,
    use_beta_sigmas=False,
    time_shift_type="exponential",
)


class FlowMatchEulerDiscreteScheduler:
    def __init__(self, **kwargs):
        unknown = set(kwargs) - set(_DEFAULTS)
        if unknown:
            raise TypeError(f"unknown config keys {sorted(unknown)}")
        self.config = FrozenConfig({**_DEFAULTS, **kwargs})
        if self.config.time_shift_type != "exponential":
            raise NotImplementedError("stub implements exponential shift only")
        if (self.config.use_karras_sigmas or self.config.use_exponential_sigmas
                or self.config.use_beta_sigmas):
            raise NotImplementedError("sigma conversions not stubbed")
        n = self.config.num_train_timesteps
        timesteps = np.linspace(1, n, n, dtype=np.float32)[::-1].copy()
        sigmas = torch.from_numpy(timesteps).to(torch.float32) / n
        if not self.config.use_dynamic_shifting:
            sigmas = self.config.shift * sigmas / (
                1 + (self.config.shift - 1) * sigmas)
        self.timesteps = sigmas * n
        self.sigmas = sigmas
        self.sigma_min = float(sigmas[-1])
        self.sigma_max = float(sigmas[0])
        self._step_index = None

    def __getattr__(self, name):
        # ConfigMixin exposes registered config values as instance attributes
        # (the reference uses bare `self.shift`)
        config = self.__dict__.get("config")
        if config is not None and name in config:
            return config[name]
        raise AttributeError(name)

    def _sigma_to_t(self, sigma):
        return sigma * self.config.num_train_timesteps

    def time_shift(self, mu, sigma, t):
        return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)

    def stretch_shift_to_terminal(self, t):
        one_minus_z = 1 - t
        scale_factor = one_minus_z[-1] / (1 - self.config.shift_terminal)
        return 1 - (one_minus_z / scale_factor)

    def set_timesteps(self, num_inference_steps=None, device=None,
                      sigmas=None, mu=None, timesteps=None):
        if self.config.use_dynamic_shifting and mu is None:
            raise ValueError("dynamic shifting requires mu")
        if sigmas is None:
            ts = np.linspace(self._sigma_to_t(self.sigma_max),
                             self._sigma_to_t(self.sigma_min),
                             num_inference_steps)
            sigmas = ts / self.config.num_train_timesteps
        else:
            sigmas = np.asarray(sigmas, dtype=np.float64)
            num_inference_steps = len(sigmas)
        if self.config.use_dynamic_shifting:
            sigmas = self.time_shift(mu, 1.0, sigmas)
        else:
            sigmas = self.config.shift * sigmas / (
                1 + (self.config.shift - 1) * sigmas)
        if self.config.shift_terminal:
            sigmas = self.stretch_shift_to_terminal(sigmas)
        sigmas = torch.from_numpy(np.asarray(sigmas)).to(torch.float32)
        ts = sigmas * self.config.num_train_timesteps
        if self.config.invert_sigmas:
            sigmas = 1.0 - sigmas
            ts = sigmas * self.config.num_train_timesteps
            sigmas = torch.cat([sigmas, torch.ones(1)])
        else:
            sigmas = torch.cat([sigmas, torch.zeros(1)])
        self.timesteps = ts
        self.sigmas = sigmas
        self._step_index = None
        self.num_inference_steps = num_inference_steps

    def _init_step_index(self, timestep):
        idx = (self.timesteps == timestep).nonzero()
        self._step_index = int(idx[0].item())

    def step(self, model_output, timestep, sample, return_dict=True):
        if self._step_index is None:
            self._init_step_index(timestep)
        sigma = self.sigmas[self._step_index]
        sigma_next = self.sigmas[self._step_index + 1]
        prev_sample = sample.to(torch.float32) + (
            sigma_next - sigma) * model_output.to(torch.float32)
        self._step_index += 1
        return (prev_sample,)
