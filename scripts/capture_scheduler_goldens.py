"""Capture scheduler/sampler goldens from the reference's torch scheduler.

Runs the reference's CustomFlowMatchEulerDiscreteScheduler
(reference src/qflux/scheduler/custom_flowmatch_scheduler.py:33-209) and its
base-trainer sampling-plan recipe (reference trainer/base_trainer.py:1015-1043
+ utils/sampling.py:21-77) with diffusers stubbed
(tests/oracles/flowmatch_stub.py), and saves:

  * linear train timesteps + bell / half-bell weights (get_weights_for_timesteps)
  * the 1000-entry default_weighing_scheme table
  * dynamic-shift inference sigma schedules at several (num_steps, seq_len)
  * static-shift schedules (use_dynamic_shifting=False)
  * shift_terminal-stretched schedule
  * add_noise outputs on fixed tensors
  * a 4-step Euler trajectory with a deterministic fake velocity model
  * sigmoid / lognorm_blend train-timestep draws (torch seeded — asserted
    distributionally on the JAX side)

as tests/fixtures/scheduler_goldens.npz, making
tests/scheduler/test_sampler_goldens.py a NEVER-skipped parity tier
(VERDICT r4 #7).  Re-run only when the capture set changes:

    QFLUX_REFERENCE_ROOT=/root/reference python scripts/capture_scheduler_goldens.py
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tests.oracles import flowmatch_stub  # noqa: E402

OUT = REPO / "tests" / "fixtures" / "scheduler_goldens.npz"


def _load_reference_module(rel_path: str, name: str, extra_modules=()):
    root = Path(os.environ.get("QFLUX_REFERENCE_ROOT", "/root/reference"))
    path = root / rel_path
    # satisfy the module's imports without diffusers / qflux installed
    fake_diffusers = types.ModuleType("diffusers")
    fake_diffusers.FlowMatchEulerDiscreteScheduler = (
        flowmatch_stub.FlowMatchEulerDiscreteScheduler)
    sys.modules.setdefault("diffusers", fake_diffusers)
    for mod_name, mod in extra_modules:
        sys.modules[mod_name] = mod
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    # the weighting table module is self-contained — load it first so the
    # scheduler module's `from qflux.scheduler.default_weighting_scheme
    # import default_weighing_scheme` resolves
    table_mod = _load_reference_module(
        "src/qflux/scheduler/default_weighting_scheme.py",
        "qflux.scheduler.default_weighting_scheme")
    pkg_q = types.ModuleType("qflux")
    pkg_s = types.ModuleType("qflux.scheduler")
    pkg_s.default_weighting_scheme = table_mod
    sched_mod = _load_reference_module(
        "src/qflux/scheduler/custom_flowmatch_scheduler.py",
        "qflux.scheduler.custom_flowmatch_scheduler",
        extra_modules=[("qflux", pkg_q), ("qflux.scheduler", pkg_s),
                       ("qflux.scheduler.default_weighting_scheme", table_mod)])

    g: dict[str, np.ndarray] = {}
    cfg = sched_mod.scheduler_config
    g["config.shift"] = np.float64(cfg["shift"])

    sched = sched_mod.CustomFlowMatchEulerDiscreteScheduler(**cfg)

    # -- linear train grid + weights (custom_flowmatch_scheduler.py:39-82)
    ts = sched.set_train_timesteps(1000, "cpu", "linear")
    g["linear.timesteps"] = ts.numpy()
    probe = ts[::97]  # 11 probe timesteps across the grid
    g["weights.probe_timesteps"] = probe.numpy()
    g["weights.bell"] = sched.get_weights_for_timesteps(probe).numpy()
    g["weights.half_bell"] = sched.get_weights_for_timesteps(
        probe, v2=True).numpy()
    g["weights.table"] = np.asarray(table_mod.default_weighing_scheme,
                                    dtype=np.float64)

    # -- get_sigmas on the linear grid (qwen trainer's _get_sigmas path)
    g["linear.sigmas_probe"] = sched.get_sigmas(probe, n_dim=1,
                                                dtype=torch.float64,
                                                device="cpu").numpy()

    # -- add_noise (forward ODE, :96-107)
    rng = np.random.default_rng(11)
    x0 = rng.standard_normal((2, 3, 4)).astype(np.float32)
    noise = rng.standard_normal((2, 3, 4)).astype(np.float32)
    # the reference's add_noise broadcasts t_01 directly against the samples,
    # so callers must pass timesteps pre-broadcast to [B, 1, 1]
    t = torch.tensor([250.0, 875.0]).reshape(2, 1, 1)
    g["noise.x0"], g["noise.eps"] = x0, noise
    g["noise.t"] = t.reshape(-1).numpy()
    g["noise.xt"] = sched.add_noise(torch.from_numpy(x0),
                                    torch.from_numpy(noise), t).numpy()

    # -- dynamic-shift inference plans (base_trainer.py:1015-1043): fresh
    # scheduler per plan, sigmas=linspace(1, 1/n, n), mu from seq len
    for steps, seq in [(4, 1024), (20, 4096), (28, 1872), (50, 256)]:
        s = sched_mod.CustomFlowMatchEulerDiscreteScheduler(**cfg)
        sig = np.linspace(1.0, 1 / steps, steps)
        mu = sched_mod.calculate_shift(
            seq, cfg["base_image_seq_len"], cfg["max_image_seq_len"],
            cfg["base_shift"], cfg["max_shift"])
        s.set_timesteps(steps, "cpu", sigmas=sig, mu=mu)
        g[f"plan.{steps}.{seq}.mu"] = np.float64(mu)
        g[f"plan.{steps}.{seq}.sigmas"] = s.sigmas.numpy()
        g[f"plan.{steps}.{seq}.timesteps"] = s.timesteps.numpy()

    # -- static-shift plan (use_dynamic_shifting=False, shift=3.0)
    s = sched_mod.CustomFlowMatchEulerDiscreteScheduler(
        **{**cfg, "use_dynamic_shifting": False})
    s.set_timesteps(8, "cpu", sigmas=np.linspace(1.0, 1 / 8, 8))
    g["plan_static.sigmas"] = s.sigmas.numpy()
    g["plan_static.timesteps"] = s.timesteps.numpy()

    # -- shift_terminal stretch (diffusers semantics the Klein family uses)
    s = sched_mod.CustomFlowMatchEulerDiscreteScheduler(
        **{**cfg, "use_dynamic_shifting": False, "shift_terminal": 0.1})
    s.set_timesteps(8, "cpu", sigmas=np.linspace(1.0, 1 / 8, 8))
    g["plan_terminal.sigmas"] = s.sigmas.numpy()

    # -- 4-step Euler trajectory with a deterministic fake model
    s = sched_mod.CustomFlowMatchEulerDiscreteScheduler(**cfg)
    sig = np.linspace(1.0, 1 / 4, 4)
    mu = sched_mod.calculate_shift(1024, cfg["base_image_seq_len"],
                                   cfg["max_image_seq_len"],
                                   cfg["base_shift"], cfg["max_shift"])
    s.set_timesteps(4, "cpu", sigmas=sig, mu=mu)
    x = torch.from_numpy(rng.standard_normal((1, 8)).astype(np.float32))
    g["traj.x_init"] = x.numpy().copy()
    states = []
    for t_i in s.timesteps:
        v = 0.25 * x + float(t_i) / 1000.0  # deterministic "velocity"
        (x,) = s.step(v, t_i, x)
        states.append(x.numpy().copy())
    g["traj.states"] = np.stack(states)

    # -- stochastic train grids (torch-seeded; distributional parity checks)
    torch.manual_seed(123)
    g["sigmoid.timesteps"] = sched.set_train_timesteps(
        1000, "cpu", "sigmoid").numpy()
    torch.manual_seed(321)
    g["lognorm_blend.timesteps"] = sched.set_train_timesteps(
        1000, "cpu", "lognorm_blend").numpy().astype(np.float64)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **g)
    print(f"wrote {OUT} ({OUT.stat().st_size/1e3:.1f} kB, {len(g)} arrays)")


if __name__ == "__main__":
    main()
