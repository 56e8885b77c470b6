"""Per-timestep loss-weight schemes.

The reference ships a bell-shaped mean-normalized weighting plus a 1000-entry
empirical table (reference scheduler/custom_flowmatch_scheduler.py:39-66 and
scheduler/default_weighting_scheme.py).  Here the bell weights are computed in
closed form, and weights are fetched by *sigma* (continuous) rather than by
searching `self.timesteps` — index math instead of the reference's
O(N) `.nonzero()` scans, and jit-friendly.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

NUM_TIMESTEPS = 1000


@functools.lru_cache(maxsize=None)
def default_weighting_table() -> np.ndarray:
    """The reference's 1000-entry empirical weighting table (computed from
    flex.1-alpha; reference scheduler/default_weighting_scheme.py:1-1005),
    stored as data. Index 0 ↔ timestep 1000 (σ=1), index 999 ↔ timestep 1."""
    import pathlib

    path = pathlib.Path(__file__).with_name("default_weighting_table.npy")
    return np.load(path).astype(np.float32)


def load_weighting_table(path: str) -> np.ndarray:
    """A user-supplied table: .npy, or .json/.txt with one float per entry."""
    if str(path).endswith(".npy"):
        return np.load(path).astype(np.float32)
    import json as _json

    return np.asarray(_json.loads(open(path).read()), dtype=np.float32)


@functools.lru_cache(maxsize=None)
def bell_weights(num_timesteps: int = NUM_TIMESTEPS) -> np.ndarray:
    """Bell-shaped mean-normalized timestep weights ("bsmntw")."""
    x = np.arange(num_timesteps, dtype=np.float32)
    y = np.exp(-2 * ((x - num_timesteps / 2) / num_timesteps) ** 2)
    y = y - y.min()
    return y * (num_timesteps / y.sum())


@functools.lru_cache(maxsize=None)
def half_bell_weights(num_timesteps: int = NUM_TIMESTEPS) -> np.ndarray:
    """Half-bell variant: second half flattened to the max."""
    w = bell_weights(num_timesteps).copy()
    w[num_timesteps // 2:] = w[num_timesteps // 2:].max()
    return w


def weights_for_sigmas(sigmas, scheme: str = "bell", table: np.ndarray | None = None):
    """Loss weight per sample given σ ∈ (0,1].  Pure; usable inside jit.

    scheme: "none" | "bell" | "half_bell" | "table" (requires `table`).
    """
    if scheme == "none":
        return jnp.ones_like(sigmas)
    if scheme == "bell":
        tab = bell_weights()
    elif scheme == "half_bell":
        tab = half_bell_weights()
    elif scheme == "table":
        if table is None:
            raise ValueError("scheme='table' requires a weight table")
        tab = np.asarray(table, dtype=np.float32)
    else:
        raise ValueError(f"unknown weighting scheme {scheme!r}")
    n = len(tab)
    # timestep t = σ·1000, laid out as linspace(1000, 1) → index = n - round(σ·n)
    idx = jnp.clip(n - jnp.round(sigmas * n).astype(jnp.int32), 0, n - 1)
    return jnp.asarray(tab)[idx]
