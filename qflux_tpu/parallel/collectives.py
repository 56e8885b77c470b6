"""Multi-host collective helpers.

The reference's distributed choreography (reference trainer/validation.py:
332-478 — per-rank sampling shards, `accelerator.gather` of latents to rank 0;
base_trainer.py:538-540 loss gather; `wait_for_everyone` barriers) maps to a
much smaller surface on TPU: inside jit, GSPMD inserts every collective; the
only HOST-level operations a multi-host pod needs are the ones here.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def barrier(name: str = "qflux_barrier") -> None:
    """Cross-host sync (reference wait_for_everyone)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def all_gather_host(tree: Any) -> Any:
    """Gather host-local arrays from every process to all processes
    (the validation-latents gather, reference validation.py:359-360)."""
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: np.asarray(x)[None], tree)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def broadcast_from_main(tree: Any) -> Any:
    """Replicate process-0 host data everywhere (FSDP sync_module_states
    analogue, reference base_trainer.py:349)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def shard_validation_samples(n_samples: int) -> list[int]:
    """Round-robin validation-sample shard for this process (reference
    validation.py:281-294: idx = (i*world + rank) % N)."""
    rank, world = jax.process_index(), jax.process_count()
    return [i for i in range(n_samples) if i % world == rank]


def mean_across_hosts(value: float) -> float:
    """Scalar mean over processes (loss logging, reference base_trainer.py:538)."""
    if jax.process_count() == 1:
        return float(value)
    gathered = all_gather_host(np.asarray([value], np.float64))
    return float(np.mean(gathered))
