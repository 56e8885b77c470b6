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


def gather_validation_images(indices: list[int], images: list[np.ndarray],
                             n_total: int) -> tuple[list[int], list[np.ndarray]]:
    """Collect per-process validation results onto every process (the
    reference gathers sampled latents + indices to rank 0 with NCCL,
    validation.py:359-360; here decoded images ride process_allgather).

    All images must share one shape (the reference enforces the same,
    validation.py:154-204). Each process pads its shard to ceil(n/world)
    entries (index -1 = padding) so the allgather is shape-uniform.
    Single-process: identity. Every process must call this (collective).
    """
    world = process_count()
    if world == 1:
        return list(indices), list(images)
    from jax.experimental import multihost_utils

    pad_to = -(-max(n_total, 1) // world)
    shapes = {tuple(np.shape(im)) for im in images}
    if len(shapes) > 1:
        raise ValueError(f"validation images must share one shape, got {shapes}")
    # a process may own zero samples when n_total < world; learn the shape
    # (and dtype) from whoever has one
    meta = (np.asarray(list(shapes)[0], np.int64) if images
            else np.zeros((0,), np.int64))
    metas = multihost_utils.process_allgather(
        np.concatenate([[len(meta)], meta, np.zeros(8 - len(meta), np.int64)]))
    have = [m for m in np.asarray(metas) if m[0] > 0]
    if not have:
        return [], []
    n_dims = int(have[0][0])
    shape = tuple(int(x) for x in have[0][1:1 + n_dims])

    # uint8 throughout (decoded images) so empty-shard processes agree on dtype
    arr = np.zeros((pad_to,) + shape, np.uint8)
    idx = np.full((pad_to,), -1, np.int32)
    for j, (i, im) in enumerate(zip(indices, images)):
        arr[j], idx[j] = np.asarray(im).astype(np.uint8), i
    g_idx = np.asarray(multihost_utils.process_allgather(idx))  # [world, pad_to]
    g_arr = np.asarray(multihost_utils.process_allgather(arr))
    out_i, out_im = [], []
    for w in range(g_idx.shape[0]):
        for j in range(g_idx.shape[1]):
            if g_idx[w, j] >= 0:
                out_i.append(int(g_idx[w, j]))
                out_im.append(g_arr[w, j])
    order = np.argsort(out_i, kind="stable")
    return [out_i[o] for o in order], [out_im[o] for o in order]


def mean_across_hosts(value: float) -> float:
    """Scalar mean over processes (loss logging, reference base_trainer.py:538)."""
    if jax.process_count() == 1:
        return float(value)
    gathered = all_gather_host(np.asarray([value], np.float64))
    return float(np.mean(gathered))
