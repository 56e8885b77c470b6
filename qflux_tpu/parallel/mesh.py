"""Device-mesh construction for single-host, pod-slice, and multi-slice TPU.

This replaces the reference's launcher-driven process model (HF Accelerate over
torch.distributed/NCCL, reference trainer/base_trainer.py:767-773 and
accelerate_config.yaml): in JAX there is one program, one mesh, and sharding
annotations; XLA inserts the collectives over ICI (and DCN across slices).

Axes:
  dp     data parallel — batch is split here; gradients psum over it.
  fsdp   parameter/optimizer sharding (ZeRO-3 analogue of the reference's FSDP
         plugin, reference base_trainer.py:333-364). Batch is ALSO split over
         this axis (fsdp acts as a second data axis), while frozen base params
         are sharded over it and all-gathered layer-by-layer by XLA.
  tp     tensor parallel for the MMDiT hidden dimension (new capability; the
         reference has none — SURVEY.md §2.8).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import numpy as np
from jax.sharding import AxisType, Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh description.

    -1 for an axis size means "absorb all remaining devices" (at most one
    axis may be -1).
    """

    dp: int = 1
    fsdp: int = -1
    tp: int = 1
    # sequence parallel (ring attention over ICI) — new vs the reference,
    # SURVEY.md §2.8; ops/ring_attention.py
    sp: int = 1

    # Multi-slice: axes listed here are laid out over DCN (slower inter-slice
    # links); all others ride ICI. dp is the natural DCN axis.
    dcn_axes: tuple[str, ...] = ()

    def resolve(self, n_devices: int) -> dict[str, int]:
        sizes = {"dp": self.dp, "fsdp": self.fsdp, "tp": self.tp, "sp": self.sp}
        wild = [k for k, v in sizes.items() if v == -1]
        if len(wild) > 1:
            raise ValueError(f"at most one mesh axis may be -1, got {wild}")
        fixed = math.prod(v for v in sizes.values() if v != -1)
        if wild:
            if n_devices % fixed != 0:
                raise ValueError(f"{n_devices} devices not divisible by fixed axes {sizes}")
            sizes[wild[0]] = n_devices // fixed
        if math.prod(sizes.values()) > n_devices:
            raise ValueError(f"mesh {sizes} needs more than the {n_devices} devices available")
        # a fully-explicit mesh smaller than the device count is allowed — it
        # runs on the first prod(sizes) devices (single-chip runs on multi-chip
        # hosts, tests on the virtual mesh)
        return sizes


AXIS_ORDER = ("dp", "fsdp", "tp", "sp")

# Canonical compound axes used in PartitionSpecs: batch is sharded over both
# data-like axes; "model" dims over tp; joint sequence over sp.
BATCH_AXES = ("dp", "fsdp")

# The mesh most recently built by build_mesh — lets leaf ops (ring attention's
# shard_map) find the ambient mesh without threading it through every model
# signature. One mesh per process is the JAX norm (one program, one mesh).
_ACTIVE_MESH: list = [None]


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH[0]


def build_mesh(config: MeshConfig | None = None, devices=None) -> Mesh:
    """Build the global device mesh.

    Uses jax.make_mesh so the physical ICI topology is respected (XLA picks a
    device order where neighboring mesh coordinates are ICI neighbors).
    """
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    sizes = config.resolve(len(devices))
    shape = tuple(sizes[a] for a in AXIS_ORDER)
    n_used = math.prod(shape)
    auto = (AxisType.Auto,) * len(AXIS_ORDER)
    if config.dcn_axes:
        # multi-slice: axes in dcn_axes span slices (DCN); the rest stay
        # within a slice (ICI). Single-slice backends fall through to the
        # plain mesh (dcn sizes must then be 1).
        slice_ids = {getattr(d, "slice_index", 0) or 0 for d in devices}
        if len(slice_ids) > 1:
            from jax.experimental import mesh_utils

            ici = tuple(1 if a in config.dcn_axes else sizes[a] for a in AXIS_ORDER)
            dcn = tuple(sizes[a] if a in config.dcn_axes else 1 for a in AXIS_ORDER)
            arr = mesh_utils.create_hybrid_device_mesh(
                ici, dcn, devices=list(devices))
            mesh = Mesh(arr, AXIS_ORDER, axis_types=auto)
            _ACTIVE_MESH[0] = mesh
            return mesh
    if n_used < len(devices):
        devices = list(devices)[:n_used]
        mesh = Mesh(np.asarray(devices).reshape(shape), AXIS_ORDER, axis_types=auto)
        _ACTIVE_MESH[0] = mesh
        return mesh
    # Auto axis types: classic GSPMD propagation (jax 0.9 defaults to the new
    # Explicit sharding-in-types mode, which rejects ambiguous contractions
    # that the partitioner resolves fine on its own).
    mesh = None
    if devices is jax.devices() or list(devices) == list(jax.devices()):
        try:
            mesh = jax.make_mesh(shape, AXIS_ORDER, axis_types=auto)
        except (ValueError, RuntimeError):
            pass  # fall through to explicit construction (e.g. odd device sets)
    if mesh is None:
        mesh = Mesh(np.asarray(devices).reshape(shape), AXIS_ORDER, axis_types=auto)
    _ACTIVE_MESH[0] = mesh
    return mesh


def local_batch_size(mesh: Mesh, global_batch_size: int) -> int:
    """Per-host batch size given that batch shards over (dp, fsdp)."""
    data_ways = mesh.shape["dp"] * mesh.shape["fsdp"]
    if global_batch_size % data_ways != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by dp*fsdp={data_ways}"
        )
    n_hosts = max(1, len(mesh.devices.flatten()) // jax.local_device_count())
    return global_batch_size // n_hosts


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape["dp"] * mesh.shape["fsdp"]
