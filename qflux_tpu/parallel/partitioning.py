"""Regex-rule-based parameter partitioning (GSPMD).

The reference shards parameters with torch FSDP's size-based auto-wrap policy
(reference trainer/base_trainer.py:333-364).  The TPU-native equivalent is a
declarative map from parameter-tree paths to PartitionSpecs; XLA's GSPMD
partitioner then inserts all-gathers/reduce-scatters over the mesh.

Rules are (regex, PartitionSpec) pairs matched against '/'-joined pytree paths
(first match wins), e.g.:

    rules = PartitionRules([
        (r".*attn/(q|k|v)/kernel", P("fsdp", "tp")),
        (r".*attn/o/kernel",       P("tp", "fsdp")),
        (r".*mlp/in/kernel",       P("fsdp", "tp")),
        (r".*bias",                P()),
        (r".*",                    P("fsdp")),       # default: shard dim 0
    ])

A spec is clipped per-leaf: axes that don't divide the corresponding dim are
dropped (replicated on that dim) so one rule set serves every model size.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _axis_size(mesh: Mesh, axis) -> int:
    if axis is None:
        return 1
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis]


def clip_spec_to_shape(spec: P, shape: Sequence[int], mesh: Mesh) -> P:
    """Drop sharded axes that don't evenly divide the array dims.

    Keeps a single rule set valid across head counts / hidden sizes; an axis
    that can't divide a dim degrades to replication on that dim (what torch
    FSDP's min-param-size wrap policy achieves by not wrapping small modules).
    """
    if spec is None:
        return P()
    # right-align: rules are written against the logical [in, out] dims; any
    # extra leading dims (the stacked-layer axis under lax.scan) stay
    # replicated — scan requires xs dim 0 unsharded.
    axes = list(spec)
    if len(axes) < len(shape):
        axes = [None] * (len(shape) - len(axes)) + axes
    else:
        axes = axes[len(axes) - len(shape):]
    out = []
    for dim, axis in zip(shape, axes):
        size = _axis_size(mesh, axis)
        out.append(axis if (size > 1 and dim % size == 0) or size == 1 else None)
    while out and out[-1] is None:
        out.pop()
    return P(*out)


class PartitionRules:
    def __init__(self, rules: Sequence[tuple[str, P]]):
        self._rules = [(re.compile(pat), spec) for pat, spec in rules]

    def spec_for(self, path_str: str, shape: Sequence[int] | None = None,
                 mesh: Mesh | None = None) -> P:
        for pat, spec in self._rules:
            if pat.fullmatch(path_str):
                if shape is not None and mesh is not None:
                    return clip_spec_to_shape(spec, shape, mesh)
                return spec
        return P()

    def __add__(self, other: "PartitionRules") -> "PartitionRules":
        new = PartitionRules([])
        new._rules = self._rules + other._rules
        return new


def spec_tree_from_rules(params: Any, rules: PartitionRules, mesh: Mesh) -> Any:
    """PartitionSpec pytree matching `params` (leaves may be arrays or
    ShapeDtypeStructs)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: rules.spec_for(_path_str(path), leaf.shape, mesh), params
    )


def named_sharding_tree(params: Any, rules: PartitionRules, mesh: Mesh) -> Any:
    specs = spec_tree_from_rules(params, rules, mesh)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_pytree(params: Any, rules: PartitionRules, mesh: Mesh) -> Any:
    """Place a host pytree onto the mesh with the rule-derived shardings."""
    shardings = named_sharding_tree(params, rules, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


# ---------------------------------------------------------------------------
# Canonical rule sets

def mmdit_rules() -> PartitionRules:
    """Sharding for MMDiT-family transformers (FLUX / Qwen-Image / Klein).

    Frozen base params shard over fsdp (+ tp on the hidden dims); LoRA params
    are handled separately (replicated) by lora_rules() — mirroring the
    reference's "LoRA in ignored_modules, kept replicated" FSDP design
    (reference base_trainer.py:343-348).
    """
    return PartitionRules([
        # attention projections: [in, out] kernels
        (r".*(attn|attention).*/(to_q|to_k|to_v|add_q|add_k|add_v|qkv)/kernel", P("fsdp", "tp")),
        (r".*(attn|attention).*/(to_out|add_out|proj)/kernel", P("tp", "fsdp")),
        # MLPs: expand then contract
        (r".*(mlp|ff|ffn)[^/]*/(in|up|gate|fc1|proj_mlp)/kernel", P("fsdp", "tp")),
        (r".*(mlp|ff|ffn)[^/]*/(out|down|fc2|proj_out)/kernel", P("tp", "fsdp")),
        # AdaLN modulation: large [dim, 6*dim] projections
        (r".*mod[^/]*/kernel", P("fsdp", "tp")),
        # embedders / output heads
        (r".*(img_in|txt_in|x_embedder|context_embedder|proj_out(_mlp)?|final_proj)/kernel", P("fsdp")),
        (r".*(time|guidance|text)_embed.*/kernel", P("fsdp")),
        # norms scales / biases: replicate
        (r".*(norm|scale|shift).*", P()),
        (r".*bias", P()),
        (r".*", P("fsdp")),
    ])


def lora_rules() -> PartitionRules:
    """LoRA adapters are tiny — replicate everywhere (reference keeps them
    un-sharded on every rank, base_trainer.py:343-348)."""
    return PartitionRules([(r".*", P())])


def batch_rules() -> PartitionRules:
    """Batch-dim-leading arrays (latents, embeddings) shard over (dp, fsdp)."""
    return PartitionRules([(r".*", P(("dp", "fsdp")))])
