"""Parity tooling: per-param diff between two param pytrees / state dicts
and LoRA weight-file comparison.

Mirrors the reference's verification utilities (reference
utils/model_compare.py:16-411, utils/lora_compare.py:10-100,
scripts/compare_lora_weights.py) — used to validate weight ports and LoRA
interop against the PyTorch stack.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import numpy as np


@dataclasses.dataclass
class ParamDiff:
    path: str
    status: str            # match | value_mismatch | shape_mismatch | only_in_a | only_in_b
    shape_a: tuple | None = None
    shape_b: tuple | None = None
    max_abs: float | None = None
    rel_err: float | None = None


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def rel_err(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(a) + np.linalg.norm(b) + 1e-12))


def compare_params(tree_a: Any, tree_b: Any, rtol: float = 1e-5) -> list[ParamDiff]:
    """Elementwise comparison of two param pytrees (or flat state dicts)."""
    fa, fb = _flatten(tree_a), _flatten(tree_b)
    diffs: list[ParamDiff] = []
    for path in sorted(set(fa) | set(fb)):
        if path not in fa:
            diffs.append(ParamDiff(path, "only_in_b", shape_b=fb[path].shape))
        elif path not in fb:
            diffs.append(ParamDiff(path, "only_in_a", shape_a=fa[path].shape))
        elif fa[path].shape != fb[path].shape:
            diffs.append(ParamDiff(path, "shape_mismatch",
                                   shape_a=fa[path].shape, shape_b=fb[path].shape))
        else:
            e = rel_err(fa[path], fb[path])
            mx = float(np.abs(fa[path].astype(np.float64)
                              - fb[path].astype(np.float64)).max()) if fa[path].size else 0.0
            status = "match" if e <= rtol else "value_mismatch"
            diffs.append(ParamDiff(path, status, fa[path].shape, fb[path].shape, mx, e))
    return diffs


def summarize(diffs: list[ParamDiff]) -> dict[str, int]:
    out: dict[str, int] = {}
    for d in diffs:
        out[d.status] = out.get(d.status, 0) + 1
    return out


def compare_lora_files(path_a: str, path_b: str, rtol: float = 1e-5) -> list[ParamDiff]:
    """Diff two LoRA safetensors files (any of diffusers/PEFT/our formats)."""
    from qflux_tpu.models.porting import load_safetensors
    from qflux_tpu.utils.lora_io import import_lora

    a = import_lora(load_safetensors(str(path_a)))
    b = import_lora(load_safetensors(str(path_b)))
    return compare_params(a, b, rtol)


def print_report(diffs: list[ParamDiff], max_rows: int = 40) -> str:
    lines = [f"{'path':60s} {'status':16s} {'rel_err':>10s}"]
    shown = 0
    for d in diffs:
        if d.status == "match":
            continue
        lines.append(f"{d.path:60s} {d.status:16s} "
                     f"{d.rel_err if d.rel_err is not None else float('nan'):>10.3e}")
        shown += 1
        if shown >= max_rows:
            lines.append(f"… ({len(diffs)} total entries)")
            break
    lines.append(f"summary: {summarize(diffs)}")
    report = "\n".join(lines)
    print(report)
    return report
