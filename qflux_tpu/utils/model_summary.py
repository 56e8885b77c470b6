"""Parameter/dtype/memory/LoRA statistics tables (reference
utils/model_summary.py:328-512, logged at fit start via
base_trainer.py:634-640).

The reference walks nn.Module objects; here the model is a param pytree, so
stats aggregate over tree paths: per-top-level-module rows (the reference's
per-module table), dtype/byte histograms including quantized {kernel_q,
kernel_q4} forms, attention-projection counts, and LoRA rank/coverage."""

from __future__ import annotations

from collections import defaultdict

import jax
import numpy as np

_BYTES = {"float32": 4, "bfloat16": 2, "float16": 2, "int8": 1, "int32": 4,
          "float8_e4m3fn": 1, "float8_e5m2": 1, "int4_packed": 0.5}


def _leaf_stats(tree):
    """(n_params, n_bytes, dtype_counter) over a pytree; packed int4 kernels
    count their LOGICAL param count (2 per byte)."""
    n = b = 0
    dtypes: dict[str, int] = defaultdict(int)

    def rec(node, under_q4=False):
        nonlocal n, b
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, under_q4=(k in ("kernel_q4", "kernel_q4_dyn",
                                       "kernel_q4_rq")))
            return
        if not hasattr(node, "shape"):
            return
        size = int(np.prod(node.shape)) if node.shape else 1
        dt = str(node.dtype)
        if under_q4:
            n += 2 * size
            b += size
            dtypes["int4_packed"] += 2 * size
        else:
            n += size
            b += size * _BYTES.get(dt, 4)
            dtypes[dt] += size

    rec(tree)
    return n, int(b), dict(dtypes)


def _fmt_bytes(b: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if b < 1024:
            return f"{b:.1f} {unit}"
        b /= 1024
    return f"{b:.2f} TB"


def _attention_stats(tree) -> dict:
    """Count attention projection nodes (reference _collect_transformer_stats,
    model_summary.py:291-326) — scan-stacked blocks count once per layer."""
    n_proj = 0

    def rec(node, path):
        nonlocal n_proj
        if isinstance(node, dict):
            if path and path[-1] == "attn":
                layers = 1
                kkeys = ("kernel", "kernel_q", "kernel_q4",
                         "kernel_q_dyn", "kernel_q4_dyn", "kernel_q4_rq")
                for v in node.values():
                    k = next((v[kk] for kk in kkeys if isinstance(v, dict)
                              and kk in v), None)
                    if k is not None and k.ndim == 3:
                        layers = max(layers, int(k.shape[0]))
                n_proj += layers * sum(
                    1 for kk, v in node.items()
                    if isinstance(v, dict) and any(key in v for key in kkeys))
                return
            for k, v in node.items():
                rec(v, path + (k,))

    rec(tree, ())
    return {"attention_projections": n_proj}


def model_summary_rows(base_params, lora_params=None) -> list[dict]:
    rows = []
    total_n = total_b = 0
    for name in sorted(base_params) if isinstance(base_params, dict) else []:
        n, b, dtypes = _leaf_stats(base_params[name])
        total_n += n
        total_b += b
        rows.append({"component": f"base/{name}", "params": f"{n:,}",
                     "memory": _fmt_bytes(b),
                     "dtypes": ", ".join(f"{k}:{v:,}" for k, v in sorted(dtypes.items())),
                     "trainable": "no"})
    if not rows:  # non-dict tree
        total_n, total_b, dtypes = _leaf_stats(base_params)
        rows.append({"component": "base", "params": f"{total_n:,}",
                     "memory": _fmt_bytes(total_b),
                     "dtypes": ", ".join(f"{k}:{v:,}" for k, v in sorted(dtypes.items())),
                     "trainable": "no"})
    attn = _attention_stats(base_params)
    rows.append({"component": "base TOTAL", "params": f"{total_n:,}",
                 "memory": _fmt_bytes(total_b),
                 "dtypes": f"attention projections: {attn['attention_projections']}",
                 "trainable": "no"})
    if lora_params is not None:
        ln, lb, ldt = _leaf_stats(lora_params)
        ranks = sorted({int(leaf.shape[-1])
                        for path, leaf in jax.tree_util.tree_flatten_with_path(lora_params)[0]
                        if getattr(path[-1], "key", None) == "a" and hasattr(leaf, "shape")})
        rows.append({"component": "lora", "params": f"{ln:,}",
                     "memory": _fmt_bytes(lb),
                     "dtypes": ", ".join(f"{k}:{v:,}" for k, v in sorted(ldt.items()))
                     + (f" | ranks: {ranks}" if ranks else ""),
                     "trainable": "yes"})
        rows.append({"component": "trainable %",
                     "params": f"{100 * ln / max(total_n, 1):.4f}%",
                     "memory": "", "dtypes": "", "trainable": ""})
    return rows


def print_model_summary(base_params, lora_params=None):
    rows = model_summary_rows(base_params, lora_params)
    keys = list(rows[0])
    widths = {k: max(len(str(r.get(k, ""))) for r in rows + [{k: k} for k in keys])
              for k in keys}
    header = " | ".join(k.ljust(widths[k]) for k in keys)
    print(header)
    print("-" * len(header))
    for r in rows:
        print(" | ".join(str(r.get(k, "")).ljust(widths[k]) for k in keys))
