"""Parameter/dtype/LoRA statistics table (reference utils/model_summary.py:
328-512, logged at fit start via base_trainer.py:634-640)."""

from __future__ import annotations

from collections import defaultdict

import jax
import numpy as np


def _count(tree) -> dict[str, int]:
    by_dtype: dict[str, int] = defaultdict(int)
    for leaf in jax.tree.leaves(tree):
        by_dtype[str(np.asarray(leaf).dtype if not hasattr(leaf, "dtype") else leaf.dtype)] += int(
            np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
    return dict(by_dtype)


def model_summary_rows(base_params, lora_params=None) -> list[dict]:
    rows = []
    base_counts = _count(base_params)
    total = sum(base_counts.values())
    rows.append({"component": "base", "params": f"{total:,}",
                 "dtypes": ", ".join(f"{k}:{v:,}" for k, v in sorted(base_counts.items())),
                 "trainable": "no"})
    if lora_params is not None:
        lc = _count(lora_params)
        lt = sum(lc.values())
        rows.append({"component": "lora", "params": f"{lt:,}",
                     "dtypes": ", ".join(f"{k}:{v:,}" for k, v in sorted(lc.items())),
                     "trainable": "yes"})
        rows.append({"component": "trainable %", "params": f"{100 * lt / max(total, 1):.4f}%",
                     "dtypes": "", "trainable": ""})
    return rows


def print_model_summary(base_params, lora_params=None):
    rows = model_summary_rows(base_params, lora_params)
    widths = {k: max(len(str(r.get(k, ""))) for r in rows + [{k: k} for k in rows[0]])
              for k in rows[0]}
    header = " | ".join(k.ljust(widths[k]) for k in rows[0])
    print(header)
    print("-" * len(header))
    for r in rows:
        print(" | ".join(str(r.get(k, "")).ljust(widths[k]) for k in rows[0]))
