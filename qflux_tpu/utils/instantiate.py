"""class_path/init_args dynamic instantiation — the framework's plugin
mechanism (reference utils/tools.py:134-142, used for datasets, losses,
optimizers, processors)."""

from __future__ import annotations

import importlib
from typing import Any


def resolve_symbol(class_path: str) -> Any:
    module_name, _, attr = class_path.rpartition(".")
    if not module_name:
        raise ValueError(f"class_path must be dotted: {class_path!r}")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def instantiate_class(class_path: str, *args, **kwargs) -> Any:
    return resolve_symbol(class_path)(*args, **kwargs)
