"""Determinism: one seed for python/numpy (host) — device RNG is already
deterministic from jax.random keys (the reference needs CUBLAS workspace env
vars, reference utils/seed.py:8-14; XLA:TPU has no such nondeterminism)."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 1234) -> int:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
