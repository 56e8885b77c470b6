import json

import numpy as np
import pytest

from qflux_tpu.data.cache import EmbeddingCacheManager
from qflux_tpu.data.loader import DataLoader
from qflux_tpu.data.dataset import ImageDataset
from qflux_tpu.data.preprocess import ImageProcessor
from qflux_tpu.config import ProcessorSection


def test_cache_invalidation_on_missing_file(tmp_path):
    cm = EmbeddingCacheManager(tmp_path)
    cm.save("M", {"x": np.ones((2, 2), np.float32)}, {"x": "h1"})
    assert cm.load("M") is not None
    # delete the payload but keep metadata → load returns None (invalidated)
    next((tmp_path / "x").glob("*.npz")).unlink()
    assert cm.load("M") is None


def test_cache_int_arrays_preserved(tmp_path):
    cm = EmbeddingCacheManager(tmp_path)
    ids = np.arange(10, dtype=np.int32)
    cm.save("M", {"ids": ids}, {"ids": "h"})
    out = cm.load("M")
    assert out["ids"].dtype == np.int32
    np.testing.assert_array_equal(out["ids"], ids)


def test_cache_fp16_storage(tmp_path):
    cm = EmbeddingCacheManager(tmp_path)
    x = np.random.default_rng(0).normal(size=(4, 4)).astype(np.float32)
    cm.save("M", {"x": x}, {"x": "h"})
    raw = np.load(next((tmp_path / "x").glob("*.npz")))["data"]
    assert raw.dtype == np.float16  # disk format
    assert cm.load("M")["x"].dtype == np.float32  # rehydrated


def test_hash_combines_files_and_strings(tmp_path):
    f = tmp_path / "a.bin"
    f.write_bytes(b"abc")
    h1 = EmbeddingCacheManager.get_hash(f, "prompt")
    h2 = EmbeddingCacheManager.get_hash(f, "other prompt")
    assert h1 != h2
    f.write_bytes(b"abcd")
    assert EmbeddingCacheManager.get_hash(f, "prompt") != h1


def test_loader_reshuffles_per_epoch(tmp_image_dir):
    proc = ImageProcessor(ProcessorSection(process_type="resize", target_size=[64, 96]))
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=proc)
    dl = DataLoader(ds, batch_size=1, shuffle=True, drop_last=False, seed=3)
    order1 = [b["prompt"][0] for b in dl]
    order2 = [b["prompt"][0] for b in dl]
    assert sorted(order1) == sorted(order2)
    # different epochs shuffle differently (3 samples → 6 permutations; with
    # the seeded epoch-folded rng these two differ for seed 3)
    dl2 = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    fixed = [b["prompt"][0] for b in dl2]
    assert fixed == sorted(fixed)  # deterministic order without shuffle
