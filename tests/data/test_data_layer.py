import json

import numpy as np
import pytest

from qflux_tpu.config import ProcessorSection
from qflux_tpu.data.cache import EmbeddingCacheManager
from qflux_tpu.data.collate import collate, pad_to_max_shape
from qflux_tpu.data.dataset import ImageDataset
from qflux_tpu.data.loader import DataLoader
from qflux_tpu.data.preprocess import (
    ImageProcessor,
    best_area_near,
    best_hw_given_area,
    calculate_best_resolution,
)


# -- preprocess geometry ----------------------------------------------------

def test_best_hw_given_area_exact_and_ratio():
    hw = best_hw_given_area(512 * 512, 1000, 500)
    assert hw is not None
    nw, nh = hw
    assert nw * nh == 512 * 512
    assert nw % 16 == 0 and nh % 16 == 0
    assert nw > nh  # preserves landscape orientation


def test_best_area_near_properties():
    r = best_area_near(512 * 512)
    assert r is not None
    assert abs(r["best_area"] - 512 * 512) / (512 * 512) <= 0.2
    assert r["count"] >= 1
    for h, w in r["examples"]:
        assert h * w == r["best_area"]
        assert h % 16 == 0 and w % 16 == 0


def test_calculate_best_resolution_divisibility():
    w, h = calculate_best_resolution(831, 575, 1024 * 1024)
    assert w % 32 == 0 and h % 32 == 0


def test_processor_modes(rng):
    img = rng.integers(0, 255, (100, 230, 3), dtype=np.uint8)
    for mode, expect in [
        ("resize", (64, 96)),
        ("center_crop", (64, 96)),
        ("center_padding", (64, 96)),
        ("right_padding", (64, 96)),
    ]:
        proc = ImageProcessor(ProcessorSection(process_type=mode, target_size=[64, 96]))
        out = proc.process_image(img, "target")
        assert out.shape[:2] == expect, mode

    proc = ImageProcessor(ProcessorSection(process_type="fixed_pixels",
                                           target_pixels=256 * 256))
    out = proc.process_image(img, "target")
    h, w = out.shape[:2]
    assert h * w == 256 * 256 // 1024 * 1024
    assert h % 16 == 0 and w % 16 == 0


def test_multi_res_candidate_selection(rng):
    proc = ImageProcessor(ProcessorSection(
        multi_resolutions=[[512, 512], [256, 256]], process_type="resize"))
    small = rng.integers(0, 255, (240, 260, 3), dtype=np.uint8)
    out = proc.process_image(small, "target")
    assert abs(out.shape[0] * out.shape[1] - 256 * 256) / (256 * 256) < 0.3
    # aspect ratio guard
    wide = rng.integers(0, 255, (50, 500, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        proc.process_image(wide, "target")


def test_multi_res_advanced_per_type():
    proc = ImageProcessor(ProcessorSection(multi_resolutions={
        "target": [[512, 512]], "controls": [[[256, 256]], [[128, 128]]]}))
    assert proc.candidates_for("target") == [512 * 512]
    assert proc.candidates_for("control_0") == [256 * 256]
    assert proc.candidates_for("control_1") == [128 * 128]
    assert proc.candidates_for("control_2") == [256 * 256]  # wraps


# -- cache ------------------------------------------------------------------

def test_cache_roundtrip(tmp_path):
    cm = EmbeddingCacheManager(tmp_path / "cache")
    emb = {
        "prompt_embeds": np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32),
        "empty_prompt_embeds": np.zeros((8, 16), np.float32),
        "image_latents": np.ones((4, 4), np.float32),
    }
    hashes = {"prompt_embeds": "ph", "empty_prompt_embeds": "eph", "image_latents": "ih"}
    cm.save("MAIN", emb, hashes)
    assert cm.exists("MAIN")
    assert not cm.exists("OTHER")

    out = cm.load("MAIN")
    assert set(out) == {"prompt_embeds", "image_latents"}
    np.testing.assert_allclose(out["prompt_embeds"], emb["prompt_embeds"], atol=1e-3)

    # caption dropout substitutes the empty version
    out2 = cm.load("MAIN", use_empty_prompt=True)
    np.testing.assert_array_equal(out2["prompt_embeds"], 0.0)
    # dedup: same hash written once
    files = list((tmp_path / "cache" / "prompt_embeds").glob("*.npz"))
    assert len(files) == 1


# -- dataset ----------------------------------------------------------------

def test_dataset_scan_and_item(tmp_image_dir):
    proc = ImageProcessor(ProcessorSection(process_type="resize", target_size=[64, 96]))
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=proc, use_edit_mask=True)
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (64, 96, 3)
    assert item["control"].shape == (64, 96, 3)
    assert item["control_1"].shape == (64, 96, 3)  # extra control on sample 0
    assert "mask" in item
    assert item["prompt"].startswith("test prompt")
    assert not item["cached"]
    h = item["file_hashes"]
    assert {"image_hash", "prompt_hash", "control_hash", "controls_sum_hash",
            "main_hash"} <= set(h)


def test_dataset_cached_path(tmp_image_dir, tmp_path):
    proc = ImageProcessor(ProcessorSection(process_type="resize", target_size=[64, 96]))
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=proc,
                      cache_dir=str(tmp_path / "c"), use_cache=True,
                      caption_dropout_rate=0.0)
    item = ds[1]
    assert not item["cached"]
    # simulate a cache pass
    cm = ds.cache_manager
    h = item["file_hashes"]
    cm.save(h["main_hash"], {
        "prompt_embeds": np.ones((4, 8), np.float32),
        "empty_prompt_embeds": np.zeros((4, 8), np.float32),
        "image_latents": np.ones((6, 4), np.float32),
    }, {"prompt_embeds": h["prompt_hash"], "empty_prompt_embeds": h["empty_prompt_hash"],
        "image_latents": h["image_hash"]})
    item2 = ds[1]
    assert item2["cached"]
    assert item2["prompt_embeds"].shape == (4, 8)


def test_csv_dataset(tmp_image_dir, tmp_path):
    import pandas as pd

    rows = [{"path_target": str(tmp_image_dir / "training_images" / f"img_{i:03d}.png"),
             "path_control_0": str(tmp_image_dir / "control_images" / f"img_{i:03d}.png"),
             "prompt": f"csv prompt {i}"} for i in range(3)]
    csv = tmp_path / "d.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    proc = ImageProcessor(ProcessorSection(process_type="resize", target_size=[32, 32]))
    ds = ImageDataset(csv_path=str(csv), processor=proc)
    assert len(ds) == 3
    assert ds[2]["prompt"] == "csv prompt 2"


# -- collate + loader -------------------------------------------------------

def test_collate_pads_and_converts_mask(rng):
    s1 = {"image": rng.normal(size=(16, 16, 3)).astype(np.float32),
          "mask": (rng.random((32, 32)) > 0.5).astype(np.float32),
          "prompt": "a", "cached": False}
    s2 = {"image": rng.normal(size=(16, 24, 3)).astype(np.float32),
          "mask": (rng.random((32, 48)) > 0.5).astype(np.float32),
          "prompt": "b", "cached": False}
    batch = collate([s1, s2])
    assert batch["image"].shape == (2, 16, 24, 3)
    # latent edit mask: 32x32 → 2x2=4 tokens; 32x48 → 2x3=6 → padded to 6
    assert batch["edit_mask"].shape == (2, 6)
    assert batch["prompt"] == ["a", "b"]


def test_loader_bucketing(tmp_image_dir):
    proc = ImageProcessor(ProcessorSection(process_type="resize", target_size=[64, 96]))
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=proc)
    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=False, seed=1)
    batches = list(dl)
    total = sum(b["image"].shape[0] for b in batches)
    assert total == 3
    for b in batches:
        assert b["image"].ndim == 4


def test_loader_multiworker_matches_single(tmp_image_dir):
    """num_workers>1 must yield the same batches in the same order."""
    from qflux_tpu.config import ProcessorSection
    from qflux_tpu.data.dataset import ImageDataset
    from qflux_tpu.data.loader import DataLoader
    from qflux_tpu.data.preprocess import ImageProcessor

    proc = ImageProcessor(ProcessorSection(process_type="resize",
                                           target_size=[32, 48]))
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=proc)
    b1 = list(DataLoader(ds, batch_size=2, shuffle=True, drop_last=False,
                         seed=7, num_workers=1))
    ds2 = ImageDataset(dataset_path=str(tmp_image_dir), processor=proc)
    b4 = list(DataLoader(ds2, batch_size=2, shuffle=True, drop_last=False,
                         seed=7, num_workers=4))
    assert len(b1) == len(b4)
    for x, y in zip(b1, b4):
        assert x["prompt"] == y["prompt"]
        np.testing.assert_array_equal(np.asarray(x["image"]), np.asarray(y["image"]))


def test_bucket_keys_need_no_decode(tmp_image_dir, monkeypatch):
    """Round 3 (VERDICT #10): bucketing derives keys from image file headers,
    so emitting the FIRST batch decodes only that batch's samples — not the
    whole dataset."""
    proc = ImageProcessor(ProcessorSection(process_type="resize", target_size=[64, 96]))
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=proc)
    import threading

    calls = []
    gate = threading.Event()  # holds decodes of samples >= 1
    orig = ImageDataset.__getitem__

    def patched(self, i):
        # instance-scoped: a straggler worker thread from a previous test's
        # loader must not pollute `calls`
        if self is not ds:
            return orig(self, i)
        if i >= 1:
            assert gate.wait(timeout=30), "producer deadlocked behind the gate"
        calls.append(i)
        return orig(self, i)

    monkeypatch.setattr(ImageDataset, "__getitem__", patched)
    dl = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False,
                    seed=0, prefetch=0)
    it = iter(dl)
    # every decode but sample 0's is gated: the first batch arriving at all
    # proves it needed only its own sample, deterministically
    first = next(it)
    assert first["image"].shape[1:] == (64, 96, 3)
    assert set(calls) == {0}, calls
    gate.set()
    rest = list(it)
    assert len(rest) == len(ds) - 1
    # keys were still computed for every sample (cheaply) and bucket equal shapes
    keys = {ds.samples[i].get("_bucket") for i in range(len(ds))}
    assert all(k is not None for k in keys)
    assert len(keys) == 2  # sample 0 has an extra control → its own bucket
    assert all("_first_item" not in s for s in ds.samples)  # no pinned decodes


def test_bucket_keys_match_item_shapes(tmp_image_dir):
    """Header-derived bucket keys equal the decoded img_shapes."""
    proc = ImageProcessor(ProcessorSection(process_type="resize", target_size=[64, 96]))
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=proc)
    dl = DataLoader(ds, batch_size=1)
    for i in range(len(ds)):
        key = dl._bucket_key(i)
        assert key == tuple(ds[i]["img_shapes"]), (i, key)


def test_bucket_keys_cached_samples_use_npz_header(tmp_image_dir, tmp_path):
    """Cached samples bucket by the latent shape read from the npz header."""
    from qflux_tpu.data.cache import EmbeddingCacheManager

    proc = ImageProcessor(ProcessorSection(process_type="resize", target_size=[64, 96]))
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=proc,
                      cache_dir=str(tmp_path / "cache"), use_cache=True)
    cm = ds.cache_manager
    assert isinstance(cm, EmbeddingCacheManager)
    for i in range(len(ds)):
        h = ds.file_hashes(ds.samples[i])
        cm.save(h["main_hash"],
                {"image_latents": np.zeros((16, 64), np.float16),
                 "prompt_embeds": np.zeros((4, 8), np.float16)},
                {"image_latents": "ih", "prompt_embeds": "ph"})
    dl = DataLoader(ds, batch_size=1)
    key = dl._bucket_key(0)
    assert key == ("cached", (16, 64))
