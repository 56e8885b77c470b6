"""prompt_image_dropout_rate: drops BOTH prompt and control conditioning at
item level (round-1 gap: knob was accepted and never applied)."""

import numpy as np

from qflux_tpu.data.dataset import ImageDataset
from qflux_tpu.data.preprocess import ImageProcessor


def _proc():
    from qflux_tpu.config import ProcessorSection

    return ImageProcessor(ProcessorSection(process_type="resize",
                                           target_size=[32, 48]))


def test_prompt_image_dropout_pixel_path(tmp_image_dir):
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=_proc(),
                      prompt_image_dropout_rate=1.0)
    item = ds[0]
    assert item["prompt"] == ""
    assert np.all(np.asarray(item["control"]) == 0)


def test_caption_dropout_pixel_path(tmp_image_dir):
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=_proc(),
                      caption_dropout_rate=1.0)
    item = ds[0]
    assert item["prompt"] == ""
    assert np.any(np.asarray(item["control"]) != 0)  # control kept


def test_no_dropout_keeps_conditioning(tmp_image_dir):
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=_proc())
    item = ds[0]
    assert item["prompt"] != ""
    assert np.any(np.asarray(item["control"]) != 0)


def test_prompt_image_dropout_cached_path(tmp_image_dir, tmp_path):
    """Cached fast path: control latents zeroed, empty-prompt embeds used."""
    from qflux_tpu.data.cache import EmbeddingCacheManager

    cache_dir = tmp_path / "cache"
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=_proc(),
                      cache_dir=str(cache_dir), use_cache=True,
                      prompt_image_dropout_rate=1.0)
    cm = EmbeddingCacheManager(str(cache_dir))
    h = ds.file_hashes(ds.samples[0])
    cm.save(h["main_hash"], {
        "image_latents": np.ones((4, 8), np.float16),
        "control_latents": np.ones((4, 8), np.float16),
        "prompt_embeds": np.ones((3, 8), np.float16),
        "empty_prompt_embeds": np.zeros((3, 8), np.float16),
    }, {"image_latents": h["image_hash"],
        "control_latents": h.get("control_hash", h["image_hash"]),
        "prompt_embeds": h["prompt_hash"],
        "empty_prompt_embeds": h["empty_prompt_hash"]})
    item = ds[0]
    assert item["cached"]
    assert np.all(item["control_latents"] == 0)
    np.testing.assert_array_equal(item["prompt_embeds"], 0)  # empty-prompt sub
