"""prompt_image_dropout_rate: drops prompt AND control conditioning at item
level, with ONE null representation (zeroed control latents) on both the
cached and pixel paths (round-1 gap: knob accepted and never applied)."""

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
    # pixels stay intact; the flag tells the Trainer to zero the control
    # LATENTS after encoding (matching the cached path's representation)
    assert item["drop_context"] is True
    assert np.any(np.asarray(item["control"]) != 0)


def test_caption_dropout_pixel_path(tmp_image_dir):
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=_proc(),
                      caption_dropout_rate=1.0)
    item = ds[0]
    assert item["prompt"] == ""
    assert item["drop_context"] is False  # control context kept


def test_no_dropout_keeps_conditioning(tmp_image_dir):
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=_proc())
    item = ds[0]
    assert item["prompt"] != ""
    assert item["drop_context"] is False


def test_dropout_is_deterministic_and_resamples_per_epoch(tmp_image_dir):
    """Draws key on (seed, idx, visit) — identical across runs regardless of
    loader thread order, different across epochs."""
    def draws(ds, epochs=3):
        return [[ds[i]["drop_context"] for i in range(len(ds))]
                for _ in range(epochs)]

    a = draws(ImageDataset(dataset_path=str(tmp_image_dir), processor=_proc(),
                           prompt_image_dropout_rate=0.5, seed=3))
    b = draws(ImageDataset(dataset_path=str(tmp_image_dir), processor=_proc(),
                           prompt_image_dropout_rate=0.5, seed=3))
    assert a == b                    # same seed → same pattern
    assert len({tuple(e) for e in a}) > 1 or len(a[0]) < 2  # resamples


def test_trainer_zeroes_control_latents_on_flag(tmp_image_dir, tmp_path):
    from qflux_tpu.config import Config
    from qflux_tpu.trainer.base import Trainer

    cfg = Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "model": {"variant": "test"},
        "train": {"weight_dtype": "float32"},
        "data": {"processor": {"process_type": "resize", "target_size": [32, 48]}},
        "logging": {"output_dir": str(tmp_path), "report_to": "none"},
    })
    t = Trainer(cfg)
    t.load_model()
    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=_proc(),
                      prompt_image_dropout_rate=1.0)
    from qflux_tpu.data.collate import collate

    batch = collate([ds[0]])
    emb = t._embeddings_for_batch(batch)
    assert np.all(np.asarray(emb["control_latents"]) == 0)
    # without the flag, latents are nonzero
    ds2 = ImageDataset(dataset_path=str(tmp_image_dir), processor=_proc())
    emb2 = t._embeddings_for_batch(collate([ds2[0]]))
    assert np.any(np.asarray(emb2["control_latents"]) != 0)


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


def test_cache_cli_mode_never_bakes_dropout(tmp_image_dir, tmp_path):
    """The CLI cache pass zeroes the dropout rates before caching so dropped
    prompts / null controls can never be baked into the embedding cache."""
    import json

    import yaml

    from qflux_tpu.config import Config
    from qflux_tpu.main import main

    cfg = Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "model": {"variant": "test"},
        "train": {"weight_dtype": "float32"},
        "data": {"init_args": {"dataset_path": str(tmp_image_dir)},
                 "processor": {"process_type": "resize", "target_size": [32, 48]},
                 "caption_dropout_rate": 1.0},
        "cache": {"use_cache": True, "cache_dir": str(tmp_path / "cache")},
        "logging": {"output_dir": str(tmp_path / "out"), "report_to": "none"},
    })
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(json.loads(cfg.model_dump_json())))
    main(["--config", str(cfg_path), "--cache"])

    # every cached sample must carry the REAL prompt embeds (≠ empty ones)
    from qflux_tpu.data.cache import EmbeddingCacheManager
    from qflux_tpu.data.preprocess import ImageProcessor as IP

    ds = ImageDataset(dataset_path=str(tmp_image_dir), processor=_proc(),
                      cache_dir=str(tmp_path / "cache"), use_cache=True)
    cm = EmbeddingCacheManager(str(tmp_path / "cache"))
    for sample in ds.samples:
        h = ds.file_hashes(sample)
        rec = cm.load(h["main_hash"])
        rec_empty = cm.load(h["main_hash"], use_empty_prompt=True)
        assert rec is not None
        assert not np.allclose(rec["prompt_embeds"], rec_empty["prompt_embeds"])
