import pytest

from qflux_tpu.config import (
    Config,
    MeshSection,
    ProcessorSection,
    TrainerKind,
    load_config_from_yaml,
)


def test_all_trainer_kinds_have_adapters():
    from qflux_tpu.trainer.base import ADAPTERS
    from qflux_tpu.utils.instantiate import resolve_symbol

    for kind in TrainerKind:
        cls = resolve_symbol(ADAPTERS[kind.value])
        assert hasattr(cls, "load")
        assert hasattr(cls, "default_lora_targets")


def test_processor_pixel_expression_lists():
    p = ProcessorSection(controls_pixels=["256*256", 1024, None])
    assert p.controls_pixels == [65536, 1024, None]


def test_mesh_section_defaults():
    m = MeshSection()
    assert m.fsdp == -1 and m.remat == "flash" and m.sp == 1


def test_invalid_trainer_rejected():
    with pytest.raises(Exception):
        Config.model_validate({"trainer": "NotATrainer"})


def test_invalid_process_type_rejected():
    with pytest.raises(Exception):
        ProcessorSection(process_type="stretch")


def test_nested_interpolation_chain(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        """
logging:
  output_dir: /tmp/root
  project: proj
cache:
  use_cache: true
  cache_dir: ${logging.output_dir}/${logging.project}/cache
"""
    )
    cfg = load_config_from_yaml(p)
    assert cfg.cache.cache_dir == "/tmp/root/proj/cache"


def test_model_dump_roundtrip():
    import json

    cfg = Config.model_validate({"trainer": "QwenImageEditTrainer",
                                 "model": {"quantize": True}})
    blob = json.loads(cfg.model_dump_json())
    cfg2 = Config.model_validate(blob)
    assert cfg2.trainer == cfg.trainer
    assert cfg2.model.quantize.enabled
