import pytest

from qflux_tpu.config import (
    Config,
    load_config_from_yaml,
    parse_pixels,
    resolve_interpolations,
)


def test_parse_pixels():
    assert parse_pixels("512*512") == 512 * 512
    assert parse_pixels(262144) == 262144
    assert parse_pixels(None) is None
    with pytest.raises(Exception):
        parse_pixels("__import__('os')")


def test_interpolation():
    tree = {
        "logging": {"output_dir": "/tmp/out", "project": "p1"},
        "cache": {"cache_dir": "${logging.output_dir}/cache"},
        "whole": "${logging.project}",
    }
    r = resolve_interpolations(tree)
    assert r["cache"]["cache_dir"] == "/tmp/out/cache"
    assert r["whole"] == "p1"


def test_interpolation_cycle_raises():
    with pytest.raises(ValueError):
        resolve_interpolations({"a": "${b}", "b": "${a}"})


def test_config_defaults_and_strictness():
    cfg = Config()
    assert cfg.trainer.value == "FluxKontextLoraTrainer"
    with pytest.raises(Exception):
        Config.model_validate({"no_such_key": 1})


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        """
trainer: FluxKontextLoraTrainer
logging:
  output_dir: /tmp/xyz
cache:
  use_cache: true
  cache_dir: ${logging.output_dir}/cache
data:
  batch_size: 2
  processor:
    target_pixels: "512*512"
"""
    )
    cfg = load_config_from_yaml(p)
    assert cfg.cache.cache_dir == "/tmp/xyz/cache"
    assert cfg.data.processor.target_pixels == 262144
    # cross-default wiring: cache dir pushed into dataset init args
    assert cfg.data.init_args["cache_dir"] == "/tmp/xyz/cache"
    assert cfg.data.init_args["use_cache"] is True


def test_quantize_coercion():
    cfg = Config.model_validate({"model": {"quantize": True}})
    assert cfg.model.quantize.enabled
    assert cfg.model.quantize.dtype == "int8"
