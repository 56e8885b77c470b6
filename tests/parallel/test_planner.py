"""Mesh memory planner (parallel/planner.py): per-device numbers must track
the sharding arithmetic — more fsdp shards → fewer argument bytes per device
— and the compiled step must contain FSDP's all-gather/all-reduce plan."""

import pytest

from qflux_tpu.parallel.planner import plan


@pytest.fixture(scope="module")
def reports():
    kw = dict(grid=4, txt_len=8, lora_rank=2)
    return (plan("flux", "tiny", mesh_axes={"fsdp": 2}, **kw),
            plan("flux", "tiny", mesh_axes={"fsdp": 8}, **kw))


def test_fsdp_shards_argument_bytes(reports):
    r2, r8 = reports
    # params dominate arguments; 8-way sharding must strictly beat 2-way
    assert r8["per_device_mb"]["arguments"] < r2["per_device_mb"]["arguments"]


def test_collective_plan_present(reports):
    r2, _ = reports
    c = r2["collectives"]
    # FSDP = all-gather params forward, psum grads backward
    assert c["all-gather"] > 0
    assert c["all-reduce"] > 0


def test_report_schema(reports):
    r2, _ = reports
    assert r2["mesh"]["fsdp"] == 2
    assert r2["quant"] == "bf16"
    assert isinstance(r2["fits_16gb_v5e"], bool)
    for k in ("arguments", "temp", "output", "resident_est"):
        assert r2["per_device_mb"][k] >= 0


def test_quantized_base_shrinks_arguments():
    kw = dict(grid=4, txt_len=8, lora_rank=2, mesh_axes={"fsdp": 2})
    bf16 = plan("flux", "tiny", **kw)
    int8 = plan("flux", "tiny", quant_dtype="int8", **kw)
    assert (int8["per_device_mb"]["arguments"]
            < bf16["per_device_mb"]["arguments"])
