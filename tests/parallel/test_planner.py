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


def test_planner_advises_sp_for_long_sequences():
    """Round 3 (VERDICT #8): a 16k-token workload gets sequence-parallel
    advice; short ones don't."""
    from qflux_tpu.parallel.planner import plan

    r = plan("flux", "tiny", mesh_axes={"fsdp": 2}, batch_size=2,
             grid=(96, 96), txt_len=512, remat_policy="flash")
    assert r["joint_seq"] == 512 + 2 * 96 * 96
    assert r["advice"] and "mesh.sp" in r["advice"][0]

    r2 = plan("flux", "tiny", mesh_axes={"fsdp": 2}, batch_size=2,
              grid=(8, 8), txt_len=64, remat_policy="flash")
    assert r2["advice"] == []


def test_trainer_warns_sp_for_long_sequences(tmp_path, caplog):
    import logging as _logging

    from qflux_tpu.config import Config
    from qflux_tpu.trainer.base import Trainer

    cfg = Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "model": {"variant": "test"},
        "train": {"weight_dtype": "float32"},
        "data": {"processor": {"process_type": "resize",
                               "target_size": [2048, 2048]}},
        "logging": {"output_dir": str(tmp_path), "report_to": "none"},
    })
    t = Trainer(cfg)
    t.load_model()
    with caplog.at_level(_logging.WARNING):
        t._advise_sequence_parallel()
    assert any("mesh.sp" in r.message for r in caplog.records)
