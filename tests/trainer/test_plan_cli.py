"""`main.py --plan`: the preflight fit check must run from a user config
(deriving model/mesh/quant/remat from YAML) without touching the dataset or
any accelerator."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).parents[2]


def test_plan_remat_vocab_in_sync():
    """Every mesh.remat value the config accepts must map (via
    remat_policy_from_config) into mesh_report.py's --remat choices —
    round 4 added flash_single to the config but not to the planner CLI,
    so `--plan` crashed for exactly the long-sequence configs that most
    need a preflight check."""
    import typing

    from qflux_tpu.config import MeshSection
    from qflux_tpu.trainer.flux_kontext import remat_policy_from_config

    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import mesh_report
    finally:
        sys.path.pop(0)

    cfg_values = typing.get_args(MeshSection.model_fields["remat"].annotation)
    for v in cfg_values:
        if v == "none":
            continue  # --plan special-cases none before the subprocess
        assert remat_policy_from_config(v) in mesh_report.REMAT_CHOICES, v


def test_plan_preflight_from_config(tmp_path):
    cfg = {
        "trainer": "FluxKontextLoraTrainer",
        "mesh": {"dp": 1, "fsdp": -1, "tp": 1, "remat": "flash"},
        "model": {"variant": "test", "lora": {"r": 2, "lora_alpha": 2}},
        # dataset path deliberately nonexistent: --plan must not open it
        "data": {"init_args": {"dataset_path": str(tmp_path / "nope")},
                 "processor": {"process_type": "resize", "target_size": [64, 64]},
                 "batch_size": 1},
        "train": {"max_train_steps": 1, "weight_dtype": "float32"},
        "logging": {"output_dir": str(tmp_path / "out"), "project": "plan",
                    "report_to": "none"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    out = subprocess.run(
        [sys.executable, "-m", "qflux_tpu.main", "--config", str(cfg_path),
         "--plan", "--plan-devices", "2"],
        capture_output=True, text=True, timeout=1200, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "fsdp2" in out.stdout and "resident" in out.stdout, out.stdout
    # batch was rounded up to the data-parallel size with a notice
    assert "batch 1 -> 2" in out.stdout, out.stdout
