"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference tests distributed logic by mocking the Accelerator object
(reference tests/e2e/test_flux_loss.py:34-58).  On TPU/JAX we can do better:
XLA can expose N virtual CPU devices, so real GSPMD sharding + collectives run
in-process.  These env vars must be set before jax is imported anywhere.
"""

import os

# force-override: the session environment pins JAX_PLATFORMS to the TPU tunnel
# (the 'axon' plugin ignores the env var, so use jax.config below as well)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# ---------------------------------------------------------------------------
# slow-tier split (VERDICT r3 #9; mirrors the reference's pytest.ini markers):
# `-m "not slow"` is the <10-min inner loop, the full suite stays the default.
# Central list (vs scattering pytestmark) so the split is auditable in one
# place; patterns are fnmatch over nodeids, calibrated from --durations of the
# full run (2026-08-18: 48 min total on the 1-CPU CI box).

SLOW_NODE_PATTERNS = [
    "tests/parallel/test_multiprocess.py::*",          # real 2-OS-process fits
    "tests/test_graft_entry.py::*",                    # driver-contract compiles
    "tests/parallel/test_planner.py::*",               # AOT full-step compiles
    "tests/trainer/test_plan_cli.py::test_plan_preflight_from_config",
    "tests/ops/test_ring_attention.py::test_train_step_sp2_fsdp2*",
    "tests/ops/test_int8_dynamic.py::test_quant_quality_three_way_tiny",
    "tests/ops/test_int8_dynamic.py::test_w8a8_training_converges_like_fp32",
    "tests/models/test_qwen_stack.py::test_qwen_vae_roundtrip_shapes",
    "tests/models/test_qwen3_parity.py::*",
    "tests/models/test_qwen_vae_oracle.py::*deep*",
    "tests/models/test_flux_transformer.py::test_lora_injection_and_grads",
    "tests/data/test_conditioning_dropout.py::test_trainer_zeroes_control_latents_on_flag",
    "tests/trainer/test_train_step.py::test_grad_accum_matches_big_batch",
    "tests/trainer/test_train_step.py::test_train_step_sharded",
    "tests/trainer/test_multi_resolution.py::*",
    "tests/trainer/test_multires_predict.py::*",
    "tests/trainer/test_quantized_fit.py::*",
    "tests/trainer/test_cfg_predict.py::*",
    "tests/trainer/test_trainer_e2e.py::*",
    "tests/trainer/test_qwen_trainer_e2e.py::*",
    "tests/trainer/test_plus_pipeline.py::*",
    "tests/trainer/test_other_adapters.py::test_flux2_klein_stack",
    "tests/trainer/test_trainer_edges.py::test_epoch_exhaustion_stops_at_num_epochs",
    "tests/trainer/test_async_checkpoint.py::*",
    "tests/trainer/test_auto_layout.py::*",
    "tests/trainer/test_vlm_enhancer.py::*",
    "tests/ops/test_ring_attention.py::test_ring_kernel*",
    "tests/ops/test_flash_nr.py::test_non_block_aligned_seq_pads",
    "tests/ops/test_int4_quant.py::test_int4_requant_grad_straight_through",
]


def pytest_collection_modifyitems(config, items):
    import fnmatch

    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if any(fnmatch.fnmatch(nodeid, pat) for pat in SLOW_NODE_PATTERNS):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def tmp_image_dir(tmp_path, rng):
    """A small on-disk folder dataset: target/control images + prompt txts.

    Mirrors the reference's local-dir layout (reference data/dataset.py:300-301):
      training_images/{stem}.png, {stem}.txt
      control_images/{stem}.png (first control), {stem}_control_1.png, {stem}_mask.png
    """
    from PIL import Image

    tgt = tmp_path / "training_images"
    ctl = tmp_path / "control_images"
    tgt.mkdir()
    ctl.mkdir()
    for i in range(3):
        stem = f"img_{i:03d}"
        arr = rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tgt / f"{stem}.png")
        (tgt / f"{stem}.txt").write_text(f"test prompt number {i}")
        arr_c = rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
        Image.fromarray(arr_c).save(ctl / f"{stem}.png")
        if i == 0:  # one sample with an extra control and a mask
            Image.fromarray(arr_c).save(ctl / f"{stem}_control_1.png")
            mask = (rng.random((64, 96)) > 0.5).astype(np.uint8) * 255
            Image.fromarray(mask).save(ctl / f"{stem}_mask.png")
    return tmp_path
