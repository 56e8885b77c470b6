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
