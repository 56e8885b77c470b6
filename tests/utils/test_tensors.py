import numpy as np

from qflux_tpu.utils.tensors import extract_batch_field, infer_image_tensor, to_hwc_uint8


def test_infer_layouts():
    assert infer_image_tensor(np.zeros((64, 64)))["layout"] == "HW"
    assert infer_image_tensor(np.zeros((64, 64, 3)))["layout"] == "HWC"
    assert infer_image_tensor(np.zeros((3, 64, 64)))["layout"] == "CHW"
    assert infer_image_tensor(np.zeros((2, 64, 64, 3)))["layout"] == "NHWC"
    assert infer_image_tensor(np.zeros((2, 3, 64, 64)))["layout"] == "NCHW"


def test_infer_ranges():
    assert infer_image_tensor(np.zeros((4, 4, 3), np.uint8))["range"] == "0_255"
    assert infer_image_tensor(np.full((4, 4, 3), 200.0))["range"] == "0_255"
    assert infer_image_tensor(np.full((4, 4, 3), -0.5))["range"] == "-1_1"
    assert infer_image_tensor(np.full((4, 4, 3), 0.5))["range"] == "0_1"


def test_to_hwc_uint8_roundtrips():
    chw = np.random.default_rng(0).uniform(-1, 1, (3, 8, 8)).astype(np.float32)
    out = to_hwc_uint8(chw)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8
    back = out.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(back.transpose(2, 0, 1), chw, atol=1 / 127.5 + 1e-6)


def test_extract_batch_field():
    batch = {"x": np.arange(6).reshape(2, 3), "names": ["a", "b"]}
    assert extract_batch_field(batch, "missing") is None
    np.testing.assert_array_equal(extract_batch_field(batch, "x", 1), [3, 4, 5])
    assert extract_batch_field(batch, "names", 0) == "a"
