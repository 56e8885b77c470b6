import numpy as np
import pytest

from qflux_tpu.config import ProcessorSection
from qflux_tpu.data.preprocess import ImageProcessor, count_hw_pairs


def test_count_hw_pairs_exact():
    # 512*512 = 262144; e.g. (512,512), (256,1024)... bounded by sides
    n, examples = count_hw_pairs(512 * 512, min_side=256, max_side=1024)
    assert n == len([1 for (h, w) in
                     [(h, 512 * 512 // h) for h in range(256, 1025, 16)]
                     if (512 * 512) % h == 0 and h % 16 == 0
                     and (512 * 512 // h) % 16 == 0 and 256 <= 512 * 512 // h <= 1024])
    assert all(h * w == 512 * 512 for h, w in examples)


def test_grayscale_mask_padding(rng):
    proc = ImageProcessor(ProcessorSection(process_type="center_padding",
                                           target_size=[64, 64]))
    mask = rng.integers(0, 255, (100, 50), dtype=np.uint8)  # 2D grayscale
    out = proc.process_image(mask, "target")
    assert out.shape == (64, 64)


def test_right_padding_anchors_left(rng):
    proc = ImageProcessor(ProcessorSection(process_type="right_padding",
                                           target_size=[64, 128]))
    img = np.full((64, 64, 3), 200, np.uint8)
    out = proc.process_image(img, "target")
    assert out[:, :64].mean() > 150      # image on the left
    assert out[:, 64:].mean() == 0       # padding on the right


def test_divisible_rounding():
    proc = ImageProcessor(ProcessorSection(process_type="resize",
                                           target_size=[70, 100]))
    img = np.zeros((50, 50, 3), np.uint8)
    out = proc.process_image(img, "target")
    assert out.shape[:2] == (64, 96)  # floored to 16-divisible


def test_per_control_sizes(rng):
    proc = ImageProcessor(ProcessorSection(
        process_type="resize", target_size=[64, 64],
        controls_size=[[32, 32], [48, 48]]))
    img = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
    assert proc.process_image(img, "control_0").shape[:2] == (32, 32)
    assert proc.process_image(img, "control_1").shape[:2] == (48, 48)


def test_preprocess_sample_dict(rng):
    proc = ImageProcessor(ProcessorSection(process_type="resize", target_size=[32, 32]))
    sample = {
        "image": rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
        "mask": rng.integers(0, 255, (64, 64), dtype=np.uint8),
        "control": rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
        "controls": [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)],
    }
    out = proc.preprocess(sample)
    assert out["image"].shape == (32, 32, 3)
    assert out["mask"].shape == (32, 32)
    assert out["mask"].max() <= 1.0  # normalized
    assert out["control"].shape == (32, 32, 3)
    assert out["controls"][0].shape == (32, 32, 3)


def test_bucket_key_distinguishes_shapes(rng):
    proc = ImageProcessor(ProcessorSection(process_type="resize", target_size=[32, 32]))
    s1 = {"image": np.zeros((32, 32, 3)), "control": np.zeros((32, 32, 3))}
    s2 = {"image": np.zeros((32, 48, 3)), "control": np.zeros((32, 32, 3))}
    assert proc.bucket_key(s1) != proc.bucket_key(s2)
    assert proc.bucket_key(s1) == proc.bucket_key(dict(s1))
