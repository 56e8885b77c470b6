import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qflux_tpu.ops.quant import dequantize_kernel, quantize_kernel, quantize_tree
from qflux_tpu.config import QuantizeSection
from qflux_tpu.utils.fps import FpsLogger
from qflux_tpu.utils.hashing import combine_hashes, md5_string, phash_image
from qflux_tpu.utils.logger import LoggerManager, make_grid
from qflux_tpu.utils.seed import seed_everything


# -- FPS --------------------------------------------------------------------

def test_fps_logger_warmup_and_window():
    f = FpsLogger(warmup_steps=1, window=10)
    f.start()
    for _ in range(5):
        time.sleep(0.01)
        f.step(n_items=2)
    assert f.fps is not None
    assert 50 < f.fps < 500  # ~200 items/s nominal, generous bounds
    assert f.smoothed_fps is not None


def test_fps_pause_excludes_time():
    f = FpsLogger(warmup_steps=0, window=10)
    f.start()
    time.sleep(0.01)
    f.pause()
    time.sleep(0.05)  # validation time — must not count
    f.resume()
    fps = f.step(n_items=1)
    assert fps is not None and fps > 30  # ~100/s without the pause


# -- quantization -----------------------------------------------------------

def test_quantize_roundtrip_error():
    k = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    q, scale = quantize_kernel(k, "int8")
    assert q.dtype == jnp.int8
    back = dequantize_kernel(q, scale, jnp.float32)
    rel = float(jnp.abs(back - k).max() / jnp.abs(k).max())
    assert rel < 0.02  # int8 per-channel quantization error


def test_quantize_tree_skips_norms():
    tree = {
        "attn": {"to_q": {"kernel": jnp.ones((8, 8)), "bias": jnp.zeros(8)}},
        "norm": {"scale": jnp.ones(8)},
        "x_norm_thing": {"kernel": jnp.ones((8, 8))},
    }
    out = quantize_tree(tree, QuantizeSection(enabled=True, dtype="int8"))
    assert "kernel_q" in out["attn"]["to_q"] and "kernel" not in out["attn"]["to_q"]
    assert "bias" in out["attn"]["to_q"]
    assert out["norm"]["scale"].dtype == jnp.float32  # untouched
    assert "kernel" in out["x_norm_thing"]  # skip pattern matched


def test_quantized_dense_close():
    from qflux_tpu.ops.layers import dense

    k = jax.random.normal(jax.random.PRNGKey(0), (32, 16))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    q, scale = quantize_kernel(k, "int8")
    y_ref = dense({"kernel": k}, x)
    y_q = dense({"kernel_q": q, "kernel_scale": scale}, x)
    assert float(jnp.abs(y_ref - y_q).max()) < 0.15


# -- hashing ----------------------------------------------------------------

def test_phash_stability_and_sensitivity(rng):
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    h1 = phash_image(img)
    h2 = phash_image(img)
    assert h1 == h2 and len(h1) == 16
    other = phash_image(255 - img)
    assert other != h1


def test_combine_hashes_order_sensitive():
    assert combine_hashes("a", "b") != combine_hashes("b", "a")
    assert combine_hashes("a", "b") == combine_hashes("a", "b")


# -- seed / logger ----------------------------------------------------------

def test_seed_everything_reproducible():
    seed_everything(7)
    a = np.random.rand(3)
    seed_everything(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_make_grid_layout(rng):
    imgs = [rng.integers(0, 255, (8, 10, 3), dtype=np.uint8) for _ in range(5)]
    grid = make_grid(imgs, ncols=3, pad=1)
    assert grid.shape == (2 * 8 + 1, 3 * 10 + 2, 3)


def test_logger_manager_tensorboard(tmp_path):
    lm = LoggerManager(report_to="tensorboard", log_dir=tmp_path, config={"a": 1})
    lm.log_metrics({"loss": 1.0}, 1)
    lm.log_text("t", "hello", 1)
    lm.log_table("tab", [{"x": 1, "y": 2}], 1)
    lm.log_images("img", [np.zeros((4, 4, 3), np.uint8)], 1)
    lm.close()
    assert any(tmp_path.iterdir())


def test_logger_manager_non_main_is_null():
    lm = LoggerManager(report_to="tensorboard", is_main_process=False)
    lm.log_metrics({"x": 1}, 0)  # no-op, no file writes


def test_logger_manager_missing_backend_degrades(tmp_path):
    lm = LoggerManager(report_to="wandb", log_dir=tmp_path)  # wandb not installed
    lm.log_metrics({"x": 1.0}, 0)  # degrades to null, no crash
