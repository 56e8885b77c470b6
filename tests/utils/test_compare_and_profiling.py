import numpy as np

import jax
import jax.numpy as jnp

from qflux_tpu.utils.model_compare import compare_params, print_report, summarize
from qflux_tpu.utils.profiling import StepTimer, compile_time


def test_compare_params_statuses():
    a = {"x": {"kernel": np.ones((2, 3)), "bias": np.zeros(3)},
         "only_a": np.ones(2)}
    b = {"x": {"kernel": np.ones((2, 3)) + 1e-3, "bias": np.zeros(4)},
         "only_b": np.ones(2)}
    diffs = {d.path: d for d in compare_params(a, b)}
    assert diffs["x/kernel"].status == "value_mismatch"
    assert diffs["x/bias"].status == "shape_mismatch"
    assert diffs["only_a"].status == "only_in_a"
    assert diffs["only_b"].status == "only_in_b"
    s = summarize(list(diffs.values()))
    assert s["value_mismatch"] == 1
    report = print_report(list(diffs.values()))
    assert "x/kernel" in report


def test_compare_params_match_within_rtol():
    a = {"k": np.ones(5)}
    b = {"k": np.ones(5) * (1 + 1e-8)}
    assert compare_params(a, b)[0].status == "match"


def test_lora_file_compare(tmp_path):
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.utils.lora_io import save_lora_safetensors
    from qflux_tpu.utils.model_compare import compare_lora_files

    cfg = flux.FluxConfig.tiny()
    params = flux.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    l1 = build_lora_tree(jax.random.PRNGKey(1), params, [r"attn/to_q"], 2, 2)
    l2 = jax.tree.map(lambda x: x + 0.1 if x.ndim >= 2 else x, l1)
    p1 = save_lora_safetensors(l1, tmp_path / "a")
    p2 = save_lora_safetensors(l2, tmp_path / "b")
    same = compare_lora_files(p1, p1)
    assert all(d.status == "match" for d in same)
    diff = compare_lora_files(p1, p2)
    assert any(d.status == "value_mismatch" for d in diff)


def test_step_timer_and_compile_time():
    t = StepTimer()
    x = jnp.ones((8, 8))
    t.start()
    y = x @ x
    dt = t.stop(sync_value=y.sum())
    assert dt > 0 and t.mean > 0

    info = compile_time(lambda a: a @ a, x)
    assert info["compile_s"] > 0


def test_hub_schema_building(tmp_image_dir):
    from qflux_tpu.utils.hub import build_editing_records, is_huggingface_repo

    recs = build_editing_records(tmp_image_dir)
    assert len(recs) == 3
    assert recs[0]["target_image"].endswith(".png")
    assert recs[0]["prompt"].startswith("test prompt")
    assert is_huggingface_repo("org/dataset")
    assert not is_huggingface_repo(str(tmp_image_dir))
