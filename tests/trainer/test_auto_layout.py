"""train.auto_entry_layouts: the one-shot relayout of the frozen base into
XLA-preferred entry layouts (trainer/base._maybe_relayout_params →
train_step.relayout_base_params) plus the pinned-format sampler path.

On TPU this kills the per-step weight-stack relayout copies (516 → 506 ms
measured at the 512² headline, docs/PERF.md round 3); the backend gate means
CPU CI must force the path via QFLUX_AUTO_LAYOUT=force — layouts are trivial
on CPU, so the assertion here is end-to-end correctness of the code path
(fit → AOT formats → pinned step → pinned sampler), not speed.
"""

import numpy as np
import pytest

from qflux_tpu.config import Config
from qflux_tpu.data.dataset import ImageDataset
from qflux_tpu.data.loader import DataLoader
from qflux_tpu.data.preprocess import ImageProcessor
from qflux_tpu.trainer.base import Trainer


def _config(tmp_path, img_dir) -> Config:
    return Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "mesh": {"dp": 1, "fsdp": 1, "tp": 1},
        "model": {"variant": "test", "lora": {"r": 4, "lora_alpha": 4}},
        "data": {
            "init_args": {"dataset_path": str(img_dir)},
            "processor": {"process_type": "resize", "target_size": [32, 48]},
            "batch_size": 1,
        },
        "cache": {"use_cache": False},
        "train": {"max_train_steps": 2, "checkpointing_steps": 100,
                  "weight_dtype": "float32"},
        "logging": {"output_dir": str(tmp_path / "out"), "project": "autolayout",
                    "report_to": "tensorboard"},
        "optimizer": {"class_path": "optax.adamw", "learning_rate": 1e-3,
                      "init_args": {}},
        "predict": {"num_inference_steps": 2},
    })


@pytest.fixture()
def img_dir(tmp_path, rng):
    from PIL import Image

    d = tmp_path / "data"
    (d / "training_images").mkdir(parents=True)
    (d / "control_images").mkdir(parents=True)
    for i in range(2):
        stem = f"img_{i:03d}"
        Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
            d / "training_images" / f"{stem}.png")
        (d / "training_images" / f"{stem}.txt").write_text(f"prompt {i}")
        Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
            d / "control_images" / f"{stem}.png")
    return d


def _fit(tmp_path, img_dir, monkeypatch, force):
    if force:
        monkeypatch.setenv("QFLUX_AUTO_LAYOUT", "force")
    else:
        monkeypatch.delenv("QFLUX_AUTO_LAYOUT", raising=False)
    cfg = _config(tmp_path, img_dir)
    proc = ImageProcessor(cfg.data.processor)
    ds = ImageDataset(dataset_path=str(img_dir), processor=proc, use_cache=False)
    dl = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    trainer = Trainer(cfg)
    state = trainer.fit(dl)
    return trainer, state


def test_forced_auto_layout_fit_and_predict(tmp_path, img_dir, monkeypatch, rng):
    trainer, state = _fit(tmp_path / "auto", img_dir, monkeypatch, force=True)
    assert trainer._params_relaid is True
    assert int(state.step) == 2
    # every relaid leaf is committed with a concrete Format the sampler pin
    # can read back
    import jax

    fmts = jax.tree.map(lambda x: x.format, trainer.bundle.dit_params)
    assert all(f is not None for f in jax.tree.leaves(fmts))
    # predict exercises make_sampler(param_formats=…) end-to-end
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    out = trainer.predict(img, "a prompt", height=32, width=48)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_gate_stays_off_on_cpu(tmp_path, img_dir, monkeypatch):
    trainer, state = _fit(tmp_path / "plain", img_dir, monkeypatch, force=False)
    assert trainer._params_relaid is False
    assert int(state.step) == 2


def test_straggler_relayout_recovers(caplog):
    """Round-4 regression: the post-verify straggler branch (a relaid leaf
    coming back in the wrong layout, observed on the tunnel backend) crashed
    with `NameError: name 'logger' is not defined` instead of re-issuing the
    device_put — nulling the 20B Qwen headline in BENCH_r04.json. Force the
    branch with a format mismatch and assert it RECOVERS: warning logged,
    re-put issued exactly for the straggler, result carries the wanted format."""
    import logging

    from qflux_tpu.trainer.train_step import _fix_straggler_layouts

    class Leaf:
        def __init__(self, fmt):
            self.format = fmt

    wanted = ["f0", "f1", "f2"]
    out = [Leaf("f0"), Leaf("WRONG"), Leaf("f2")]
    calls = []

    def fake_put(x, f):
        calls.append((x, f))
        return Leaf(f)

    with caplog.at_level(logging.WARNING, "qflux_tpu.trainer.train_step"):
        fixed, bad = _fix_straggler_layouts(out, wanted, device_put=fake_put)

    assert [x.format for x in fixed] == wanted
    assert bad == []
    assert len(calls) == 1 and calls[0][1] == "f1"
    assert fixed[0] is out[0] and fixed[2] is out[2]  # matches untouched
    assert any("wrong layout" in r.message for r in caplog.records)
    # the default path must resolve a real device_put (the bug was an
    # undefined module-level name, invisible to CPU happy-path tests)
    from qflux_tpu.trainer import train_step as ts
    assert ts.logger.name == "qflux_tpu.trainer.train_step"


def test_persistent_straggler_degrades(caplog):
    """Round-5 regression: on the tunnel backend a 6 KB kernel_scale leaf
    NEVER took its AUTO layout — the re-put loop alone crashed the run later
    at dispatch with an opaque TPU InvalidArgument (it nulled the 20B Qwen
    flagship twice). The post-verify must rebuild such a leaf through the
    host (device_put contract: f=None) and report it so relayout_base_params
    abandons the AOT executable for a pinned-format re-jit."""
    import logging

    from qflux_tpu.trainer.train_step import _fix_straggler_layouts

    class Leaf:
        def __init__(self, fmt):
            self.format = fmt

    wanted = ["f0", "f1"]
    out = [Leaf("f0"), Leaf("WRONG")]
    calls = []

    def stubborn_put(x, f):
        calls.append(f)
        # device-to-device put keeps failing; host rebuild lands default
        return Leaf("DEFAULT" if f is None else "WRONG")

    with caplog.at_level(logging.WARNING, "qflux_tpu.trainer.train_step"):
        fixed, bad = _fix_straggler_layouts(out, wanted, device_put=stubborn_put)

    assert bad == [1]
    assert calls == ["f1", None]  # one re-put attempt, then the host rebuild
    assert fixed[1].format == "DEFAULT"
    assert any("rebuilding through the host" in r.message
               for r in caplog.records)


def test_auto_layout_size_gate():
    """Only leaves >= QFLUX_AUTO_LAYOUT_MIN_BYTES get AUTO entry layouts;
    small leaves (the 6 KB kernel_scale class that the tunnel backend cannot
    relayout — round-4/5 driver logs) pin to the format they already carry,
    so the straggler class cannot arise for them at all."""
    import jax
    import jax.numpy as jnp

    from qflux_tpu.trainer.train_step import relayout_base_params

    big = jnp.zeros((1024, 512), jnp.float32)   # 2 MiB -> AUTO
    small = jnp.zeros((24, 64), jnp.float32)    # 6 KB  -> pinned current
    params = {"w": big, "scale": small}

    def step(state, p, batch, rng):
        return state, {"loss": jnp.sum(p["w"]) + jnp.sum(p["scale"])}

    state = jnp.zeros(())
    compiled, relaid = relayout_base_params(
        step, state, params, {"x": jnp.zeros((2,))}, jax.random.PRNGKey(0))
    # CPU layouts are trivial so everything stays put — the assertion that
    # matters is the compile accepted a mixed AUTO/concrete format tree and
    # the small leaf kept exactly its original format.
    assert relaid["scale"].format == small.format
    _, m = compiled(state, relaid, {"x": jnp.zeros((2,))}, jax.random.PRNGKey(0))
    assert float(m["loss"]) == 0.0


def test_chunk_by_bytes_grouping():
    """The relayout mover batches leaves into byte-bounded device_put calls:
    greedy fill, oversize single leaves get their own group, order preserved."""
    from qflux_tpu.trainer.train_step import _chunk_by_bytes

    class A:  # stand-in with the two attributes the chunker reads
        def __init__(self, nbytes):
            self.size, self.dtype = nbytes, np.dtype(np.uint8)

    moves = [(i, A(nb), f"f{i}") for i, nb in enumerate([60, 60, 100, 300, 10, 10])]
    groups = _chunk_by_bytes(moves, chunk_bytes=128)
    assert [[i for i, _, _ in g] for g in groups] == [[0, 1], [2], [3], [4, 5]]
    # flattening the groups preserves the move order exactly
    assert [i for g in groups for i, _, _ in g] == list(range(6))
    # no-move and single-move edge cases
    assert _chunk_by_bytes([], 128) == []
    assert [[i for i, _, _ in g] for g in _chunk_by_bytes(moves[:1], 1)] == [[0]]
