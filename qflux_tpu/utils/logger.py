"""Unified metric/image/text logging over TensorBoard / wandb / SwanLab.

Re-design of the reference's LoggerManager (reference utils/logger.py:32-123,
401-502): same backend-factory pattern and main-process gating; image grids
are assembled in numpy (no torchvision).  wandb/swanlab import lazily and
degrade to a warning if absent (wandb is not in this image)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np


def make_grid(images: list[np.ndarray], ncols: int = 4, pad: int = 2) -> np.ndarray:
    """[H, W, 3] uint8 images → single grid image."""
    n = len(images)
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    grid = np.zeros((nrows * (h + pad) - pad, ncols * (w + pad) - pad, 3), np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, ncols)
        y, x = r * (h + pad), c * (w + pad)
        grid[y:y + im.shape[0], x:x + im.shape[1]] = im
    return grid


class BaseLogger:
    def log_metrics(self, metrics: dict[str, float], step: int): ...
    def log_images(self, tag: str, images: list[np.ndarray], step: int, ncols: int = 4): ...
    def log_text(self, tag: str, text: str, step: int): ...
    def log_table(self, tag: str, rows: list[dict], step: int): ...
    def log_hparams(self, hparams: dict): ...
    def close(self): ...


class NullLogger(BaseLogger):
    pass


class TensorBoardLogger(BaseLogger):
    def __init__(self, log_dir: str | Path):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(str(log_dir))

    def log_metrics(self, metrics, step):
        for k, v in metrics.items():
            self.writer.add_scalar(k, float(v), step)

    def log_images(self, tag, images, step, ncols=4):
        grid = make_grid(images, ncols)
        self.writer.add_image(tag, grid, step, dataformats="HWC")

    def log_text(self, tag, text, step):
        self.writer.add_text(tag, text, step)

    def log_table(self, tag, rows, step):
        if not rows:
            return
        cols = list(rows[0])
        lines = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
        lines += ["| " + " | ".join(str(r.get(c, "")) for c in cols) + " |" for r in rows]
        self.writer.add_text(tag, "\n".join(lines), step)

    def log_hparams(self, hparams):
        self.writer.add_text("hparams", "```\n" + repr(hparams) + "\n```", 0)

    def close(self):
        self.writer.close()


class WandbLogger(BaseLogger):  # pragma: no cover - wandb absent in this image
    def __init__(self, project: str, name: Optional[str] = None, config: Optional[dict] = None):
        import wandb

        self.run = wandb.init(project=project, name=name, config=config)
        self._wandb = wandb

    def log_metrics(self, metrics, step):
        self.run.log(metrics, step=step)

    def log_images(self, tag, images, step, ncols=4):
        self.run.log({tag: [self._wandb.Image(im) for im in images]}, step=step)

    def log_text(self, tag, text, step):
        self.run.log({tag: text}, step=step)

    def log_hparams(self, hparams):
        self.run.config.update(hparams, allow_val_change=True)

    def close(self):
        self.run.finish()


class SwanLabLogger(BaseLogger):  # pragma: no cover - swanlab absent
    def __init__(self, project: str, name: Optional[str] = None, config: Optional[dict] = None):
        import swanlab

        self.run = swanlab.init(project=project, experiment_name=name, config=config)
        self._swanlab = swanlab

    def log_metrics(self, metrics, step):
        self.run.log(metrics, step=step)

    def log_images(self, tag, images, step, ncols=4):
        self.run.log({tag: [self._swanlab.Image(im) for im in images]}, step=step)

    def close(self):
        self.run.finish()


class LoggerManager:
    """Backend factory + main-process gating (reference utils/logger.py:422-431)."""

    def __init__(self, report_to: str = "tensorboard", log_dir: str = "output/logs",
                 project: str = "qflux_tpu", name: Optional[str] = None,
                 config: Optional[dict] = None, is_main_process: bool = True):
        self.is_main = is_main_process
        self.backend: BaseLogger = NullLogger()
        if not is_main_process or report_to in ("none", None):
            return
        try:
            if report_to == "tensorboard":
                self.backend = TensorBoardLogger(log_dir)
            elif report_to == "wandb":
                self.backend = WandbLogger(project, name, config)
            elif report_to == "swanlab":
                self.backend = SwanLabLogger(project, name, config)
            else:
                raise ValueError(f"unknown logging backend {report_to!r}")
        except ImportError as e:
            logging.warning("logging backend %s unavailable (%s); metrics disabled",
                            report_to, e)
        if config is not None:
            self.backend.log_hparams(config)

    def __getattr__(self, name):
        if name.startswith("log_") or name == "close":
            return getattr(self.backend, name)
        raise AttributeError(name)
