"""Training observability: console logging, JSONL metrics, TensorBoard.

Replaces the reference's ``logger/`` package (rotating-file logging config +
``TensorboardWriter`` proxy): a run directory gets ``info.log``, a
``metrics.jsonl`` stream (always on), and TensorBoard event files when the
``tensorboard`` package is importable (lazy, like the reference's optional
import at ``logger/visualization.py:5-20``). The writer auto-tags scalars
with train/valid mode and tracks steps/sec.
"""

from __future__ import annotations

import json
import logging
import logging.handlers
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def setup_logging(log_dir: Path, name: str = "monorec", verbosity: int = 2) -> logging.Logger:
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger(name)
    level = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}.get(verbosity, logging.DEBUG)
    logger.setLevel(level)
    if not logger.handlers:
        con = logging.StreamHandler()
        con.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(con)
        fh = logging.handlers.RotatingFileHandler(
            log_dir / "info.log", maxBytes=10 * 1024 * 1024, backupCount=20
        )
        fh.setFormatter(
            logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        )
        logger.addHandler(fh)
    return logger


class MetricsWriter:
    """Scalar/image sink: JSONL always; TensorBoard when available."""

    def __init__(self, log_dir: Path, enable_tensorboard: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.step = 0
        self.mode = ""
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.log_dir))
            except Exception:  # pragma: no cover - tb genuinely optional
                self._tb = None
        self._timer = time.monotonic()

    def set_step(self, step: int, mode: str = "train"):
        if mode == "train" and step > self.step:
            now = time.monotonic()
            dt = now - self._timer
            self._timer = now
            if dt > 0:
                self.add_scalar("steps_per_sec", (step - self.step) / dt)
        self.step = step
        self.mode = mode

    def _tag(self, tag: str) -> str:
        return f"{tag}/{self.mode}" if self.mode else tag

    def add_scalar(self, tag: str, value):
        value = float(np.asarray(value))
        self._jsonl.write(
            json.dumps({"step": self.step, "tag": self._tag(tag), "value": value})
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(self._tag(tag), value, self.step)

    def add_image(self, tag: str, image_hwc: np.ndarray):
        """image_hwc in [0, 1]."""
        if self._tb is not None:
            self._tb.add_image(
                self._tag(tag), np.asarray(image_hwc), self.step, dataformats="HWC"
            )

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def make_grid(images: np.ndarray, nrow: int = 2, normalize: bool = True) -> np.ndarray:
    """(N, H, W, C) -> single HWC grid image in [0, 1]."""
    n, h, w, c = images.shape
    if normalize:
        lo, hi = images.min(), images.max()
        images = (images - lo) / max(hi - lo, 1e-8)
    rows = -(-n // nrow)
    grid = np.zeros((rows * h, nrow * w, c), dtype=np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    return grid
