"""Observability: TensorBoard-compatible scalars/images + JSONL mirror.

Scalar names match the reference's SummaryWriter calls
(code/train.py:298-329) so training curves are directly comparable.
tensorboardX is optional — the JSONL stream is always written.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

try:
    from tensorboardX import SummaryWriter as _TBWriter
except Exception:  # pragma: no cover
    _TBWriter = None


def make_grid(images: np.ndarray, ncols: int = 3, normalize: bool = True) -> np.ndarray:
    """(N, H, W, C) -> (GH, GW, C) tiled grid (torchvision-make_grid-like)."""
    images = np.asarray(images, np.float32)
    if images.ndim == 3:
        images = images[..., None]
    n, h, w, c = images.shape
    if normalize:
        lo, hi = images.min(), images.max()
        images = (images - lo) / max(hi - lo, 1e-12)
    nrows = -(-n // ncols)
    grid = np.zeros((nrows * h, ncols * w, c), np.float32)
    for i in range(n):
        r, col = divmod(i, ncols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    return grid


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = _TBWriter(log_dir) if (use_tensorboard and _TBWriter) else None
        self._t0 = time.time()

    def add_scalar(self, tag: str, value, step: int) -> None:
        v = float(np.asarray(value))
        self._jsonl.write(json.dumps({"t": round(time.time() - self._t0, 3), "step": step, tag: v}) + "\n")
        if self._tb:
            self._tb.add_scalar(tag, v, step)

    def add_scalars(self, metrics: dict, step: int, prefix: str = "") -> None:
        rec = {"t": round(time.time() - self._t0, 3), "step": step}
        for k, v in metrics.items():
            rec[prefix + k] = float(np.asarray(v))
            if self._tb:
                self._tb.add_scalar(prefix + k, rec[prefix + k], step)
        self._jsonl.write(json.dumps(rec) + "\n")

    def add_image(self, tag: str, image_hwc: np.ndarray, step: int) -> None:
        if self._tb:
            img = np.asarray(image_hwc)
            if img.ndim == 2:
                img = img[..., None]
            self._tb.add_image(tag, img.transpose(2, 0, 1), step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb:
            self._tb.close()


# Prostate TB mask colorization (reference utils/utils.py:297-339 uses a
# pascal-style colormap; we keep a small fixed palette).
_PALETTE = np.array(
    [[0, 0, 0], [128, 0, 0], [0, 128, 0], [128, 128, 0], [0, 0, 128]], np.float32
) / 255.0


def decode_seg_map(label_mask: np.ndarray, num_classes: int = 5) -> np.ndarray:
    """(H, W) int -> (H, W, 3) float RGB."""
    label_mask = np.asarray(label_mask).astype(int) % num_classes
    return _PALETTE[label_mask]
