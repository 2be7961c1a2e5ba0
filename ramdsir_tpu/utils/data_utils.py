"""Misc data-side helpers — counterpart of the reference dataset/utils.py.

Used symbols (untransform / untransform_prostate) live in utils.viz;
the rest of that file (colormaps, lr_poly, iou/dice scorers, json_load —
dataset/utils.py:25-306, unused by the reference entry points) is covered
here for API completeness.
"""
from __future__ import annotations

import json
from typing import Dict, List

import numpy as np

from ramdsir_tpu.utils.viz import untransform, untransform_prostate  # noqa: F401


def lr_poly(base_lr: float, iter_: int, max_iter: int, power: float = 0.9) -> float:
    """Poly LR value (the jitted step computes this on device)."""
    return base_lr * (1.0 - iter_ / max_iter) ** power


def cross_entropy2d(logits: np.ndarray, target: np.ndarray) -> float:
    """Host-side NHWC softmax cross entropy (dataset/utils.py analog)."""
    logits = np.asarray(logits, np.float64)
    z = logits - logits.max(-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    picked = np.take_along_axis(logp, np.asarray(target)[..., None].astype(int), axis=-1)
    return float(-picked.mean())


def get_iou(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> List[float]:
    """Per-class IoU over integer masks."""
    ious = []
    for c in range(num_classes):
        p, g = pred == c, gt == c
        union = float(np.logical_or(p, g).sum())
        ious.append(float(np.logical_and(p, g).sum()) / union if union else float("nan"))
    return ious


def get_dice(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> List[float]:
    """Per-class Dice over integer masks."""
    out = []
    for c in range(num_classes):
        p, g = pred == c, gt == c
        denom = float(p.sum() + g.sum())
        out.append(2.0 * float(np.logical_and(p, g).sum()) / denom if denom else float("nan"))
    return out


def get_mc_dice(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> float:
    """Mean foreground Dice."""
    vals = get_dice(pred, gt, num_classes)[1:]
    vals = [v for v in vals if not np.isnan(v)]
    return float(np.mean(vals)) if vals else 0.0


def json_load(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)


# Pascal-style colormap used by the reference's TB colorizers
def pascal_colormap(n: int = 256) -> np.ndarray:
    """Standard PASCAL VOC label colormap, (n, 3) uint8."""
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = [r, g, b]
    return cmap
