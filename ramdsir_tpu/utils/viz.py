"""Result visualization: contour overlays and heatmaps.

Covers the reference's eval viz (utils/utils.py:138-260 `save_per_img`,
`save_per_img_prostate`; test_utils.py:5-84 entropy/probability heatmap
writers) without matplotlib in the hot path — contours come from a numpy
boundary extraction, colormaps from cv2 when available.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image
from scipy import ndimage

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

GREEN = np.array([0, 255, 0], np.float32)  # ground truth contour
BLUE = np.array([0, 0, 255], np.float32)  # prediction contour


def mask_contour(mask: np.ndarray) -> np.ndarray:
    """Binary 1-px boundary: mask minus its erosion."""
    m = np.asarray(mask).astype(bool)
    er = ndimage.binary_erosion(m, border_value=0)
    return m & ~er


def overlay_contours(
    img: np.ndarray,
    pred: Optional[np.ndarray] = None,
    gt: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Draw pred (blue) and gt (green) contours onto an (H, W, 3) image.

    pred/gt may be (H, W) binary or (C, H, W) multi-channel; every channel's
    contour is drawn (cup + disc for fundus).
    """
    out = np.asarray(img, np.float32).copy()
    if out.ndim == 2:
        out = np.repeat(out[..., None], 3, axis=-1)

    def draw(masks, color):
        if masks is None:
            return
        m = np.asarray(masks)
        if m.ndim == 2:
            m = m[None]
        for ch in m:
            out[mask_contour(ch)] = color

    draw(gt, GREEN)
    draw(pred, BLUE)
    return np.clip(out, 0, 255).astype(np.uint8)


def save_per_img(
    img: np.ndarray,
    output_dir: str,
    name: str,
    pred: Optional[np.ndarray] = None,
    gt: Optional[np.ndarray] = None,
    ext: str = "bmp",
) -> str:
    """Overlay writer (reference save_per_img / save_per_img_prostate)."""
    os.makedirs(output_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(str(name).split(" ")[0]))[0]
    path = os.path.join(output_dir, f"{base}.{ext}")
    Image.fromarray(overlay_contours(img, pred, gt)).save(path)
    return path


def construct_color_img(prob_per_slice: np.ndarray) -> np.ndarray:
    """JET-colormapped heatmap of a (H, W) probability/entropy map
    (test_utils.py:5-13)."""
    p = np.asarray(prob_per_slice, np.float32)
    lo, hi = float(p.min()), float(p.max())
    norm = (p - lo) / max(hi - lo, 1e-12)
    u8 = (norm * 255).astype(np.uint8)
    if cv2 is not None:
        return cv2.applyColorMap(u8, cv2.COLORMAP_JET)
    # fallback: simple blue->red ramp
    out = np.zeros((*u8.shape, 3), np.uint8)
    out[..., 0] = u8
    out[..., 2] = 255 - u8
    return out


def entropy_map(probs: np.ndarray, axis: int = -1, eps: float = 1e-6) -> np.ndarray:
    """Pixelwise prediction entropy (test_utils draw_ent semantics)."""
    p = np.asarray(probs, np.float64)
    return -(p * np.log(p + eps)).sum(axis=axis)


def draw_ent(probs: np.ndarray, output_dir: str, name: str) -> str:
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{os.path.splitext(name)[0]}_ent.png")
    Image.fromarray(construct_color_img(entropy_map(probs))).save(path)
    return path


def draw_mask(probs: np.ndarray, output_dir: str, name: str) -> str:
    """Probability heatmap of the foreground channel (draw_mask)."""
    os.makedirs(output_dir, exist_ok=True)
    p = np.asarray(probs)
    fg = p[..., -1] if p.ndim == 3 else p
    path = os.path.join(output_dir, f"{os.path.splitext(name)[0]}_mask.png")
    Image.fromarray(construct_color_img(fg)).save(path)
    return path


def draw_boundary(mask: np.ndarray, output_dir: str, name: str) -> str:
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{os.path.splitext(name)[0]}_boundary.png")
    Image.fromarray((mask_contour(mask) * 255).astype(np.uint8)).save(path)
    return path


def untransform(img: np.ndarray) -> np.ndarray:
    """[-1,1] -> [0,255] (reference dataset/utils.py:13-16)."""
    return (np.asarray(img, np.float32) + 1.0) * 127.5


def untransform_prostate(img: np.ndarray) -> np.ndarray:
    """min-max -> [0,255] (reference dataset/utils.py:18-22)."""
    img = np.asarray(img, np.float32)
    lo, hi = img.min(), img.max()
    return (img - lo) / max(hi - lo, 1e-12) * 255.0
