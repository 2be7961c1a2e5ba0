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

GREEN = np.array([0, 255, 0], np.float32)
BLUE = np.array([0, 0, 255], np.float32)
RED = np.array([255, 0, 0], np.float32)  # ground truth contour

# the reference's 7-point neighborhood stamp around every contour point
# (utils.py:166-173 — +-1 offsets giving the ~3 px line)
_STAMP_OFFSETS = ((0, 0), (1, 0), (1, 1), (0, 1), (-1, 0), (-1, -1), (0, -1))


def mask_contour(mask: np.ndarray) -> np.ndarray:
    """Binary 1-px boundary: mask minus its erosion."""
    m = np.asarray(mask).astype(bool)
    er = ndimage.binary_erosion(m, border_value=0)
    return m & ~er


def _contour_points(mask: np.ndarray) -> np.ndarray:
    """The level-0.5 crossing points skimage `measure.find_contours` emits on
    a binary map, as (N, 2) float (row, col) — every point of every contour
    lies at the midpoint of an edge between a 0-pixel and a 1-pixel, so the
    set is exactly the adjacent-differing pairs (no marching-squares walk
    needed to reproduce the reference's stamped PIXEL set; path order only
    matters for line drawing, which the reference doesn't do)."""
    m = np.asarray(mask) > 0.5
    rh, ch = np.nonzero(m[:, :-1] != m[:, 1:])  # (r, c+0.5)
    rv, cv = np.nonzero(m[:-1, :] != m[1:, :])  # (r+0.5, c)
    return np.concatenate(
        [
            np.stack([rh.astype(np.float64), ch + 0.5], 1),
            np.stack([rv + 0.5, cv.astype(np.float64)], 1),
        ]
    )


def _stamp_contours(out: np.ndarray, mask: np.ndarray, color) -> None:
    """Stamp a binary map's contours onto `out` exactly like the reference's
    `patch_image[(contour[:, 0] + d0).astype(int), (contour[:, 1] + d1)
    .astype(int)] = color` loops (utils.py:164-211): truncation toward zero
    on the half-integer coordinate, numpy negative-index wraparound on the
    integer one.  Points the reference would IndexError on (mask touching
    the bottom/right edge — unreachable there because pred borders are
    zeroed and real GTs never touch the frame) are dropped instead."""
    pts = _contour_points(mask)
    if not len(pts):
        return
    h, w = out.shape[:2]
    for dr, dc in _STAMP_OFFSETS:
        r = (pts[:, 0] + dr).astype(int)
        c = (pts[:, 1] + dc).astype(int)
        keep = (r < h) & (c < w) & (r >= -h) & (c >= -w)
        out[r[keep], c[keep]] = color


def _zero_border(m: np.ndarray) -> np.ndarray:
    """Copy with the outermost frame zeroed (utils.py:150-159 — the
    reference mutates the caller's prob_map; we keep it pure)."""
    m = np.array(m, copy=True)
    m[0, :] = 0
    m[-1, :] = 0
    m[:, 0] = 0
    m[:, -1] = 0
    return m


def overlay_contours(
    img: np.ndarray,
    pred: Optional[np.ndarray] = None,
    gt: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Reference `save_per_img`/`save_per_img_prostate` overlay semantics
    (utils.py:148-260):

      * pred channel 1 stamped GREEN first, channel 0 BLUE second (fundus —
        the reference draws `prob_map[1]` green then `prob_map[0]` blue);
        a single-channel pred is GREEN (prostate).
      * pred maps get their border frame zeroed first so edge blobs close.
      * EVERY gt channel runs through get_largest_fillhole, then RED, last.
      * ~3 px lines via the 7-point stamp around each find_contours point.

    pred/gt may be (H, W) or (C, H, W).
    """
    from ramdsir_tpu.ops.postprocess import get_largest_fillhole

    out = np.asarray(img, np.float32).copy()
    if out.ndim == 2:
        out = np.repeat(out[..., None], 3, axis=-1)
    out = np.clip(out, 0, 255)

    if pred is not None:
        p = np.asarray(pred)
        if p.ndim == 2:
            p = p[None]
        colors = [GREEN] if len(p) == 1 else [BLUE] + [GREEN] * (len(p) - 1)
        for ch, color in zip(p[::-1], colors[::-1]):  # channel 1 first
            _stamp_contours(out, _zero_border(ch), color)
    if gt is not None:
        g = np.asarray(gt)
        if g.ndim == 2:
            g = g[None]
        for ch in g:
            _stamp_contours(out, get_largest_fillhole(ch).astype(np.uint8), RED)
    return out.astype(np.uint8)


def save_per_img(
    img: np.ndarray,
    output_dir: str,
    name: str,
    pred: Optional[np.ndarray] = None,
    gt: Optional[np.ndarray] = None,
    ext: str = "png",
) -> str:
    """Overlay writer (reference save_per_img / save_per_img_prostate —
    which always writes `.png` regardless of its `ext` argument,
    utils.py:148-149/216)."""
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
