"""Host-side sample transforms (PIL + numpy), NHWC outputs.

Functional parity with the reference transform library
(/root/reference/code/dataset/transform.py, np_transform.py) over dict
samples {'img', 'mask', optional 'img_freq'}. Differences by design:
  * Outputs are channel-LAST float32 numpy (TPU-native NHWC); normalization
    to [-1,1] and the RAM mixup happen ON DEVICE, so `Normalize` here only
    decodes the fundus mask and keeps images in [0,255].
  * Randomness flows through an explicit numpy Generator instead of the
    global `random` module (distribution-equivalent, not stream-equivalent).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps
from scipy import ndimage

Sample = Dict[str, object]


def to_multilabel(class_mask: np.ndarray, classes: int = 2) -> np.ndarray:
    """class map {0:bg, 1:disc, 2:cup} -> (H, W, 2) [cup, disc] channels
    (transform.py:10-14): disc=[0,1], cup=[1,1]."""
    mask = np.zeros((class_mask.shape[0], class_mask.shape[1], classes), np.float32)
    mask[class_mask == 1] = [0, 1]
    mask[class_mask == 2] = [1, 1]
    return mask


def decode_fundus_mask(gray: np.ndarray) -> np.ndarray:
    """Gray-value mask -> class map (fundus.py:99-107): >200 -> bg(0),
    51..200 -> disc(1), <=50 -> cup(2)."""
    gray = np.asarray(gray).astype(np.uint8)
    out = np.full(gray.shape, 2, np.uint8)
    out[gray > 200] = 0
    out[(gray > 50) & (gray < 201)] = 1
    return out


def fundus_multilabel(gray: np.ndarray) -> np.ndarray:
    """(H, W) gray mask -> (H, W, 2) float [cup, disc] (Normalize tail)."""
    return to_multilabel(decode_fundus_mask(gray))


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, sample: Sample) -> Sample:
        for t in self.transforms:
            sample = t(sample)
        return sample


def _apply_imgs(sample: Sample, fn) -> Sample:
    out = dict(sample)
    out["img"] = fn(sample["img"])
    if "img_freq" in sample:
        out["img_freq"] = fn(sample["img_freq"])
    return out


class Resize:
    """Bilinear image / nearest mask resize (transform.py:163-177)."""

    def __init__(self, target_size: Tuple[int, int]):
        self.target_size = target_size

    def __call__(self, sample: Sample) -> Sample:
        tw, th = self.target_size[0], self.target_size[1]
        out = _apply_imgs(sample, lambda im: im.resize((tw, th), Image.BILINEAR))
        out["mask"] = sample["mask"].resize((tw, th), Image.NEAREST)
        return out


class RandomCrop:
    """Pad-to-size then random crop; mask padded with 255 (transform.py:16-44)."""

    def __init__(self, output_size: Tuple[int, int], rng: Optional[np.random.Generator] = None):
        self.output_size = output_size
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Sample) -> Sample:
        img, mask = sample["img"], sample["mask"]
        w, h = img.size
        padw = max(self.output_size[0] - w, 0)
        padh = max(self.output_size[1] - h, 0)
        if padw or padh:
            img = ImageOps.expand(img, border=(0, 0, padw, padh), fill=0)
            mask = ImageOps.expand(mask, border=(0, 0, padw, padh), fill=255)
        w, h = img.size
        x = int(self.rng.integers(0, w - self.output_size[0] + 1))
        y = int(self.rng.integers(0, h - self.output_size[1] + 1))
        box = (x, y, x + self.output_size[0], y + self.output_size[1])
        out = {"img": img.crop(box), "mask": mask.crop(box)}
        if "img_freq" in sample:
            f = sample["img_freq"]
            if padw or padh:
                f = ImageOps.expand(f, border=(0, 0, padw, padh), fill=0)
            out["img_freq"] = f.crop(box)
        return out


class CenterCrop:
    """Pad-to-size then center crop (transform.py:47-75)."""

    def __init__(self, output_size: Tuple[int, int]):
        self.output_size = output_size

    def __call__(self, sample: Sample) -> Sample:
        img, mask = sample["img"], sample["mask"]
        w, h = img.size
        padw = max(self.output_size[0] - w, 0)
        padh = max(self.output_size[1] - h, 0)
        if padw or padh:
            img = ImageOps.expand(img, border=(0, 0, padw, padh), fill=0)
            mask = ImageOps.expand(mask, border=(0, 0, padw, padh), fill=255)
        w, h = img.size
        x = (w - self.output_size[0]) // 2
        y = (h - self.output_size[1]) // 2
        box = (x, y, x + self.output_size[0], y + self.output_size[1])
        return {"img": img.crop(box), "mask": mask.crop(box)}


class RandomScaleCrop:
    """p=0.5 upscale by U(1,1.5) then RandomCrop (transform.py:180-204)."""

    def __init__(self, size: Tuple[int, int], rng: Optional[np.random.Generator] = None):
        self.size = size
        self.rng = rng or np.random.default_rng()
        self.crop = RandomCrop(size, self.rng)

    def __call__(self, sample: Sample) -> Sample:
        if self.rng.random() > 0.5:
            img = sample["img"]
            w = int(self.rng.uniform(1.0, 1.5) * img.size[0])
            h = int(self.rng.uniform(1.0, 1.5) * img.size[1])
            sample = _apply_imgs(sample, lambda im: im.resize((w, h), Image.BILINEAR))
            sample["mask"] = sample["mask"].resize((w, h), Image.NEAREST)
        return self.crop(sample)


class Hflip:
    """p=0.5 horizontal flip (transform.py:78-99)."""

    def __init__(self, rng: Optional[np.random.Generator] = None):
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Sample) -> Sample:
        if self.rng.random() < 0.5:
            out = _apply_imgs(sample, lambda im: im.transpose(Image.FLIP_LEFT_RIGHT))
            out["mask"] = sample["mask"].transpose(Image.FLIP_LEFT_RIGHT)
            return out
        return sample


class RandomResize:
    """Aspect-preserving random rescale (transform.py:102-132, exact).

    The SHORT side (the reference's `origin_size` picks min(w, h) despite
    the 'long' naming) — or `base_long_size` when given — defines the
    target: an integer drawn uniformly from
    [int(origin*scale_range[0]), int(origin*scale_range[1])] (inclusive);
    the other side scales by the same ratio, truncated to int.
    """

    def __init__(
        self,
        base_long_size: Optional[int] = None,
        scale_range=(0.75, 1.20),
        rng: Optional[np.random.Generator] = None,
    ):
        self.base_long_size = base_long_size
        self.scale_range = scale_range
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Sample) -> Sample:
        img = sample["img"]
        w, h = img.size
        origin = self.base_long_size if self.base_long_size is not None else min(w, h)
        lo, hi = int(origin * self.scale_range[0]), int(origin * self.scale_range[1])
        target = int(self.rng.integers(lo, hi + 1))  # randint: inclusive
        if w < h:
            oh = target
            ow = int(w * (oh / h))
        else:
            ow = target
            oh = int(h * (ow / w))
        out = _apply_imgs(sample, lambda im: im.resize((ow, oh), Image.BILINEAR))
        out["mask"] = sample["mask"].resize((ow, oh), Image.NEAREST)
        return out


class ResizeRatio:
    """Resize the short side to `size`, keep aspect (transform.py:135-160)."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, sample: Sample) -> Sample:
        img = sample["img"]
        w, h = img.size
        if w < h:
            nw, nh = self.size, int(h * self.size / w)
        else:
            nw, nh = int(w * self.size / h), self.size
        out = _apply_imgs(sample, lambda im: im.resize((nw, nh), Image.BILINEAR))
        out["mask"] = sample["mask"].resize((nw, nh), Image.NEAREST)
        return out


class Rotate:
    """Rotate by an integer degree in [-20, 20] (transform.py:207-220, exact).

    The mask rotates with fillcolor=255: rotated-in corners decode to the
    fundus background/ignore value (gray 255 -> class 0), not to gray 0,
    which would decode to cup (class 2) and corrupt labels.
    """

    def __init__(self, rng: Optional[np.random.Generator] = None):
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Sample) -> Sample:
        angle = int(self.rng.integers(-20, 21))  # randint(-20, 20) inclusive
        out = _apply_imgs(sample, lambda im: im.rotate(angle, Image.BILINEAR))
        out["mask"] = sample["mask"].rotate(angle, Image.NEAREST, fillcolor=255)
        return out


class Blur:
    """p=0.5 Gaussian blur radius U(0.1, 2.0) (transform.py:223-232)."""

    def __init__(self, rng: Optional[np.random.Generator] = None):
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Sample) -> Sample:
        if self.rng.random() < 0.5:
            radius = float(self.rng.uniform(0.1, 2.0))
            return _apply_imgs(sample, lambda im: im.filter(ImageFilter.GaussianBlur(radius)))
        return sample


class Sharpness:
    """p=0.2 sharpness enhance with factor U(0.05, 0.95)
    (transform.py:280-289, parameter-exact)."""

    def __init__(self, p: float = 0.2, rng: Optional[np.random.Generator] = None):
        self.p = p
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Sample) -> Sample:
        if self.rng.random() < self.p:
            v = float(self.rng.uniform(0.05, 0.95))
            return _apply_imgs(sample, lambda im: ImageEnhance.Sharpness(im).enhance(v))
        return sample


class Solarize:
    """p=0.2 solarize with threshold randint(0, 256) INCLUSIVE
    (transform.py:292-301, parameter-exact — threshold 256 is reachable and
    is a no-op for uint8 pixels)."""

    def __init__(self, p: float = 0.2, rng: Optional[np.random.Generator] = None):
        self.p = p
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Sample) -> Sample:
        if self.rng.random() < self.p:
            t = int(self.rng.integers(0, 257))  # randint(0, 256) inclusive
            return _apply_imgs(sample, lambda im: ImageOps.solarize(im, t))
        return sample


class CutOut:
    """p=0.5 random rectangular erase; mask set to 255 (ignored) inside the
    hole (transform.py:235-277, parameter-exact).

    Matches the reference's quirks: the (size, ratio, x, y) draw uses
    REJECTION sampling (redraw everything until the box fits — boxes near
    the far border are therefore less likely than direct valid-offset
    sampling would make them), and the hole is filled with per-pixel
    U(value_min, value_max) noise when pixel_level (default), else one
    scalar draw."""

    def __init__(
        self,
        p: float = 0.5,
        size_min: float = 0.02,
        size_max: float = 0.4,
        ratio_1: float = 0.3,
        ratio_2: float = 1 / 0.3,
        value_min: float = 0,
        value_max: float = 255,
        pixel_level: bool = True,
        rng: Optional[np.random.Generator] = None,
    ):
        self.p = p
        self.size_min, self.size_max = size_min, size_max
        self.ratio_1, self.ratio_2 = ratio_1, ratio_2
        self.value_min, self.value_max = value_min, value_max
        self.pixel_level = pixel_level
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Sample) -> Sample:
        if self.rng.random() >= self.p:
            return sample
        img = np.array(sample["img"])
        mask = np.array(sample["mask"])
        h, w = img.shape[:2]
        c = img.shape[2] if img.ndim == 3 else 1
        while True:  # rejection loop (transform.py:255-263)
            size = self.rng.uniform(self.size_min, self.size_max) * h * w
            ratio = self.rng.uniform(self.ratio_1, self.ratio_2)
            erase_w = int(np.sqrt(size / ratio))
            erase_h = int(np.sqrt(size * ratio))
            x = int(self.rng.integers(0, w))
            y = int(self.rng.integers(0, h))
            if x + erase_w <= w and y + erase_h <= h:
                break
        if self.pixel_level:
            value = self.rng.uniform(
                self.value_min, self.value_max, (erase_h, erase_w, c)
            )
            if img.ndim == 2:
                value = value[..., 0]
        else:
            value = self.rng.uniform(self.value_min, self.value_max)
        img[y : y + erase_h, x : x + erase_w] = value
        mask[y : y + erase_h, x : x + erase_w] = 255
        out = dict(sample)
        out["img"] = Image.fromarray(img.astype(np.uint8))
        out["mask"] = Image.fromarray(mask.astype(np.uint8))
        return out


class GetPair:
    """In/out-painting pretext pair (transform.py:303-317, exact parameters):
    with probability `inpaint_rate` (default 0.8) the corrupted copy is
    in-painted, otherwise out-painted; returned under 'img_aug' alongside
    the untouched 'img'/'mask'."""

    def __init__(self, inpaint_rate: float = 0.8, rng: Optional[np.random.Generator] = None):
        self.inpaint_rate = inpaint_rate
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Sample) -> Sample:
        img = np.array(sample["img"])
        if self.rng.random() < self.inpaint_rate:
            aug = image_in_painting(img, self.rng)
        else:
            aug = image_out_painting(img, self.rng)
        out = dict(sample)
        out["img_aug"] = Image.fromarray(aug.astype(np.uint8))
        return out


def _in_painting(img: np.ndarray, rng: np.random.Generator, fill) -> np.ndarray:
    """Shared in-painting core: up to 5 interior blocks, each iteration
    continues with p=0.95; block side ~ randint(S//6, S//3) inclusive,
    offset ~ randint(3, S-side-3) inclusive.  `fill(bx, by)` supplies the
    block contents.  Takes/returns HWC uint8."""
    out = np.array(img, copy=True)
    rows, cols = out.shape[:2]
    cnt = 5
    while cnt > 0 and rng.random() < 0.95:
        bx = int(rng.integers(rows // 6, rows // 3 + 1))
        by = int(rng.integers(cols // 6, cols // 3 + 1))
        x = int(rng.integers(3, rows - bx - 3 + 1))
        y = int(rng.integers(3, cols - by - 3 + 1))
        val = fill(bx, by)
        if isinstance(val, np.ndarray) and out.ndim == 3:
            val = val[..., None]
        out[x : x + bx, y : y + by] = val
        cnt -= 1
    return out


def image_in_painting(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Uniform-noise blocks (transform.py:439-454, exact): the SAME (h, w)
    noise plane (x255) fills every channel."""
    dtype = np.asarray(img).dtype
    return _in_painting(
        img, rng, lambda bx, by: (rng.random((bx, by)) * 255).astype(dtype)
    )


def image_in_painting_constant(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Blocks filled with constant 255 (transform.py:456-470, exact).
    Dead code in the reference (GetPair never selects it); kept for API
    completeness."""
    return _in_painting(img, rng, lambda bx, by: 255)


def image_in_painting_rand_constant(
    img: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Blocks filled with one 255*U(0,1) constant drawn PER BLOCK
    (transform.py:472-488, exact).  Dead code in the reference."""
    dtype = np.asarray(img).dtype
    return _in_painting(
        img,
        rng,
        lambda bx, by: (np.ones((bx, by)) * 255 * rng.random()).astype(dtype),
    )


def _out_painting(img: np.ndarray, rng: np.random.Generator, canvas) -> np.ndarray:
    """Shared out-painting core: replace everything with `canvas(shape)`,
    then restore 1 + up to 4 original blocks; block side =
    S - randint(3S//7, 4S//7) inclusive, offset ~ randint(3, S-side-3);
    each extra restore continues with p=0.95.  Takes/returns HWC uint8."""
    src = np.array(img, copy=True)
    rows, cols = src.shape[:2]
    out = canvas(src.shape).astype(src.dtype)

    def restore():
        bx = rows - int(rng.integers(3 * rows // 7, 4 * rows // 7 + 1))
        by = cols - int(rng.integers(3 * cols // 7, 4 * cols // 7 + 1))
        x = int(rng.integers(3, rows - bx - 3 + 1))
        y = int(rng.integers(3, cols - by - 3 + 1))
        out[x : x + bx, y : y + by] = src[x : x + bx, y : y + by]

    restore()
    cnt = 4
    while cnt > 0 and rng.random() < 0.95:
        restore()
        cnt -= 1
    return out


def image_out_painting(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Per-channel uniform-noise canvas (transform.py:490-520, exact)."""
    return _out_painting(img, rng, lambda shape: rng.random(shape) * 255)


def image_out_painting_constant(
    img: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """All-255 canvas (transform.py:522-550, exact).  Dead code in the
    reference; kept for API completeness."""
    return _out_painting(img, rng, lambda shape: np.ones(shape) * 255)


def image_out_painting_rand_constant(
    img: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """One 255*U(0,1) constant canvas (transform.py:552-580, exact).  Dead
    code in the reference."""
    return _out_painting(img, rng, lambda shape: np.ones(shape) * 255 * rng.random())


def _boundary_band(plane: np.ndarray, width: int) -> np.ndarray:
    """dilate^width + erode^width, zeroing the ==2 interior — the reference's
    symmetric boundary band (transform.py:382-390)."""
    dila = ndimage.binary_dilation(plane, iterations=width).astype(plane.dtype)
    eros = ndimage.binary_erosion(plane, iterations=width).astype(plane.dtype)
    band = dila + eros
    band[band == 2] = 0
    return band


class GetBoundary:
    """(H, W, 2) [cup, disc] multilabel -> uint8 union boundary band
    (transform.py:377-394, parameter-exact: width=5)."""

    def __init__(self, width: int = 5):
        self.width = width

    def __call__(self, mask: np.ndarray) -> np.ndarray:
        cup = _boundary_band(mask[:, :, 0], self.width)
        disc = _boundary_band(mask[:, :, 1], self.width)
        return ((cup + disc) > 0).astype(np.uint8)


class GetBoundary_Single:
    """Single-plane variant (transform.py:396-406)."""

    def __init__(self, width: int = 5):
        self.width = width

    def __call__(self, mask: np.ndarray) -> np.ndarray:
        return (_boundary_band(mask, self.width) > 0).astype(np.uint8)


class GetContourBg:
    """(H, W, 2) [cup, disc] multilabel ->
    (cup_contour, cup_bg, disc_contour, disc_bg) 4-tuple
    (transform.py:408-426, parameter-exact: bg_width=5, ct_width=1).

    contour = mask - erode^ct_width(mask); bg = dilate^bg_width(mask) - mask,
    computed in the mask's own dtype like the reference."""

    def __init__(self, bg_width: int = 5, ct_width: int = 1):
        self.bg_width = bg_width
        self.ct_width = ct_width

    def __call__(self, mask: np.ndarray):
        outs = []
        for ch in (0, 1):  # cup, disc
            plane = mask[:, :, ch]
            dila = ndimage.binary_dilation(plane, iterations=self.bg_width).astype(plane.dtype)
            eros = ndimage.binary_erosion(plane, iterations=self.ct_width).astype(plane.dtype)
            outs.append(plane - eros)  # contour
            outs.append(dila - plane)  # bg
        return outs[0], outs[1], outs[2], outs[3]


class GetContourBg_Single:
    """Single-plane (contour, bg) variant (transform.py:428-436)."""

    def __init__(self, bg_width: int = 5, ct_width: int = 1):
        self.bg_width = bg_width
        self.ct_width = ct_width

    def __call__(self, mask: np.ndarray):
        dila = ndimage.binary_dilation(mask, iterations=self.bg_width).astype(mask.dtype)
        eros = ndimage.binary_erosion(mask, iterations=self.ct_width).astype(mask.dtype)
        return mask - eros, dila - mask


class Normalize:
    """Finalize a fundus sample into numpy NHWC arrays (transform.py:319-375).

    Unlike the reference (which maps to [-1,1] on CPU), images stay [0,255]
    float32 here — the [-1,1] normalization is fused into the device-side
    train/eval step.  The mask is decoded to the (H, W, 2) [cup, disc]
    multilabel.
    """

    def __call__(self, sample: Sample) -> Sample:
        out: Sample = {"img": np.array(sample["img"]).astype(np.float32)}
        if "img_freq" in sample:
            out["img_freq"] = np.array(sample["img_freq"]).astype(np.float32)
        if sample.get("mask") is not None:
            out["mask"] = fundus_multilabel(np.array(sample["mask"]))
        return out


def np_random_scale_crop(
    img: np.ndarray, mask: np.ndarray, size: int, rng: np.random.Generator
):
    """Numpy/cv2 fast path of RandomScaleCrop (same distribution): p=0.5
    upscale by U(1,1.5) (bilinear img / nearest mask) then random crop.
    cv2 releases the GIL, so loader threads don't stall the jit dispatch."""
    try:
        import cv2

        resize = lambda a, w, h, interp: cv2.resize(a, (w, h), interpolation=interp)
        LINEAR, NEAREST = cv2.INTER_LINEAR, cv2.INTER_NEAREST
    except Exception:  # PIL fallback
        def resize(a, w, h, interp):
            im = Image.fromarray(a)
            return np.asarray(im.resize((w, h), interp), a.dtype)

        LINEAR, NEAREST = Image.BILINEAR, Image.NEAREST

    if rng.random() > 0.5:
        h0, w0 = img.shape[:2]
        w = int(rng.uniform(1.0, 1.5) * w0)
        h = int(rng.uniform(1.0, 1.5) * h0)
        img = resize(img, w, h, LINEAR)
        mask = resize(mask, w, h, NEAREST)
    h0, w0 = img.shape[:2]
    y = int(rng.integers(0, h0 - size + 1))
    x = int(rng.integers(0, w0 - size + 1))
    return (
        np.ascontiguousarray(img[y : y + size, x : x + size]),
        np.ascontiguousarray(mask[y : y + size, x : x + size]),
    )


class ScaleCropAug:
    """Picklable np_random_scale_crop(size) callable for loader workers
    (lambdas can't cross a process boundary)."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, img, mask, rng):
        return np_random_scale_crop(img, mask, self.size, rng)


class CreateOnehotLabel:
    """Integer mask -> one-hot channels (np_transform.py:142-158)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes

    def __call__(self, sample: Sample) -> Sample:
        mask = np.asarray(sample["mask"]).astype(np.int64)
        onehot = np.stack([(mask == i) for i in range(self.num_classes)], -1).astype(np.float32)
        out = dict(sample)
        out["onehot_label"] = onehot
        return out
