"""Synthetic dataset trees for smoke tests and benchmarks.

Generates on-disk data in the exact layouts the real loaders expect
(fundus PNG ROIs + .list manifests; prostate .npy slices; prostate .nii.gz
volumes), so end-to-end training/eval runs without the (non-redistributable)
DoFE / SAML downloads.
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image

from ramdsir_tpu.config import FUNDUS_DOMAINS, PROSTATE_DOMAINS, PROSTATE_VOLUME_DOMAINS
from ramdsir_tpu.data.nifti import write_nifti


def _fundus_pair(rng: np.random.Generator, size: int):
    """A blobby RGB 'fundus' + gray mask (255 bg / 128 disc / 0 cup)."""
    img = rng.integers(30, 220, (size, size, 3), dtype=np.uint8)
    yy, xx = np.mgrid[:size, :size]
    cy, cx = rng.integers(size // 3, 2 * size // 3, 2)
    r_disc = size // rng.integers(4, 7)
    r_cup = max(2, int(r_disc * rng.uniform(0.3, 0.7)))
    d2 = (yy - cy) ** 2 + (xx - cx) ** 2
    mask = np.full((size, size), 255, np.uint8)
    mask[d2 < r_disc**2] = 128
    mask[d2 < r_cup**2] = 0
    img[d2 < r_disc**2] = (img[d2 < r_disc**2] * 0.5 + 120).astype(np.uint8)
    return img, mask


def make_fundus_tree(
    root: str,
    per_domain_train: int = 6,
    per_domain_test: int = 3,
    size: int = 96,
    seed: int = 0,
    domains: Sequence[str] = tuple(FUNDUS_DOMAINS),
) -> str:
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "fundus")
    for dom in domains:
        for split, n in [("train", per_domain_train), ("test", per_domain_test)]:
            img_dir = os.path.join(base, dom, split, "image")
            mask_dir = os.path.join(base, dom, split, "mask")
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(mask_dir, exist_ok=True)
            lines_local, lines_global = [], []
            for i in range(n):
                img, mask = _fundus_pair(rng, size)
                rel_img = f"{split}/image/{i:03d}.png"
                rel_mask = f"{split}/mask/{i:03d}.png"
                Image.fromarray(img).save(os.path.join(base, dom, rel_img))
                Image.fromarray(mask).save(os.path.join(base, dom, rel_mask))
                lines_local.append(f"{rel_img} {rel_mask}")
                lines_global.append(f"{dom}/{rel_img} {dom}/{rel_mask}")
            with open(os.path.join(base, dom, f"{split}.list"), "w") as f:
                f.write("\n".join(lines_local) + "\n")
            with open(os.path.join(base, f"{dom}_{split}.list"), "w") as f:
                f.write("\n".join(lines_global) + "\n")
    return base


def make_prostate_tree(
    root: str,
    per_domain: int = 6,
    size: int = 64,
    seed: int = 0,
    domains: Sequence[str] = tuple(PROSTATE_DOMAINS),
) -> str:
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "prostate")
    for dom in domains:
        img_dir = os.path.join(base, dom, "image")
        mask_dir = os.path.join(base, dom, "mask")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(mask_dir, exist_ok=True)
        for i in range(per_domain):
            img = rng.uniform(-1, 0.2, (size, size, 3)).astype(np.float32)
            yy, xx = np.mgrid[:size, :size]
            cy, cx = rng.integers(size // 3, 2 * size // 3, 2)
            r = size // rng.integers(4, 7)
            mask = (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.int64)
            # learnable signal: the foreground region is brighter
            img[mask > 0] += 0.8
            img = np.clip(img, -1, 1)
            np.save(os.path.join(img_dir, f"{dom}_{i:03d}.npy"), img)
            np.save(os.path.join(mask_dir, f"{dom}_{i:03d}.npy"), mask)
    return base


def make_prostate_volumes(
    root: str,
    per_domain: int = 1,
    depth: int = 12,
    size: int = 64,
    seed: int = 0,
    domains: Sequence[str] = tuple(PROSTATE_VOLUME_DOMAINS),
    base_name: str = "prostate",
) -> str:
    rng = np.random.default_rng(seed)
    base = os.path.join(root, base_name)
    for dom in domains:
        os.makedirs(os.path.join(base, dom), exist_ok=True)
        for i in range(per_domain):
            vol = rng.uniform(0, 400, (depth, size, size)).astype(np.float32)
            yy, xx = np.mgrid[:size, :size]
            mask = np.zeros((depth, size, size), np.uint8)
            for z in range(depth // 4, 3 * depth // 4):
                r = size // 5
                cy = cx = size // 2
                mask[z][((yy - cy) ** 2 + (xx - cx) ** 2) < r * r] = 1
                vol[z][mask[z] > 0] += 200
            write_nifti(os.path.join(base, dom, f"Case{i:02d}.nii.gz"), vol)
            write_nifti(os.path.join(base, dom, f"Case{i:02d}_segmentation.nii.gz"), mask)
    return base
