"""Fundus datasets (OD/OC segmentation, 4 domains).

Layout-parity with the reference loaders (/root/reference/code/dataset/
fundus.py:64-242):
  * FundusDataset reads `base_dir/DomainX/{train,test}.list` with lines
    "rel_img_path rel_mask_path" (relative to base_dir/DomainX).
  * FundusMultiDataset reads `base_dir/DomainX_train.list` manifests with
    paths relative to base_dir (the lists shipped in the reference's
    dataset/fundus/).

TPU-native divergence: the RAM FFT runs on device, so train samples carry
the post-geometric-transform image in [0,255] plus a *donor* image (random
other-source-domain image resized to the train size) instead of a
CPU-precomputed `img_freq`.  Mask decoding matches fundus.py:99-110.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from ramdsir_tpu.config import FUNDUS_DOMAINS
from ramdsir_tpu.data.transforms import fundus_multilabel


def _read_list(path: str) -> List[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


class _DecodeCache:
    """Thread-safe decoded-image cache.

    Fundus train sets are tiny (<= 320 images/domain); after the
    deterministic resize they fit comfortably in RAM (~150 MB for all four
    domains at 256^2), so steady-state epochs never touch the PNG decoder —
    the host pipeline cost drops to the random crop/flip ops only.
    """

    def __init__(self, max_items: int = 4096):
        import threading

        self.max_items = max_items
        self._store = {}
        self._lock = threading.Lock()

    # picklable for spawn-based loader workers: ship the config, not the
    # cache contents (each worker re-warms its own store) nor the lock.
    def __getstate__(self):
        return {"max_items": self.max_items}

    def __setstate__(self, state):
        self.__init__(state["max_items"])

    def get(self, key, build):
        with self._lock:
            if key in self._store:
                return self._store[key]
        val = build()
        with self._lock:
            if len(self._store) < self.max_items:
                self._store[key] = val
        return val


def _load_resized(cache: Optional[_DecodeCache], path: str, size: Optional[int], mode: str):
    """Decode (and optionally bilinear/nearest-resize) an image, cached."""

    def build():
        img = Image.open(path).convert(mode)
        if size is not None:
            resample = Image.NEAREST if mode == "L" else Image.BILINEAR
            img = img.resize((size, size), resample)
        return np.asarray(img, np.uint8)

    if cache is None:
        return build()
    return cache.get((path, size, mode), build)


class FundusDataset:
    """Single-domain dataset; test mode also returns the original-size mask
    (fundus.py:96-116) for resize-back evaluation."""

    def __init__(
        self,
        base_dir: str,
        domain_idx: int,
        split: str = "train",
        num: Optional[int] = None,
        transform=None,
    ):
        self.base_dir = base_dir
        self.domain = FUNDUS_DOMAINS[domain_idx]
        self.split = split
        self.transform = transform
        self.id_path = _read_list(os.path.join(base_dir, self.domain, f"{split}.list"))
        if num is not None:
            self.id_path = self.id_path[:num]

    def __len__(self) -> int:
        return len(self.id_path)

    def __getitem__(self, index: int):
        entry = self.id_path[index].split(" ")
        img = Image.open(os.path.join(self.base_dir, self.domain, entry[0])).convert("RGB")
        mask = Image.open(os.path.join(self.base_dir, self.domain, entry[1])).convert("L")
        sample = {"img": img, "mask": mask}
        if self.split == "test":
            orig_mask = fundus_multilabel(np.array(mask)).astype(np.uint8)
            if self.transform:
                sample = self.transform(sample)
            return {
                "img": np.asarray(sample["img"], np.uint8),
                "mask": np.asarray(sample["mask"], np.uint8),
                "mask_orig": orig_mask,
                "id": self.id_path[index],
            }
        if self.transform:
            sample = self.transform(sample)
        return {
            "img": np.asarray(sample["img"], np.uint8),
            "mask": np.asarray(sample["mask"], np.uint8),
        }


class FundusMultiDataset:
    """Multi-domain train dataset with cross-domain donor sampling.

    Each item: img (H, W, 3) float32 [0,255] after geometric transforms,
    donor (S, S, 3) float32 [0,255] from a random other source domain
    (out-of-current-domain when is_out_domain, fundus.py:201-208),
    mask (H, W, 2) float32 multilabel, domain (int).
    """

    def __init__(
        self,
        base_dir: str,
        domain_idx_list: Sequence[int],
        split: str = "train",
        num: Optional[int] = None,
        transform=None,
        is_freq: bool = True,
        is_out_domain: bool = False,
        test_domain_idx: Optional[int] = None,
        donor_size: int = 256,
        rng: Optional[np.random.Generator] = None,
        resize_to: Optional[int] = None,
        cache: bool = True,
        np_transform=None,
    ):
        self.base_dir = base_dir
        self.domain_idx_list = list(domain_idx_list)
        self.split = split
        self.transform = transform
        self.np_transform = np_transform  # (img_u8, mask_u8, rng) -> (img, mask)
        self.resize_to = resize_to
        self._cache = _DecodeCache() if cache else None
        self.is_freq = is_freq
        self.is_out_domain = is_out_domain
        self.test_domain_idx = test_domain_idx
        self.donor_size = donor_size
        self.rng = rng or np.random.default_rng()

        self.id_path: List[str] = []
        self.item_domain: List[str] = []
        for d in self.domain_idx_list:
            ids = _read_list(os.path.join(base_dir, f"{FUNDUS_DOMAINS[d]}_{split}.list"))
            self.id_path += ids
            self.item_domain += [FUNDUS_DOMAINS[d]] * len(ids)
        if num is not None:
            self.id_path = self.id_path[:num]
            self.item_domain = self.item_domain[:num]

        # donor pool: per-source-domain train lists (fundus.py:206-208)
        self.train_domains = [d for d in FUNDUS_DOMAINS if test_domain_idx is None or d != FUNDUS_DOMAINS[test_domain_idx]]
        self._donor_lists = {}

    def __len__(self) -> int:
        return len(self.id_path)

    def _donor_ids(self, domain_name: str) -> List[str]:
        if domain_name not in self._donor_lists:
            self._donor_lists[domain_name] = _read_list(
                os.path.join(self.base_dir, domain_name, "train.list")
            )
        return self._donor_lists[domain_name]

    def _sample_donor(self, cur_domain: str, rng: np.random.Generator) -> np.ndarray:
        pool = [d for d in self.train_domains if not (self.is_out_domain and d == cur_domain)]
        donor_domain = pool[int(rng.integers(0, len(pool)))]
        ids = self._donor_ids(donor_domain)
        donor_id = ids[int(rng.integers(0, len(ids)))].split(" ")[0]
        # uint8 on the wire: 4x less host->device traffic; the jitted step
        # promotes to float on device.
        return _load_resized(
            self._cache,
            os.path.join(self.base_dir, donor_domain, donor_id),
            self.donor_size,
            "RGB",
        )

    def get_item(self, index: int, rng: Optional[np.random.Generator] = None):
        """Like __getitem__, with an explicit per-sample Generator.

        Loader workers pass a counter-derived rng (seeded from
        (seed, epoch, step, domain, row) — see FusedMultiDomainLoader), so
        augmentation randomness is a pure function of the sample's position:
        thread-safe AND reproducible regardless of worker scheduling.
        numpy Generators are not thread-safe; sharing self.rng across
        worker threads could repeat or interleave draws.
        """
        rng = self.rng if rng is None else rng
        entry = self.id_path[index].split(" ")
        cur_domain = entry[0].split("/")[0]
        if self.split == "test":
            # multi-domain test split (fundus.py:167-186): transformed
            # img/mask plus the ORIGINAL-size multilabel mask and the id,
            # exactly like the single-domain test dataset.
            img = Image.open(os.path.join(self.base_dir, entry[0])).convert("RGB")
            mask = Image.open(os.path.join(self.base_dir, entry[1])).convert("L")
            orig_mask = fundus_multilabel(np.array(mask)).astype(np.uint8)
            sample = {"img": img, "mask": mask}
            if self.transform:
                sample = self.transform(sample)
            return {
                "img": np.asarray(sample["img"], np.uint8),
                "mask": np.asarray(sample["mask"], np.uint8),
                "mask_orig": orig_mask,
                "id": self.id_path[index],
            }
        # cached decode (+ deterministic resize when resize_to is set); the
        # random transform suffix runs per item below
        img_np = _load_resized(self._cache, os.path.join(self.base_dir, entry[0]), self.resize_to, "RGB")
        mask_np = _load_resized(self._cache, os.path.join(self.base_dir, entry[1]), self.resize_to, "L")
        if self.np_transform is not None:  # GIL-friendly numpy/cv2 path
            img_np, mask_np = self.np_transform(img_np, mask_np, rng)
        elif self.transform:
            sample = self.transform({"img": Image.fromarray(img_np), "mask": Image.fromarray(mask_np)})
            img_np = np.asarray(sample["img"], np.uint8)
            mask_np = np.array(sample["mask"])

        out = {
            "img": np.asarray(img_np, np.uint8),
            "mask": fundus_multilabel(mask_np).astype(np.uint8),
            "domain": np.int32(self.domain_idx_list[0] if len(self.domain_idx_list) == 1 else FUNDUS_DOMAINS.index(cur_domain)),
        }
        if self.is_freq:
            out["donor"] = self._sample_donor(cur_domain, rng)
        return out

    def __getitem__(self, index: int):
        return self.get_item(index)
