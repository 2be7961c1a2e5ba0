"""Prostate datasets (6-domain MRI slices stored as .npy).

Layout-parity with /root/reference/code/dataset/prostate.py:64-212:
  * base_dir/DomainX/image/*.npy — (H, W, 3) float slices already in [-1,1]
    (3-slice neighborhood as channels), base_dir/DomainX/mask/*.npy int maps.
  * Multi-domain train items carry a cross-domain donor slice for the
    on-device RAM mixup (clip range [-1,1], no renormalization —
    prostate.py:186-190).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from ramdsir_tpu.config import PROSTATE_DOMAINS


class ProstateDataset:
    def __init__(
        self,
        base_dir: str,
        domain_idx: int,
        split: str = "train",
        num: Optional[int] = None,
        transform=None,
    ):
        self.base_dir = base_dir
        self.domain = PROSTATE_DOMAINS[domain_idx]
        self.split = split
        self.transform = transform
        self.id_path = sorted(os.listdir(os.path.join(base_dir, self.domain, "image")))
        if num is not None:
            self.id_path = self.id_path[:num]

    def __len__(self) -> int:
        return len(self.id_path)

    def __getitem__(self, index: int):
        name = self.id_path[index]
        img = np.load(os.path.join(self.base_dir, self.domain, "image", name))
        mask = np.load(os.path.join(self.base_dir, self.domain, "mask", name))
        out = {"img": img.astype(np.float32), "mask": mask.astype(np.int32)}
        if self.split == "test":
            out["id"] = name
        return out


class ProstateMultiDataset:
    """Multi-domain train dataset with cross-domain donor sampling."""

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
        rng: Optional[np.random.Generator] = None,
    ):
        self.base_dir = base_dir
        self.domain_idx_list = list(domain_idx_list)
        self.transform = transform
        self.is_freq = is_freq
        self.is_out_domain = is_out_domain
        self.test_domain_idx = test_domain_idx
        self.rng = rng or np.random.default_rng()

        self.id_path: List[str] = []
        for d in self.domain_idx_list:
            names = sorted(os.listdir(os.path.join(base_dir, PROSTATE_DOMAINS[d], "image")))
            self.id_path += [f"{PROSTATE_DOMAINS[d]}/image/{n}" for n in names]
        if num is not None:
            self.id_path = self.id_path[:num]

        self.train_domains = [
            d
            for d in PROSTATE_DOMAINS
            if test_domain_idx is None or d != PROSTATE_DOMAINS[test_domain_idx]
        ]
        self._donor_lists = {}

    def __len__(self) -> int:
        return len(self.id_path)

    def _donor_names(self, domain_name: str) -> List[str]:
        if domain_name not in self._donor_lists:
            self._donor_lists[domain_name] = sorted(
                os.listdir(os.path.join(self.base_dir, domain_name, "image"))
            )
        return self._donor_lists[domain_name]

    def _sample_donor(self, cur_domain: str, rng: np.random.Generator) -> np.ndarray:
        pool = [d for d in self.train_domains if not (self.is_out_domain and d == cur_domain)]
        donor_domain = pool[int(rng.integers(0, len(pool)))]
        names = self._donor_names(donor_domain)
        name = names[int(rng.integers(0, len(names)))]
        return np.load(os.path.join(self.base_dir, donor_domain, "image", name)).astype(np.float32)

    def get_item(self, index: int, rng: Optional[np.random.Generator] = None):
        """Explicit per-sample Generator variant (see FundusMultiDataset)."""
        rng = self.rng if rng is None else rng
        rel = self.id_path[index]
        cur_domain = rel.split("/")[0]
        img = np.load(os.path.join(self.base_dir, rel)).astype(np.float32)
        mask = np.load(os.path.join(self.base_dir, rel.replace("image", "mask"))).astype(np.int32)
        if self.transform:
            sample = self.transform({"img": img, "mask": mask})
            img, mask = sample["img"], sample["mask"]
        out = {"img": img, "mask": mask, "domain": np.int32(PROSTATE_DOMAINS.index(cur_domain))}
        if self.is_freq:
            out["donor"] = self._sample_donor(cur_domain, rng)
        return out

    def __getitem__(self, index: int):
        return self.get_item(index)
