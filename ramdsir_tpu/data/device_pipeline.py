"""Device-resident training data pipeline (fundus).

The whole fundus source-domain train set fits in HBM trivially: all four
domains at 256^2 are ~92 MB as uint8 (D1 50 + D2 99 + D3 320 + D4 320
images).  Caching it on device once collapses the host's per-step work to a
few dozen int32 indices — decode, resize, random scale-crop augmentation,
donor lookup and the RAM FFT all run inside the jitted train step on the
TPU.  This is the TPU-native answer to the reference's 24-40 DataLoader
worker processes (/root/reference/code/train.py:558-559): instead of
scaling host workers, remove the host from the hot path entirely.

Epoch semantics are identical to the host loaders (and the reference,
train.py:549-566): per-domain shuffle-without-replacement with drop_last,
the longest domain defines the epoch, shorter domains reshuffle-cycle.
Donor sampling matches fundus.py:201-208 (uniform over train domains,
excluding the current domain when is_out_domain).  The random scale-crop
matches RandomScaleCrop/np_random_scale_crop in distribution: p=0.5 upscale
by independent U(1,1.5) factors (integer target dims), then a uniform
random S x S crop; resampling is bilinear (img, cv2 half-pixel convention)
/ nearest (mask).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def stack_fundus_domains(datasets: Sequence, size: int):
    """Decode every train image/mask of each per-domain dataset into stacked
    uint8 arrays (one decode pass; reuses the dataset's resize cache).

    Returns (images (N,S,S,3) u8, masks (N,S,S,2) u8 multilabel,
    domain_offsets: [start0, start1, ..., N]).
    """
    from ramdsir_tpu.data.fundus import _load_resized
    from ramdsir_tpu.data.transforms import fundus_multilabel
    import os

    imgs, msks, offsets = [], [], [0]
    for ds in datasets:
        for entry_line in ds.id_path:
            entry = entry_line.split(" ")
            img = _load_resized(ds._cache, os.path.join(ds.base_dir, entry[0]), size, "RGB")
            gray = _load_resized(ds._cache, os.path.join(ds.base_dir, entry[1]), size, "L")
            imgs.append(img)
            msks.append(fundus_multilabel(gray).astype(np.uint8))
        offsets.append(len(imgs))
    return np.stack(imgs), np.stack(msks), offsets


def stack_donor_pool(base_dir: str, train_domains: Sequence[str], size: int):
    """Donor images per source domain (`DomainX/train.list`, the donor
    manifests of fundus.py:206-208), stacked with per-domain offsets."""
    import os

    from ramdsir_tpu.data.fundus import _load_resized, _read_list

    donors, offsets = [], {}
    for d in train_domains:
        ids = _read_list(os.path.join(base_dir, d, "train.list"))
        offsets[d] = (len(donors), len(ids))
        for line in ids:
            donors.append(
                _load_resized(None, os.path.join(base_dir, d, line.split(" ")[0]), size, "RGB")
            )
    return np.stack(donors), offsets


class DeviceFundusPipeline:
    """Index planner + device arrays.

    Iterating yields tiny per-step dicts {img_idx (B,), donor_idx (B,)}
    (int32).  The heavy arrays live on device (replicated across the mesh)
    and are gathered/augmented inside the train step — see
    train.steps.make_train_step(device_data=...).
    """

    def __init__(
        self,
        datasets: Sequence,
        batch_sizes: Sequence[int],
        base_dir: str,
        size: int,
        test_domain_idx: Optional[int],
        is_out_domain: bool = False,
        seed: Optional[int] = None,
        precompute_donor_amp: bool = True,
    ):
        from ramdsir_tpu.config import FUNDUS_DOMAINS

        self.batch_sizes = list(batch_sizes)
        self.rng = np.random.default_rng(seed)
        self._base_seed = seed if seed is not None else 0
        self._epoch = 0
        self.is_out_domain = is_out_domain

        images, masks, self.offsets = stack_fundus_domains(datasets, size)
        self.train_domains = [
            d for d in FUNDUS_DOMAINS
            if test_domain_idx is None or d != FUNDUS_DOMAINS[test_domain_idx]
        ]
        donors, self.donor_offsets = stack_donor_pool(base_dir, self.train_domains, size)
        # one h2d upload for the whole training run
        self.device_data = {
            "images": jnp.asarray(images),
            "masks": jnp.asarray(masks),
        }
        if precompute_donor_amp:
            # donor spectra are fixed for the run: precompute the banded
            # amplitudes ONCE instead of rfft2-ing the gathered donor batch
            # inside every train step (and drop the uint8 donor images —
            # the band pool is ~12 MB vs ~148 MB at 256^2)
            from ramdsir_tpu.ops.ram import banded_amplitude_spectrum

            self.device_data["donor_amp"] = banded_amplitude_spectrum(jnp.asarray(donors))
        else:
            self.device_data["donors"] = jnp.asarray(donors)
        # domain name of each dataset (single-domain datasets, loop.py)
        self.ds_domains: List[str] = [
            FUNDUS_DOMAINS[ds.domain_idx_list[0]] for ds in datasets
        ]
        self._sizes = [self.offsets[i + 1] - self.offsets[i] for i in range(len(datasets))]
        lens = [n // bs for n, bs in zip(self._sizes, self.batch_sizes)]
        for i, n in enumerate(lens):
            if n == 0:
                raise ValueError(f"domain {i}: {self._sizes[i]} images < batch {self.batch_sizes[i]}")
        self.steps_per_epoch = max(lens)

    def __len__(self) -> int:
        return self.steps_per_epoch

    def epoch_plan(self) -> Dict[str, np.ndarray]:
        """The WHOLE epoch's index plan as (steps_per_epoch, B) int32 arrays.

        One h2d transfer per epoch instead of one per step; rows feed either
        the per-step train program or a lax.scan window
        (train.steps.make_train_step(scan=True))."""
        epoch = self._epoch
        self._epoch += 1
        spe = self.steps_per_epoch
        # per-domain shuffled index streams with reshuffle-on-wrap
        orders = [self.rng.permutation(n) for n in self._sizes]
        pos = [0] * len(orders)
        img_plan = np.empty((spe, sum(self.batch_sizes)), np.int32)
        donor_plan = np.empty_like(img_plan)
        for s in range(spe):
            img_idx = []
            for d, bs in enumerate(self.batch_sizes):
                if pos[d] + bs > len(orders[d]):
                    orders[d] = self.rng.permutation(self._sizes[d])
                    pos[d] = 0
                rows = orders[d][pos[d] : pos[d] + bs]
                pos[d] += bs
                img_idx.extend(self.offsets[d] + rows)
            img_plan[s] = img_idx
        # donors: one vectorized counter-seeded draw per domain per epoch
        # (same distribution as fundus.py:201-208 — uniform over the donor
        # pool's domains, then uniform within the chosen domain).  A single
        # (seed, epoch)-seeded stream replaces the old per-sample Generator
        # construction, which cost ~1 ms x batch x steps of host time per
        # epoch — the dominant per-epoch cost once steps run as scan
        # windows.
        drng = np.random.default_rng((self._base_seed, epoch))
        col = 0
        for d, bs in enumerate(self.batch_sizes):
            cur = self.ds_domains[d]
            pool = [
                dom for dom in self.train_domains
                if not (self.is_out_domain and dom == cur)
            ]
            starts = np.array([self.donor_offsets[p][0] for p in pool])
            ns = np.array([self.donor_offsets[p][1] for p in pool])
            dom = drng.integers(0, len(pool), size=(spe, bs))
            u = drng.random((spe, bs))
            donor_plan[:, col : col + bs] = starts[dom] + (u * ns[dom]).astype(np.int64)
            col += bs
        return {"img_idx": img_plan, "donor_idx": donor_plan}

    def __iter__(self):
        plan = self.epoch_plan()
        for s in range(self.steps_per_epoch):
            yield {k: v[s] for k, v in plan.items()}


def _resample_one(img, mask, fy, fx, y0, x0, size: int):
    """Crop window [y0:y0+S, x0:x0+S] of the (virtually) fy/fx-upscaled
    image: bilinear for img (cv2 half-pixel mapping), nearest for mask.

    The resample is expressed as two one-hot matmuls (out = Wy @ img @ Wx^T
    with 2-nonzero bilinear weight rows) instead of nested index gathers:
    separable interpolation is MXU work, while batched multi-level gathers
    take XLA's slow serial lowering when composed with the dataset gather
    (measured 40+ ms for the fused program vs <1 ms for this form)."""
    i = jnp.arange(size, dtype=jnp.float32)
    sy = jnp.clip((y0 + i + 0.5) / fy - 0.5, 0.0, size - 1.0)
    sx = jnp.clip((x0 + i + 0.5) / fx - 0.5, 0.0, size - 1.0)
    y0f, x0f = jnp.floor(sy), jnp.floor(sx)
    wy, wx = sy - y0f, sx - x0f
    y0i, x0i = y0f.astype(jnp.int32), x0f.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, size - 1)
    x1i = jnp.minimum(x0i + 1, size - 1)

    hi = jax.lax.Precision.HIGHEST  # fp32-accurate MXU passes
    wy_m = (
        jax.nn.one_hot(y0i, size, dtype=jnp.float32) * (1.0 - wy)[:, None]
        + jax.nn.one_hot(y1i, size, dtype=jnp.float32) * wy[:, None]
    )
    wx_m = (
        jax.nn.one_hot(x0i, size, dtype=jnp.float32) * (1.0 - wx)[:, None]
        + jax.nn.one_hot(x1i, size, dtype=jnp.float32) * wx[:, None]
    )
    imgf = img.astype(jnp.float32)
    rows = jnp.einsum("yh,hwc->ywc", wy_m, imgf, precision=hi)
    out = jnp.einsum("xw,ywc->yxc", wx_m, rows, precision=hi)

    # nearest-neighbour mask pick: exact one-hot matmuls (0/1 weights are
    # exact in any matmul precision, so the result is bit-identical)
    my = jnp.clip(jnp.round(sy), 0, size - 1).astype(jnp.int32)
    mx = jnp.clip(jnp.round(sx), 0, size - 1).astype(jnp.int32)
    my_m = jax.nn.one_hot(my, size, dtype=jnp.float32)
    mx_m = jax.nn.one_hot(mx, size, dtype=jnp.float32)
    maskf = mask.astype(jnp.float32)
    mrows = jnp.einsum("yh,hwc->ywc", my_m, maskf, precision=hi)
    mout = jnp.einsum("xw,ywc->yxc", mx_m, mrows, precision=hi).astype(mask.dtype)
    return out, mout


def device_scale_crop(imgs, masks, key, size: int):
    """Batched RandomScaleCrop on device (distribution of
    np_random_scale_crop): p=0.5 keep, else upscale by independent integer
    target dims U(1,1.5)*S then uniform random S x S crop."""
    b = imgs.shape[0]
    k_apply, k_f, k_off = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k_apply, 0.5, (b,))
    u = jax.random.uniform(k_f, (b, 2), minval=1.0, maxval=1.5)
    tgt = jnp.floor(u * size)  # integer scaled dims (h', w') as float
    fy = jnp.where(apply, tgt[:, 0] / size, 1.0)
    fx = jnp.where(apply, tgt[:, 1] / size, 1.0)
    # crop offset ~ randint(0, h' - S + 1)
    off_u = jax.random.uniform(k_off, (b, 2))
    y0 = jnp.where(apply, jnp.floor(off_u[:, 0] * (tgt[:, 0] - size + 1)), 0.0)
    x0 = jnp.where(apply, jnp.floor(off_u[:, 1] * (tgt[:, 1] - size + 1)), 0.0)
    out_i, out_m = jax.vmap(lambda im, mk, a, bb, c, dd: _resample_one(im, mk, a, bb, c, dd, size))(
        imgs, masks, fy, fx, y0, x0
    )
    return out_i, out_m


def gather_and_augment(device_data: Dict[str, jax.Array], img_idx, donor_idx, key, size: int):
    """Inside-jit: indices -> the exact batch dict the host loader builds
    (img float [0,255], mask float multilabel, plus either the donor image
    [0,255] or its precomputed banded amplitude spectrum)."""
    imgs = jnp.take(device_data["images"], img_idx, axis=0)
    masks = jnp.take(device_data["masks"], img_idx, axis=0)
    out_i, out_m = device_scale_crop(imgs, masks, key, size)
    batch = {"img": out_i, "mask": out_m.astype(jnp.float32)}
    if "donor_amp" in device_data:
        batch["donor_amp"] = jnp.take(device_data["donor_amp"], donor_idx, axis=0)
    else:
        batch["donor"] = jnp.take(device_data["donors"], donor_idx, axis=0).astype(jnp.float32)
    return batch


class DeviceProstatePipeline:
    """HBM-resident prostate pipeline (prostate.py:64-212 semantics).

    Prostate training applies NO transform (train.py:540-542): an epoch is
    per-domain shuffle-without-replacement over raw (H,W,3) float slices in
    [-1,1], plus a cross-domain donor slice for the RAM mixup.  All slices
    of every train domain are stacked once into HBM as float32 (the values
    are continuous, so unlike fundus there is no exact uint8 form) and the
    donor pool indexes the SAME array — per-step host work is two (B,)
    int32 index vectors, and scan windows work exactly as for fundus.
    """

    def __init__(
        self,
        datasets: Sequence,
        batch_sizes: Sequence[int],
        base_dir: str,
        test_domain_idx: Optional[int],
        is_out_domain: bool = False,
        seed: Optional[int] = None,
        precompute_donor_amp: bool = True,
    ):
        import os

        from ramdsir_tpu.config import PROSTATE_DOMAINS

        self.batch_sizes = list(batch_sizes)
        self.rng = np.random.default_rng(seed)
        self._base_seed = seed if seed is not None else 0
        self._epoch = 0
        self.is_out_domain = is_out_domain
        self.train_domains = [
            d for d in PROSTATE_DOMAINS
            if test_domain_idx is None or d != PROSTATE_DOMAINS[test_domain_idx]
        ]

        # one stacked array over every train domain (donor pool == images)
        imgs, msks = [], []
        self.domain_offsets = {}
        for dom in self.train_domains:
            names = sorted(os.listdir(os.path.join(base_dir, dom, "image")))
            self.domain_offsets[dom] = (len(imgs), len(names))
            for n in names:
                imgs.append(
                    np.load(os.path.join(base_dir, dom, "image", n)).astype(np.float32)
                )
                # labels are tiny ints (0/1/2) — uint8 in HBM, widened to
                # int32 inside gather_prostate; the float image stack is the
                # real footprint (N*H*W*3*4 bytes replicated per device,
                # ~1.7 MB per 384^2 slice)
                msks.append(
                    np.load(os.path.join(base_dir, dom, "mask", n)).astype(np.uint8)
                )
        self.device_data = {
            "images": jnp.asarray(np.stack(imgs)),
            "masks": jnp.asarray(np.stack(msks)),
        }
        if precompute_donor_amp:
            # the donor pool IS the slice stack; banded amplitudes are
            # ~36 KB per 384^2 slice vs a per-step rfft2 of the donor batch
            from ramdsir_tpu.ops.ram import banded_amplitude_spectrum

            self.device_data["donor_amp"] = banded_amplitude_spectrum(
                self.device_data["images"]
            )

        self.ds_domains: List[str] = [
            PROSTATE_DOMAINS[ds.domain_idx_list[0]] for ds in datasets
        ]
        self._sizes = [self.domain_offsets[d][1] for d in self.ds_domains]
        lens = [n // bs for n, bs in zip(self._sizes, self.batch_sizes)]
        for i, n in enumerate(lens):
            if n == 0:
                raise ValueError(
                    f"domain {self.ds_domains[i]}: {self._sizes[i]} slices < batch {self.batch_sizes[i]}"
                )
        self.steps_per_epoch = max(lens)

    def __len__(self) -> int:
        return self.steps_per_epoch

    def epoch_plan(self) -> Dict[str, np.ndarray]:
        """(steps_per_epoch, B) img/donor index plans — see
        DeviceFundusPipeline.epoch_plan for the scheme."""
        epoch = self._epoch
        self._epoch += 1
        spe = self.steps_per_epoch
        orders = [self.rng.permutation(n) for n in self._sizes]
        pos = [0] * len(orders)
        img_plan = np.empty((spe, sum(self.batch_sizes)), np.int32)
        donor_plan = np.empty_like(img_plan)
        for s in range(spe):
            img_idx = []
            for d, bs in enumerate(self.batch_sizes):
                if pos[d] + bs > len(orders[d]):
                    orders[d] = self.rng.permutation(self._sizes[d])
                    pos[d] = 0
                rows = orders[d][pos[d] : pos[d] + bs]
                pos[d] += bs
                img_idx.extend(self.domain_offsets[self.ds_domains[d]][0] + rows)
            img_plan[s] = img_idx
        drng = np.random.default_rng((self._base_seed, epoch))
        col = 0
        for d, bs in enumerate(self.batch_sizes):
            cur = self.ds_domains[d]
            pool = [
                dom for dom in self.train_domains
                if not (self.is_out_domain and dom == cur)
            ]
            starts = np.array([self.domain_offsets[p][0] for p in pool])
            ns = np.array([self.domain_offsets[p][1] for p in pool])
            dom = drng.integers(0, len(pool), size=(spe, bs))
            u = drng.random((spe, bs))
            donor_plan[:, col : col + bs] = starts[dom] + (u * ns[dom]).astype(np.int64)
            col += bs
        return {"img_idx": img_plan, "donor_idx": donor_plan}

    def __iter__(self):
        plan = self.epoch_plan()
        for s in range(self.steps_per_epoch):
            yield {k: v[s] for k, v in plan.items()}


def gather_prostate(device_data: Dict[str, jax.Array], img_idx, donor_idx):
    """Inside-jit: indices -> the host loader's batch dict (img float32
    [-1,1], mask int32, donor image or precomputed banded amplitude).  No
    augmentation — prostate trains on raw slices (train.py:540-542)."""
    batch = {
        "img": jnp.take(device_data["images"], img_idx, axis=0),
        "mask": jnp.take(device_data["masks"], img_idx, axis=0).astype(jnp.int32),
    }
    if "donor_amp" in device_data:
        batch["donor_amp"] = jnp.take(device_data["donor_amp"], donor_idx, axis=0)
    else:
        batch["donor"] = jnp.take(device_data["images"], donor_idx, axis=0)
    return batch
