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


class DeviceMetricsRing:
    """Bounded on-device buffer for per-step scalar metrics.

    Device->host readbacks over tunneled/relayed TPU links cost SECONDS of
    wall time regardless of payload size (measured ~3.3 s for a 756-byte
    pull here), so per-step or per-window scalar pulls throttle training.
    Instead, each step/window APPENDS its metrics on device (a tiny
    dynamic_update_slice program) into one (cap, K) float32 ring; the host
    pulls the whole ring in ONE transfer when it fills, at eval boundaries,
    or at the end of training.  At cap=2048 and log_interval=1 that is one
    ~3 s pull per 2048 steps — noise — while per-step values stay exact.

    The reference logs scalars eagerly every iteration
    (code/train.py:298-305); the values written here are identical, only
    batched in time.
    """

    def __init__(
        self,
        writer: "MetricsWriter",
        cap: int = 2048,
        prefix: str = "loss/",
        log_interval: int = 1,
        no_prefix: tuple = ("lr",),
    ):
        import jax
        import jax.numpy as jnp

        self.writer = writer
        self.cap = cap
        self.prefix = prefix
        # tags the reference writes WITHOUT the loss/ namespace — `lr` is a
        # bare top-level scalar (train.py:298/467)
        self.no_prefix = frozenset(no_prefix)
        self.log_interval = max(1, log_interval)
        self.names: Optional[list] = None
        self.buf = None
        self.steps: list = []  # row i of buf belongs to global step steps[i]
        self._jnp = jnp
        self._append = jax.jit(
            lambda buf, table, pos: jax.lax.dynamic_update_slice(
                buf, table, (pos, jnp.int32(0))
            )
        )
        # (W,)-valued dicts -> (W, K); ()-valued dicts -> (1, K)
        self._stack = jax.jit(
            lambda t: jnp.stack(
                [jnp.atleast_1d(t[k].astype(jnp.float32)) for k in sorted(t)], axis=-1
            )
        )

    def append(self, start_step: int, metrics: dict) -> None:
        """metrics: dict of () scalars (one step) or (W,) arrays (a scan
        window covering steps start_step..start_step+W-1)."""
        if self.names is None:
            self.names = sorted(metrics)
            self.buf = self._jnp.zeros((self.cap, len(self.names)), self._jnp.float32)
        table = self._stack(metrics)
        w = table.shape[0]
        if len(self.steps) + w > self.cap:
            self.flush()
        self.buf = self._append(self.buf, table, len(self.steps))
        self.steps.extend(range(start_step, start_step + w))

    def flush(self) -> None:
        """ONE device->host pull; writes rows whose step hits log_interval."""
        if not self.steps:
            return
        import jax

        table = np.asarray(jax.device_get(self.buf))[: len(self.steps)]
        for s, row in zip(self.steps, table):
            if s % self.log_interval == 0:
                vals = dict(zip(self.names, row))
                bare = {k: vals.pop(k) for k in list(vals) if k in self.no_prefix}
                self.writer.add_scalars(vals, s, prefix=self.prefix)
                if bare:
                    self.writer.add_scalars(bare, s, prefix="")
        self.steps.clear()


class DeviceVizRing:
    """Deferred-readback buffer for the TB image grids.

    The reference logs image grids every 100 iters (code/train.py:306-329).
    Pulling the grid arrays eagerly costs a full d2h round-trip (~3.3 s on
    this relay) every 100 steps — ~40% of the step budget at round-2 rates.
    Instead each logging step quantizes its viz dict to ONE uint8 vector on
    device (per-array min/max affine, same normalize `make_grid` applies
    before TB's own uint8 conversion — the logged artifact changes by at
    most 1/255 per pixel; integer-valued arrays such as label maps are
    flagged and rounded at dequant, reconstructing exactly for any range
    <= 255) and
    parks the jax array; at eval boundaries — where training already pays
    a real sync — all parked grids come back in ONE stacked device_get and
    are written to TB with their original step tags.  Same images, same
    tags, batched in time, 4x fewer bytes on a ~0.3 MB/s d2h link.
    """

    def __init__(self, cap: int = 32):
        self._cap = cap
        self._slots: list = []  # (step, flat uint8 array, (lo,hi)*K f32)
        self._meta = None  # (keys, shapes) of the viz tree, fixed per run
        self._quantize = None  # jitted flatten+quantize, one dispatch/append

    def append(self, step: int, viz: dict) -> None:
        import jax
        import jax.numpy as jnp

        keys = sorted(viz)
        if self._meta is None:
            self._meta = (keys, [tuple(viz[k].shape) for k in keys])
        if self._quantize is None:
            # ONE jitted program per append: ~20 eager mini-ops (min, round,
            # ravel, concat per key) each cost a dispatch round-trip — and a
            # first-touch compile — on a relay-tunneled device
            def _q(vz):
                qs, scales = [], []
                for k in sorted(vz):
                    x = vz[k].astype(jnp.float32)
                    lo, hi = x.min(), x.max()
                    q = jnp.round((x - lo) * (255.0 / jnp.maximum(hi - lo, 1e-12)))
                    qs.append(q.astype(jnp.uint8).ravel())
                    # integer-valued arrays (label maps) must survive the
                    # round-trip EXACTLY: a dequantized 2.996 for label 3
                    # would astype(int)-truncate to class 2 downstream.
                    # Flag them; flush() rounds the reconstruction (exact
                    # whenever hi-lo <= 255, i.e. any uint8-ranged labels).
                    is_int = jnp.all(x == jnp.round(x)).astype(jnp.float32)
                    scales.extend([lo, hi, is_int])
                return jnp.concatenate(qs), jnp.stack(scales)

            self._quantize = jax.jit(_q)
        if len(self._slots) >= self._cap:
            # pathological config (tiny log_images_every, rare evals):
            # keep the most recent grids rather than growing HBM unboundedly
            self._slots.pop(0)
        flat, scales = self._quantize(viz)
        self._slots.append((step, flat, scales))

    def flush(self, log_fn) -> None:
        """ONE pull for every parked grid; log_fn(viz_dict, step) per grid."""
        if not self._slots:
            return
        import jax
        import jax.numpy as jnp

        stacked, scales = jax.device_get(
            (
                jnp.stack([q for _, q, _ in self._slots]),
                jnp.stack([s for _, _, s in self._slots]),
            )
        )
        stacked, scales = np.asarray(stacked), np.asarray(scales)
        keys, shapes = self._meta
        sizes = [int(np.prod(s)) for s in shapes]
        offs = np.cumsum([0] + sizes)
        for (step, _, _), row, sc in zip(self._slots, stacked, scales):
            viz = {}
            for i, k in enumerate(keys):
                lo, hi, is_int = sc[3 * i], sc[3 * i + 1], sc[3 * i + 2]
                q = row[offs[i] : offs[i + 1]].reshape(shapes[i])
                v = lo + q.astype(np.float32) * ((hi - lo) / 255.0)
                viz[k] = np.round(v) if is_int > 0.5 else v
            log_fn(viz, step)
        self._slots.clear()
