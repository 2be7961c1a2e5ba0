"""Configuration dataclasses.

The reference keeps its configuration implicit in code (argparse defaults and
hard-coded tables in `code/train.py:35-45`, `:616-621`, band width L=0.1 at
`code/dataset/fundus.py:214`).  Here those constants are promoted to a typed
config so every entry point shares one source of truth.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

# Per-target-domain sub-batch sizes for the source-domain loaders.
# Reference: code/train.py:35-38 (fundus), :40-45 (prostate).
FUNDUS_BATCH_LIST: List[List[int]] = [
    [3, 6, 7],
    [2, 7, 7],
    [2, 4, 10],
    [2, 4, 10],
]
PROSTATE_BATCH_LIST: List[List[int]] = [[2] * 5 for _ in range(6)]

# Domain name tables. Reference: code/dataset/fundus.py:69,
# code/dataset/prostate.py:68, code/train.py:77.
FUNDUS_DOMAINS = ["Domain1", "Domain2", "Domain3", "Domain4"]
PROSTATE_DOMAINS = ["Domain1", "Domain2", "Domain3", "Domain4", "Domain5", "Domain6"]
PROSTATE_VOLUME_DOMAINS = ["ISBI", "ISBI_1.5", "I2CVB", "UCL", "BIDMC", "HK"]

# Defaults per dataset. Reference: code/train.py:616-621.
DATASET_EPOCHS = {"fundus": 400, "prostate": 200}
DATASET_LR = {"fundus": 2e-3, "prostate": 1e-3}
DATASET_NUM_CLASSES = {"fundus": 2, "prostate": 2}

# RAM low-frequency band fraction. Reference: code/dataset/fundus.py:214.
RAM_L = 0.1
# Loss weights. Reference: code/train.py:283 (consistency), :61 (lambda_rec).
CONSISTENCY_WEIGHT = 0.5
DEFAULT_LAMBDA_REC = 0.1
# Poly LR decay power. Reference: code/train.py:289.
POLY_POWER = 0.9


@dataclasses.dataclass
class TrainConfig:
    """Mirror of the reference train CLI (code/train.py:47-74)."""

    data_root: str = "../dataset"
    dataset: str = "fundus"  # {fundus, prostate}
    batch_size: int = 8
    test_batch_size: int = 8
    lr: Optional[float] = None
    epochs: Optional[int] = None
    domain_idxs: Tuple[int, ...] = (0, 1, 2)
    test_domain_idx: int = 3
    in_channels: int = 3
    num_classes: Optional[int] = None
    seed: int = 1337
    lambda_rec: float = DEFAULT_LAMBDA_REC
    deterministic: bool = False
    ram: bool = True
    rec: bool = True
    is_out_domain: bool = False
    consistency: bool = True
    consistency_type: str = "kd"  # {mse, kd}
    save_path: str = "runs/default"
    norm: str = "bn"
    activation: str = "relu"
    # --- TPU-native extensions (not in the reference) ---
    image_size: int = 256  # fundus train/eval size; prostate slices are 384
    compute_dtype: str = "float32"  # {float32, bfloat16} activation dtype
    # eval-forward dtype: f32 = exact reference semantics; bfloat16 matches
    # the TRAINING forward's precision at ~2x the MXU rate (probabilities
    # still return f32; threshold/postprocess unchanged)
    predict_dtype: str = "float32"
    num_devices: Optional[int] = None  # data-parallel shard count (None=all)
    ram_use_pallas: bool = False  # fuse the band-mix with a Pallas kernel
    # device pipeline: precompute the donor pool's banded amplitude spectra
    # once per run instead of rfft2-ing the gathered donor batch every step
    # (ops/ram.banded_amplitude_spectrum; numerics identical)
    ram_precompute_donor_amp: bool = True
    # banded-DFT RAM: replace the source rfft2/irfft2 pair with restricted
    # DFT matmuls over the (2b+1)x(b+1) in-band block — MXU matmuls instead
    # of TPU-slow FFTs; out-of-band content passes through exactly
    # (ops/ram.ram_mixup_banded_dft; oracle-pinned in tests/test_ram.py)
    ram_banded_dft: bool = True
    remat: bool = False  # jax.checkpoint the dual forward (memory <-> FLOPs)
    fused_dsbn: bool = True  # one rec-decoder pass with per-sample domains
    # one vmapped forward over the stacked clean+freq batch (2B conv rows);
    # per-half BN stats and the sequential running-stat update are preserved
    fused_dual: bool = True
    # run the top N U-Net levels (16/32-channel maps) in the exact 2x2
    # space-to-depth domain: 4x lane occupancy / ~4x less padded HBM
    # traffic on the stage that caps the step (models/s2d.py; numerics
    # pinned equal to 0 in tests/test_s2d.py).  0 disables.
    s2d_levels: int = 2
    prefetch: int = 2  # host->device pipeline depth
    loader: str = "process"  # {process, thread} batch-assembly workers
    num_workers: Optional[int] = None  # loader workers (None = auto)
    # HBM-resident dataset: gather + scale-crop aug + donor lookup run inside
    # the jitted step; host sends int32 indices only (fundus; ~92 MB u8)
    device_data: bool = True
    # lax.scan window: W train steps per XLA dispatch when the device
    # pipeline is active.  Dispatches cover SEGMENTS spanning the epochs up
    # to the next eval boundary (with the reference's eval_every=1 cadence a
    # segment is one epoch).  None = auto: the largest divisor of the
    # segment length <= 256, else min(segment, 256) — divisors keep one
    # compiled program shape per run; 1 = one dispatch per step, required
    # for --trace_dir's per-step windows.
    # Metrics stay per-step (the window returns a stacked table); TB image
    # grids log the window's LAST step when the cadence lands inside one.
    scan_window: Optional[int] = None
    # Non-parity scaling knob: override the reference's hard-coded
    # per-target-domain sub-batch tables (train.py:35-45) with an even
    # split of this GLOBAL batch across the source domains, and (unless
    # --lr is given explicitly) scale the base LR linearly by the
    # global-batch ratio.  Batch 96 measures 442 img/s on one v5e chip
    # vs 398 at the reference's 16 (BENCH_NOTES.md "Batch scaling").
    global_batch: Optional[int] = None
    log_interval: int = 1
    log_images_every: int = 100  # TB image grids (reference: 100); 0 disables
    checkpoint_resume: Optional[str] = None
    trace_dir: Optional[str] = None  # jax.profiler trace of steps 2-12

    def resolve(self) -> "TrainConfig":
        cfg = dataclasses.replace(self)
        if cfg.epochs is None:
            cfg.epochs = DATASET_EPOCHS[cfg.dataset]
        if cfg.lr is None:
            cfg.lr = DATASET_LR[cfg.dataset]
            if cfg.global_batch:
                # linear LR scaling with the batch ratio (Goyal et al.;
                # explicitly non-parity — the reference LR is tuned for
                # its hard-coded batch tables)
                ref_total = sum(self._reference_batch_list())
                cfg.lr = cfg.lr * cfg.global_batch / ref_total
        if cfg.num_classes is None:
            cfg.num_classes = DATASET_NUM_CLASSES[cfg.dataset]
        if cfg.ram_use_pallas:
            # the fused Pallas band-mix consumes the per-step donor
            # half-spectrum; precomputed banded amplitudes would silently
            # bypass it (train/steps.py branches on the batch key)
            cfg.ram_precompute_donor_amp = False
        return cfg

    def _reference_batch_list(self) -> List[int]:
        table = FUNDUS_BATCH_LIST if self.dataset == "fundus" else PROSTATE_BATCH_LIST
        return table[self.test_domain_idx][: len(self.domain_idxs)]

    @property
    def batch_size_list(self) -> List[int]:
        if self.global_batch:
            n_dom = len(self.domain_idxs)
            if self.global_batch % n_dom:
                raise ValueError(
                    f"--global_batch {self.global_batch} must divide by the "
                    f"{n_dom} source domains (even split)"
                )
            return [self.global_batch // n_dom] * n_dom
        if self.dataset == "fundus":
            return FUNDUS_BATCH_LIST[self.test_domain_idx]
        return PROSTATE_BATCH_LIST[self.test_domain_idx]

    @property
    def num_domains(self) -> int:
        return len(self.domain_idxs)
