"""Train CLI — flag-compatible with the reference's `python train.py ...`
(/root/reference/code/train.py:47-74), plus TPU-native extensions.

Example (fundus full RAM-DSIR, target domain 3):
  python -m ramdsir_tpu.cli.train --dataset fundus --domain_idxs 0,1,2 \
      --test_domain_idx 3 --ram --rec --is_out_domain --consistency \
      --consistency_type kd --save_path runs/fundus_t3
"""
from __future__ import annotations

import argparse

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.train.loop import fit


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="DG Medical Segmentation Train (TPU)")
    p.add_argument("--data_root", type=str, default="../dataset")
    p.add_argument("--dataset", type=str, default="fundus", choices=["fundus", "prostate"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--test_batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--domain_idxs", type=str, default="0,1,2")
    p.add_argument("--test_domain_idx", type=int, default=3)
    p.add_argument("--in_channels", type=int, default=3)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--lambda_rec", type=float, default=0.1)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--ram", action="store_true")
    p.add_argument("--rec", action="store_true")
    p.add_argument("--is_out_domain", action="store_true")
    p.add_argument("--consistency", action="store_true")
    p.add_argument("--consistency_type", type=str, default="mse", choices=["mse", "kd"])
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--norm", type=str, default="bn")
    p.add_argument("--activation", type=str, default="relu")
    # TPU-native extensions
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--compute_dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--num_devices", type=int, default=None, help="data-parallel shards")
    p.add_argument("--ram_use_pallas", action="store_true")
    p.add_argument(
        "--no_ram_banded_dft", action="store_true",
        help="fall back to the full-spectrum rfft2/irfft2 RAM path "
        "(default: banded restricted-DFT matmuls, ops/ram.py)",
    )
    p.add_argument("--remat", action="store_true", help="rematerialize the forward (saves HBM)")
    p.add_argument("--resume", type=str, default=None, help="checkpoint to resume from")
    p.add_argument("--max_steps", type=int, default=None, help="smoke-run cap")
    p.add_argument(
        "--trace_dir", type=str, default=None,
        help="capture a jax.profiler trace of steps 2-12 into this directory",
    )
    p.add_argument(
        "--scan_window", type=int, default=None,
        help="train steps per XLA dispatch with the device pipeline "
        "(default: auto; 1 disables the lax.scan window)",
    )
    p.add_argument(
        "--global_batch", type=int, default=None,
        help="NON-PARITY: replace the reference's hard-coded per-domain "
        "batch tables with an even split of this global batch; the base LR "
        "scales linearly with the batch ratio unless --lr is given",
    )
    return p.parse_args(argv)


def main(argv=None):
    a = parse_args(argv)
    cfg = TrainConfig(
        data_root=a.data_root,
        dataset=a.dataset,
        batch_size=a.batch_size,
        test_batch_size=a.test_batch_size,
        lr=a.lr,
        epochs=a.epochs,
        domain_idxs=tuple(int(x) for x in a.domain_idxs.split(",")),
        test_domain_idx=a.test_domain_idx,
        in_channels=a.in_channels,
        num_classes=a.num_classes,
        seed=a.seed,
        lambda_rec=a.lambda_rec,
        deterministic=a.deterministic,
        ram=a.ram,
        rec=a.rec,
        is_out_domain=a.is_out_domain,
        consistency=a.consistency,
        consistency_type=a.consistency_type,
        save_path=a.save_path,
        norm=a.norm,
        activation=a.activation,
        image_size=a.image_size,
        compute_dtype=a.compute_dtype,
        num_devices=a.num_devices,
        ram_use_pallas=a.ram_use_pallas,
        ram_banded_dft=not a.no_ram_banded_dft,
        remat=a.remat,
        checkpoint_resume=a.resume,
        trace_dir=a.trace_dir,
        scan_window=a.scan_window,
        global_batch=a.global_batch,
    )
    summary = fit(cfg, max_steps=a.max_steps)
    print(summary)


if __name__ == "__main__":
    main()
