"""MFU / roofline accounting for the flagship train steps.

Answers "is 39.68 / 78.9 ms per step as fast as this chip allows?" with
arithmetic instead of narrative (VERDICT r4 missing #3):

  * FLOPs and HBM bytes of OUR compiled step — from XLA's own cost model
    (`jit(step).lower(...).compile().cost_analysis()`), i.e. the program
    the bench actually runs: s2d 4x top-stage MACs, packconv2 custom dW,
    banded-DFT RAM and all — not the reference's 1.12 TFLOP torch count
    (benchmarks/torch_baseline.py), which is a different program.
  * Achieved TFLOPS / GB/s at the measured ms/step, % of the chip's bf16
    MXU peak and HBM bandwidth, and the roofline verdict: arithmetic
    intensity (FLOPs/byte) vs the machine balance point tells which
    ceiling binds and what the time floor is.

Run ON THE CHIP (compiles ride the persistent cache):

    python benchmarks/mfu.py --dataset fundus --ms 39.68
    python benchmarks/mfu.py --dataset prostate --ms 78.9 --batch 10

Without --ms it measures the step itself (bench.py's differential-readback
timing).  Peaks come from a device_kind table (override with
--peak_tflops / --hbm_gbs).  Emits one JSON line per dataset.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# per-chip peaks: (bf16 matmul TFLOPS, HBM GB/s).  Sources: public TPU
# spec sheets (cloud.google.com/tpu/docs/system-architecture-tpu-vm).
PEAKS = {
    "TPU v2": (45.0, 700.0),
    "TPU v3": (123.0, 900.0),
    "TPU v4": (275.0, 1228.0),
    "TPU v5e": (197.0, 819.0),
    "TPU v5 lite": (197.0, 819.0),
    "TPU v5p": (459.0, 2765.0),
    "TPU v6e": (918.0, 1640.0),
    "TPU v6 lite": (918.0, 1640.0),
}


def chip_peaks(device, peak_tflops=None, hbm_gbs=None):
    kind = getattr(device, "device_kind", "unknown")
    for name, (tf, bw) in PEAKS.items():
        if name.lower() in str(kind).lower():
            return kind, peak_tflops or tf, hbm_gbs or bw
    return kind, peak_tflops or 0.0, hbm_gbs or 0.0


def cost_of_step(step, state, batch, key):
    """XLA cost analysis of the jitted train step (no execution needed)."""
    compiled = step.lower(state, batch, key).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # some PJRT versions wrap per-program
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    return flops, bytes_accessed, dict(ca)


def analyze(
    dataset: str, ms: float, batch: int = 0, peak_tflops=None, hbm_gbs=None
) -> dict:
    import jax

    from bench import build_bench_setup, main as bench_main

    setup = build_bench_setup(dataset, batch=batch, donate=False)
    if not ms:
        r = bench_main(dataset=dataset, batch=batch)
        ms = r["ms_per_step"]
    flops, bytes_acc, raw = cost_of_step(
        setup["step"], setup["state"], setup["batch"], jax.random.PRNGKey(1)
    )
    kind, peak_tf, hbm = chip_peaks(jax.devices()[0], peak_tflops, hbm_gbs)
    sec = ms / 1e3
    achieved_tf = flops / sec / 1e12
    achieved_gbs = bytes_acc / sec / 1e9
    intensity = flops / bytes_acc if bytes_acc else float("inf")
    balance = peak_tf * 1e12 / (hbm * 1e9) if hbm else float("inf")
    # roofline floors: time if ONLY compute bound / ONLY bandwidth bound
    t_compute_ms = flops / (peak_tf * 1e12) * 1e3 if peak_tf else None
    t_memory_ms = bytes_acc / (hbm * 1e9) * 1e3 if hbm else None
    out = {
        "dataset": dataset,
        "device_kind": str(kind),
        "batch": setup["batch_size"],
        "image_size": setup["image_size"],
        "ms_per_step": round(ms, 3),
        "flops_per_step": flops,
        "tflops_per_step": round(flops / 1e12, 4),
        "hbm_bytes_per_step": bytes_acc,
        "hbm_gb_per_step": round(bytes_acc / 1e9, 4),
        "achieved_tflops": round(achieved_tf, 2),
        "peak_bf16_tflops": peak_tf,
        "mfu_pct": round(100.0 * achieved_tf / peak_tf, 2) if peak_tf else None,
        "achieved_gbs": round(achieved_gbs, 1),
        "peak_hbm_gbs": hbm,
        "hbm_util_pct": round(100.0 * achieved_gbs / hbm, 2) if hbm else None,
        "arith_intensity_flops_per_byte": round(intensity, 2),
        "machine_balance_flops_per_byte": round(balance, 2) if balance != float("inf") else None,
        "bound": "compute" if intensity > balance else "memory",
        "roofline_floor_ms": {
            "compute_only": round(t_compute_ms, 3) if t_compute_ms else None,
            "memory_only": round(t_memory_ms, 3) if t_memory_ms else None,
        },
        "transcendentals": float(raw.get("transcendentals", 0.0)),
    }
    floor = max(t_compute_ms or 0.0, t_memory_ms or 0.0)
    out["pct_of_roofline_floor"] = round(100.0 * floor / ms, 1) if floor else None
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dataset", choices=("fundus", "prostate", "both"), default="both")
    p.add_argument("--ms", type=float, default=0.0,
                   help="measured ms/step (default: measure now via bench.py)")
    p.add_argument("--ms_prostate", type=float, default=0.0,
                   help="with --dataset both: prostate ms/step")
    p.add_argument("--batch", type=int, default=0, help="override global batch")
    p.add_argument("--peak_tflops", type=float, default=None)
    p.add_argument("--hbm_gbs", type=float, default=None)
    a = p.parse_args(argv)

    datasets = ["fundus", "prostate"] if a.dataset == "both" else [a.dataset]
    results = []
    for ds in datasets:
        ms = a.ms if ds == datasets[0] else a.ms_prostate
        r = analyze(ds, ms, batch=a.batch,
                    peak_tflops=a.peak_tflops, hbm_gbs=a.hbm_gbs)
        results.append(r)
        print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()
