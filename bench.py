"""Benchmark: full RAM-DSIR fundus training step throughput on TPU.

Measures the flagship configuration (BASELINE config #3): fundus 256x256,
global batch 16 (3+6+7 across 3 source domains), on-device RAM mixup, dual
forward, DSIR rec decoder + KD consistency, Adam + poly LR — i.e. everything
the reference's hot loop does per iteration (code/train.py:223-331),
including the CPU FFT work its DataLoader workers do.

Baseline: the reference repo publishes no throughput numbers (BASELINE.md).
REF_2080TI_IMGS_PER_SEC is our documented estimate of the torch reference
on its stated hardware (RTX 2080Ti, ~2M-param U-Net, two encoder passes +
two decoders per step at batch 16): ~80 images/sec.  vs_baseline is
reported against that estimate until a measured torch number replaces it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

REF_2080TI_IMGS_PER_SEC = 80.0
WARMUP_STEPS = 5
TIMED_STEPS = 50


def main() -> None:
    import jax

    from ramdsir_tpu.config import TrainConfig
    from ramdsir_tpu.train.state import init_state
    from ramdsir_tpu.train.steps import make_train_step

    cfg = TrainConfig(
        dataset="fundus", ram=True, rec=True, consistency=True,
        consistency_type="kd", image_size=256, domain_idxs=(0, 1, 2),
        test_domain_idx=0, save_path="/tmp/bench",
        compute_dtype="bfloat16",
    ).resolve()
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    bsl = cfg.batch_size_list  # [3, 6, 7] -> global batch 16
    batch_size = sum(bsl)
    step = make_train_step(cfg, models, total_iters=10_000, batch_size_list=bsl)

    rng = np.random.default_rng(0)
    batch = {
        "img": jax.device_put(rng.uniform(0, 255, (batch_size, 256, 256, 3)).astype(np.float32)),
        "donor": jax.device_put(rng.uniform(0, 255, (batch_size, 256, 256, 3)).astype(np.float32)),
        "mask": jax.device_put((rng.uniform(size=(batch_size, 256, 256, 2)) > 0.5).astype(np.float32)),
    }

    key = jax.random.PRNGKey(1)
    for i in range(WARMUP_STEPS):
        state, metrics, _ = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        state, metrics, _ = step(state, batch, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch_size * TIMED_STEPS / dt
    print(
        json.dumps(
            {
                "metric": "fundus RAM-DSIR train throughput (batch 16, 256x256, bf16 compute)",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / REF_2080TI_IMGS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
