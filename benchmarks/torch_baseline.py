"""Measured + derived reference (torch) baseline for `vs_baseline`.

Round 1 divided by a hand-waved 80 img/s "documented estimate".  This tool
replaces it with numbers a reviewer can check:

1. MEASURE the reference's full train step (dual forward, DSIR rec decoder
   per domain, BCE+dice x2, KD consistency, MSE rec, backward, Adam) in
   torch on THIS machine's CPU — the same step our jitted TPU step runs.
   The model is the independent torch build from tests/test_torch_parity.py
   (written from the reference's topology, not copied).
2. COUNT the step's conv FLOPs analytically (convs dominate; everything
   else is < 2%).
3. DERIVE an RTX 2080Ti estimate with an explicit roofline argument:
   img/s = batch / (step_FLOPs / (efficiency * peak_FLOPS)).  2080Ti fp32
   peak = 13.45 TFLOPS (NVIDIA spec); cuDNN conv efficiency on small-channel
   3x3 convs is well documented at 30-50% of peak — we take both endpoints
   and also report the midpoint used by bench.py.

Run:  python benchmarks/torch_baseline.py [--steps 8] [--batch 16]
Writes benchmarks/torch_baseline.json and prints a summary.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import torch
import torch.nn.functional as tF

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_torch_parity import TDecoder, TEncoder, TRecDecoder  # noqa: E402


def dice_loss(pred, target, smooth=1e-5):
    """reference utils/losses.py:8-16 (squared-sum denominator)."""
    pred = pred.reshape(pred.shape[0], -1)
    target = target.reshape(target.shape[0], -1)
    inter = (pred * target).sum(1)
    den = (pred * pred).sum(1) + (target * target).sum(1)
    return (1 - (2 * inter + smooth) / (den + smooth)).mean()


def kd(p, q, T=1):
    """reference train.py:85-88 symmetric KL on sigmoid maps."""
    return (
        tF.kl_div(torch.log(p), q, reduction="batchmean")
        + tF.kl_div(torch.log(q), p, reduction="batchmean")
    )


def reference_train_step(enc, seg, rec, opt, img, img_freq, mask, bsl):
    """One full RAM-DSIR fundus step (reference train.py:244-287)."""
    bce = torch.nn.BCELoss()
    mse = torch.nn.MSELoss()
    feats = enc(img)
    pred1 = torch.sigmoid(seg(feats))
    loss = bce(pred1, mask) + dice_loss(pred1, mask)

    feats_f = enc(img_freq)
    pred2 = torch.sigmoid(seg(feats_f))
    loss = loss + bce(pred2, mask) + dice_loss(pred2, mask)
    loss = loss + 0.5 * kd(pred2.clamp_min(1e-8), pred1.clamp_min(1e-8))

    left = 0
    for d, bs in enumerate(bsl):
        right = left + bs
        out = torch.tanh(rec(feats_f[-1][left:right], d))
        loss = loss + 0.1 * mse(out, img[left:right])
        left = right

    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss.detach())


def conv_flops_fundus_step(batch=16, s=256, n=16, c=3, num_classes=2):
    """Analytic conv MACs for the step above (x2 FLOPs/MAC, x3 fwd+bwd)."""

    def conv(cin, cout, k, hw):
        return cin * cout * k * k * hw * hw

    macs = 0.0
    # encoder: stage i at resolution s/2^i, channels n*2^i; 3 convs each
    cin = c
    for i in range(5):
        cout = n * (2 ** i)
        hw = s // (2 ** i)
        macs += conv(cin, cout, 3, hw) + 2 * conv(cout, cout, 3, hw)
        cin = cout
    enc_macs = macs
    # seg decoder: TUp(16n first), TUp(8n), TUp(4n), TUp(2n), head
    dec = 0.0
    for i, planes in enumerate([16 * n, 8 * n, 4 * n, 2 * n]):
        hw_in = s // (2 ** (4 - i))       # input resolution of the stage
        if i > 0:
            dec += conv(2 * planes, planes, 3, hw_in)
        dec += conv(planes, planes // 2, 1, hw_in * 2)
        dec += conv(planes, planes, 3, hw_in * 2)
    dec += conv(2 * n, num_classes, 3, s)
    # rec decoder: TUpRec(16n..2n) + head at full res
    recm = 0.0
    for i, planes in enumerate([16 * n, 8 * n, 4 * n, 2 * n]):
        hw_in = s // (2 ** (4 - i))
        half = planes // 2
        recm += conv(planes, half, 3, hw_in)
        recm += conv(half, half, 1, hw_in * 2)
        recm += conv(half, half, 3, hw_in * 2)
    recm += conv(n, 3, 3, s)

    # step = 2 encoder fwd + 2 seg fwd + 1 rec fwd, backward ~2x forward
    fwd = 2 * enc_macs + 2 * dec + recm
    total_macs = 3 * fwd  # fwd + bwd(2x)
    return batch * total_macs * 2  # FLOPs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    a = ap.parse_args()

    torch.manual_seed(0)
    enc, seg, rec = TEncoder(), TDecoder(), TRecDecoder(domains=3)
    params = (
        [{"params": enc.parameters(), "lr": 1e-3}]
        + [{"params": seg.parameters(), "lr": 2e-3}]
        + [{"params": rec.parameters(), "lr": 2e-3}]
    )
    opt = torch.optim.Adam(params, lr=2e-3, betas=(0.9, 0.99))

    g = torch.Generator().manual_seed(0)
    img = torch.rand((a.batch, 3, a.size, a.size), generator=g) * 2 - 1
    img_freq = torch.rand((a.batch, 3, a.size, a.size), generator=g) * 2 - 1
    mask = (torch.rand((a.batch, 2, a.size, a.size), generator=g) > 0.5).float()
    bsl = [3, 6, 7] if a.batch == 16 else [a.batch // 3, a.batch // 3, a.batch - 2 * (a.batch // 3)]

    for _ in range(a.warmup):
        reference_train_step(enc, seg, rec, opt, img, img_freq, mask, bsl)
    t0 = time.perf_counter()
    for _ in range(a.steps):
        reference_train_step(enc, seg, rec, opt, img, img_freq, mask, bsl)
    dt = (time.perf_counter() - t0) / a.steps

    flops = conv_flops_fundus_step(a.batch, a.size)
    cpu_img_s = a.batch / dt
    cpu_eff = flops / dt / 1e12  # achieved TFLOPS on this CPU

    PEAK_2080TI = 13.45e12  # fp32, NVIDIA spec
    est = {
        f"rtx2080ti_est_img_s_eff{int(e*100)}": a.batch / (flops / (e * PEAK_2080TI))
        for e in (0.3, 0.4, 0.5)
    }
    out = {
        "machine_cpu_threads": torch.get_num_threads(),
        "torch_version": torch.__version__,
        "batch": a.batch,
        "size": a.size,
        "cpu_step_seconds": dt,
        "cpu_img_per_sec": cpu_img_s,
        "step_tflops": flops / 1e12,
        "cpu_achieved_tflops": cpu_eff,
        **est,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "torch_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
