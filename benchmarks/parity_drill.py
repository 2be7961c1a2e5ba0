"""Real-data Dice/HD95/ASD parity drill vs a reference checkpoint.

The accuracy half of the north star (>= 95% of the reference's Dice/ASD on
every held-out domain) needs real DoFE fundus / SAML prostate data, which
does not ship with either repo.  This script is the ONE documented command
to run the comparison the moment a dataset root and a reference-trained
`.pth` exist:

    python benchmarks/parity_drill.py --dataset fundus \
        --data_dir /path/to/fundus --model_file /path/to/model_XX.pth \
        --test_domain_idx 3 \
        --expect cup_dice=0.85 disc_dice=0.94 asd_oc=3.2 asd_od=2.1

    python benchmarks/parity_drill.py --dataset prostate \
        --data_dir /path/to/prostate --model_file final_model.pth \
        --test_domain_idx 0 --expect dice=0.88 asd=1.5

It drives the SAME eval CLI the reference provides (cli/test_fundus_slice /
cli/test_prostate_volume — flag-compatible with the reference's
test_fundus_slice.py:26-44 / test_prostate_volume.py:20-38, including the
default BN-adaptation mode), loading the torch checkpoint through
utils/torch_compat (round-trip-tested in tests/test_compat_viz.py).  The
--expect values are the reference's own numbers for the same checkpoint +
split (from its CSV logs, stdout, or the paper tables); the drill prints a
side-by-side table and a PASS/FAIL verdict per metric:

  * Dice: ours >= 0.95 * reference        (higher is better)
  * HD95/ASD: ours <= reference / 0.95    (lower is better)

Without --expect it still runs the eval and prints our numbers (useful as
the first half of the drill, or to fill the table by hand).

Smoke-tested end-to-end on synthetic trees with an exported torch
checkpoint in tests/test_parity_drill.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

FUNDUS_METRICS = ("cup_dice", "disc_dice", "hd_oc", "hd_od", "asd_oc", "asd_od")
PROSTATE_METRICS = ("dice", "hd", "asd")
HIGHER_IS_BETTER = {"cup_dice", "disc_dice", "dice"}
NORTH_STAR = 0.95


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dataset", choices=("fundus", "prostate"), required=True)
    p.add_argument("--data_dir", required=True, help="dataset root (the reference layout)")
    p.add_argument("--model_file", required=True,
                   help="checkpoint: reference .pth or our .ckpt — both load")
    p.add_argument("--test_domain_idx", type=int, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--image_size", type=int, default=256, help="fundus eval size")
    p.add_argument("--freeze_bn", action="store_true",
                   help="disable the reference's default BN test-adaptation")
    p.add_argument("--out_dir", default="/tmp/parity_drill")
    p.add_argument(
        "--expect", nargs="*", default=[], metavar="METRIC=VALUE",
        help="the reference's numbers for the same ckpt+split, e.g. "
             "cup_dice=0.85 disc_dice=0.94 (Dice in [0,1]; HD/ASD in px/mm)",
    )
    p.add_argument("--json", action="store_true", help="also print one JSON line")
    return p.parse_args(argv)


def run_eval(a):
    """Invoke the flag-compatible eval CLI; returns its result object."""
    argv = [
        "--model_file", a.model_file,
        "--data_dir", a.data_dir,
        "--datasetTest", str(a.test_domain_idx),
        "--batch_size", str(a.batch_size),
        "--test_prediction_save_path", a.out_dir,
    ]
    if a.freeze_bn:
        argv.append("--freeze_bn")
    if a.dataset == "fundus":
        from ramdsir_tpu.cli.test_fundus_slice import main

        return main(argv + ["--image_size", str(a.image_size)])
    from ramdsir_tpu.cli.test_prostate_volume import main

    return main(argv)


def build_table(dataset, res, expect):
    metrics = FUNDUS_METRICS if dataset == "fundus" else PROSTATE_METRICS
    rows = []
    for m in metrics:
        ours = float(getattr(res, m))
        ref = expect.get(m)
        if ref is None:
            rows.append(dict(metric=m, ours=ours, reference=None, ratio=None, verdict="n/a"))
            continue
        if m in HIGHER_IS_BETTER:
            ratio = ours / ref if ref else float("inf")
            ok = ratio >= NORTH_STAR
        else:
            ratio = ref / ours if ours else float("inf")
            ok = ours <= ref / NORTH_STAR
        rows.append(dict(metric=m, ours=ours, reference=ref,
                         ratio=ratio, verdict="PASS" if ok else "FAIL"))
    return rows


def print_table(rows, dataset, test_domain_idx):
    print(f"\n== parity drill: {dataset}, held-out domain {test_domain_idx} ==")
    print(f"{'metric':<10} {'ours':>10} {'reference':>10} {'ratio':>8}  verdict")
    for r in rows:
        ref = f"{r['reference']:.4f}" if r["reference"] is not None else "-"
        ratio = f"{r['ratio']:.3f}" if r["ratio"] is not None else "-"
        print(f"{r['metric']:<10} {r['ours']:>10.4f} {ref:>10} {ratio:>8}  {r['verdict']}")
    judged = [r for r in rows if r["verdict"] != "n/a"]
    if judged:
        overall = "PASS" if all(r["verdict"] == "PASS" for r in judged) else "FAIL"
        print(f"north star (>= {NORTH_STAR:.0%} of reference on every metric): {overall}")
        return overall
    print("no --expect values given: fill the reference column from the "
          "reference run's CSV/stdout and re-run with --expect")
    return None


def main(argv=None):
    a = parse_args(argv)
    expect = {}
    for kv in a.expect:
        k, _, v = kv.partition("=")
        valid = FUNDUS_METRICS if a.dataset == "fundus" else PROSTATE_METRICS
        if k not in valid:
            sys.exit(f"--expect {k!r}: unknown metric (choose from {valid})")
        expect[k] = float(v)
    os.makedirs(a.out_dir, exist_ok=True)
    res = run_eval(a)
    rows = build_table(a.dataset, res, expect)
    overall = print_table(rows, a.dataset, a.test_domain_idx)
    if a.json:
        print(json.dumps({"dataset": a.dataset, "domain": a.test_domain_idx,
                          "rows": rows, "overall": overall}))
    if overall == "FAIL":
        sys.exit(1)
    return rows


if __name__ == "__main__":
    main()
