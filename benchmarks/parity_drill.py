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

SWEEP MODE — the full north-star table in one command.  Given a directory
of per-target checkpoints (the reference protocol trains one model per
held-out domain: 4 fundus + 6 prostate runs, train.py:47-56), sweep every
leave-one-out target and print the combined side-by-side table:

    python benchmarks/parity_drill.py --dataset fundus --sweep \
        --data_dir /path/to/fundus --ckpt_dir /path/to/ckpts \
        --expect_file refs.json

`--ckpt_dir` is searched per domain N for (first hit wins):
`target{N}.pth|.ckpt`, `{N}.pth|.ckpt`, `target{N}/final_model.*`,
`{N}/final_model.*`, and `model_*.pth|.ckpt` inside those subdirs (the
reference's keep-best naming, train.py:340-352).  `--expect_file` is a
JSON map {"<domain>": {"cup_dice": 0.85, ...}, ...} holding the
reference's numbers per split (same metric names as --expect).

Smoke-tested end-to-end on synthetic trees with an exported torch
checkpoint in tests/test_parity_drill.py (incl. the sweep).
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
    p.add_argument("--model_file", default=None,
                   help="checkpoint: reference .pth or our .ckpt — both load")
    p.add_argument("--test_domain_idx", type=int, default=None)
    p.add_argument("--sweep", action="store_true",
                   help="run EVERY leave-one-out target (4 fundus / 6 prostate)")
    p.add_argument("--ckpt_dir", default=None,
                   help="sweep mode: directory of per-target checkpoints")
    p.add_argument("--expect_file", default=None,
                   help="sweep mode: JSON {domain: {metric: reference_value}}")
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


def find_checkpoint(ckpt_dir: str, idx: int):
    """Locate domain `idx`'s checkpoint under the documented conventions."""
    import glob

    for name in (f"target{idx}.pth", f"target{idx}.ckpt", f"{idx}.pth", f"{idx}.ckpt"):
        p = os.path.join(ckpt_dir, name)
        if os.path.exists(p):
            return p
    for sub in (f"target{idx}", str(idx)):
        d = os.path.join(ckpt_dir, sub)
        if not os.path.isdir(d):
            continue
        for name in ("final_model.pth", "final_model.ckpt"):
            p = os.path.join(d, name)
            if os.path.exists(p):
                return p
        best = sorted(glob.glob(os.path.join(d, "model_*.pth"))
                      + glob.glob(os.path.join(d, "model_*.ckpt")))
        if best:
            return best[-1]  # keep-best leaves exactly one; sort is a tiebreak
    return None


def run_sweep(a):
    """All leave-one-out targets; returns (per-domain rows, overall)."""
    n_domains = 4 if a.dataset == "fundus" else 6
    expect_all = {}
    if a.expect_file:
        with open(a.expect_file) as f:
            expect_all = {int(k): v for k, v in json.load(f).items()}
    results, verdicts = {}, []
    for idx in range(n_domains):
        ckpt = a.model_file or (a.ckpt_dir and find_checkpoint(a.ckpt_dir, idx))
        if not ckpt:
            print(f"domain {idx}: no checkpoint found in {a.ckpt_dir!r} — skipped")
            results[idx] = None
            continue
        sub = argparse.Namespace(**{**vars(a), "test_domain_idx": idx,
                                    "model_file": ckpt,
                                    "out_dir": os.path.join(a.out_dir, f"target{idx}")})
        os.makedirs(sub.out_dir, exist_ok=True)
        res = run_eval(sub)
        rows = build_table(a.dataset, res, expect_all.get(idx, {}))
        results[idx] = rows
        verdicts.append(print_table(rows, a.dataset, idx))
    judged = [v for v in verdicts if v is not None]
    overall = ("PASS" if all(v == "PASS" for v in judged) else "FAIL") if judged else None
    ran = [r for r in results.values() if r is not None]
    print(f"\n== sweep: {len(ran)}/{n_domains} targets ran; "
          f"north star overall: {overall or 'n/a (no --expect_file)'} ==")
    return results, overall


def main(argv=None):
    a = parse_args(argv)
    os.makedirs(a.out_dir, exist_ok=True)
    if a.sweep:
        if not (a.ckpt_dir or a.model_file):
            sys.exit("--sweep needs --ckpt_dir (or a single --model_file)")
        results, overall = run_sweep(a)
        if a.json:
            print(json.dumps({"dataset": a.dataset, "sweep": True,
                              "rows": results, "overall": overall}))
        if overall == "FAIL":
            sys.exit(1)
        return results
    if a.model_file is None or a.test_domain_idx is None:
        sys.exit("single mode needs --model_file and --test_domain_idx "
                 "(or use --sweep)")
    expect = {}
    for kv in a.expect:
        k, _, v = kv.partition("=")
        valid = FUNDUS_METRICS if a.dataset == "fundus" else PROSTATE_METRICS
        if k not in valid:
            sys.exit(f"--expect {k!r}: unknown metric (choose from {valid})")
        expect[k] = float(v)
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
