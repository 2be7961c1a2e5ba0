"""Op-level breakdown of a jax.profiler trace (the tool behind the
round-2/3 optimization work, promoted from scratch scripts).

Usage:
    python -m ramdsir_tpu.cli.train ... --trace_dir /tmp/tr   # steps 2-12
    python benchmarks/trace_ops.py /tmp/tr [--top 25] [--steps N]

Reads the perfetto trace JSON (plugins/profile/<run>/*.trace.json.gz) that
jax.profiler.start_trace writes, keeps the DEVICE-side complete events
(TensorCore op tracks; host/python rows are dropped), and prints:

  * total device-busy time and, with --steps, ms/step
  * self-time grouped by op CATEGORY (convolution fusions, loop/input
    fusions, data formatting, reduces, FFTs, collectives, ...)
  * the --top individual ops by summed duration

The category heuristics mirror how XLA names TPU thunks: 'fusion' ops
carry their dominant HLO in the name ('%convolution.1234' etc.), so the
name prefix is enough to bucket MXU work vs VPU loop fusions vs copies.

No dependencies beyond the stdlib.  This is a host-side developer tool —
there is nothing TPU-specific to redesign (the reference has no profiling
tooling at all; SURVEY.md §5 row 'Tracing/profiling').
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace_file(trace_dir: str) -> str:
    pats = [
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "*.trace.json.gz"),
    ]
    for p in pats:
        hits = sorted(glob.glob(p, recursive=True))
        if hits:
            return hits[-1]  # newest run dir sorts last (timestamped names)
    raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")


def load_events(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        doc = json.load(f)
    return doc.get("traceEvents", doc if isinstance(doc, list) else [])


# ---- categorize XLA/TPU op names -----------------------------------------

_CATEGORIES = [
    # order matters: more-specific buckets first ('all-reduce' must hit
    # 'collective' before the bare 'reduce' pattern; 'select-and-scatter'
    # before 'scatter/gather'; XLA spells collectives with hyphens)
    ("convolution", r"convolution|conv\b|%conv"),
    ("dot/matmul", r"\bdot\b|dot_general|%dot"),
    ("fft", r"\bfft\b"),
    ("select-and-scatter (pool bwd)", r"select-and-scatter"),
    ("collective", r"all-reduce|all-gather|reduce-scatter|all-to-all|collective|permute"),
    ("reduce", r"reduce"),
    ("data formatting", r"copy|transpose|reshape|bitcast|concatenate|slice|pad\b"),
    ("scatter/gather", r"scatter|gather|dynamic-update"),
    ("rng", r"rng|philox"),
    ("loop/elementwise fusion", r"fusion|loop_"),
]


def categorize(name: str, hlo_category: str = "") -> str:
    # TPU traces label every op event with args['hlo_category'] ("convolution
    # fusion", "loop fusion", "data formatting", ...) — authoritative, use it
    # verbatim.  The name-prefix heuristics below are the fallback for traces
    # without the arg (CPU backend, older jax): fusions are named after their
    # dominant HLO ("%fusion.123 = ... convolution ..."), so test specific
    # ops before the generic fusion bucket.
    if hlo_category:
        return hlo_category
    n = name.lower()
    for cat, pat in _CATEGORIES:
        if re.search(pat, n):
            return cat
    return "other"


def is_device_track(pid_name: str, tid_name: str) -> bool:
    """TPU: per-op events live under a '/device:TPU:N' process on the
    'XLA Ops' / 'TensorCore' threads.  The sibling threads must NOT count:
    'XLA Modules' holds one whole-program event per dispatch (it would
    double every total), 'Async XLA Ops' holds copy-start/done spans that
    overlap real ops, and 'Steps'/'TC Overlay'/'Scalar Unit' are overlays.
    CPU (useful for testing the tool): ops run on the client's
    'tf_XLAPjRtCpuClient/...' executor thread."""
    s = f"{pid_name} {tid_name}".lower()
    if any(
        k in s
        for k in ("python", "steps", "framework", "module", "async", "overlay", "scalar unit")
    ):
        return False
    return any(k in s for k in ("tensorcore", "xla ops", "xlapjrt", "/device:"))


_NOISE = re.compile(
    r"^(end: |ThreadpoolListener|.*::|\$|RunTask|Infeed|Outfeed)", re.IGNORECASE
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=0, help="divide totals by N steps")
    a = ap.parse_args(argv)

    path = find_trace_file(a.trace_dir)
    events = load_events(path)

    # process/thread metadata -> track names
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    by_op = collections.Counter()
    by_cat = collections.Counter()
    total_us = 0.0
    n_events = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e["pid"], "")
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if not is_device_track(pname, tname):
            continue
        name = e.get("name", "?")
        if _NOISE.match(name):
            continue
        dur = float(e["dur"])
        by_op[name] += dur
        by_cat[categorize(name, e.get("args", {}).get("hlo_category", ""))] += dur
        total_us += dur
        n_events += 1

    if not n_events:
        tracks = sorted({f"{pid_names.get(p, p)} / {t}" for (p, _t), t in tid_names.items() for _ in [0]})
        print(f"no device events found in {path}", file=sys.stderr)
        print("tracks seen:", *tracks[:20], sep="\n  ", file=sys.stderr)
        return 1

    print(f"trace: {path}")
    print(f"device events: {n_events}, device-busy total: {total_us / 1e3:.2f} ms")
    if a.steps:
        print(f"  = {total_us / 1e3 / a.steps:.2f} ms/step over {a.steps} steps")
    print("\nby category:")
    for cat, us in by_cat.most_common():
        print(f"  {us / 1e3:10.2f} ms  {100 * us / total_us:5.1f}%  {cat}")
    print(f"\ntop {a.top} ops:")
    for name, us in by_op.most_common(a.top):
        print(f"  {us / 1e3:10.2f} ms  {100 * us / total_us:5.1f}%  {name[:110]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
