"""A/B probe: write/shuffle-path config variants on the scaling protocol's arms.

Interleaves variants round-robin (same estimator rationale as the scaling
batches: host steal is one-sided noise, so per-variant best-of across
interleaved rounds is the capacity comparison), reusing a prepared pristine
template (``bench.py --prepare-template``). Each trial is a fresh JVM running
``bench.py --use-template --cpus N``; variant confs ride ``PYSPARK_SUBMIT_ARGS``
(only valid for confs the session builder does NOT pin — pinned confs override
submit-args defaults).

Motivation (BENCH/METHODOLOGY_r3.md): the big arm's residual scaling loss
lives in the distributed write/shuffle phases (busy-but-slower at 8 threads —
single-socket memory-bandwidth/GC contention). Variants that cut per-row
memory traffic should help the contended arm disproportionately:

- ``nodict``: parquet dictionary OFF for the high-entropy ``text`` column
  (dictionary trial on ~unique strings is allocation churn that is always
  abandoned at the page threshold); low-cardinality columns keep theirs.
- ``noshufcomp``: shuffle block + spill compression OFF — shuffle dirs are
  tmpfs in the protocol, so lz4 there is pure CPU, not saved I/O.
- ``combo``: both.

Usage:
    python scripts/probe_write_variants.py --template-root /dev/shm/tmpl4x \
        --rounds 2 --cpus 8 --out BENCH/probe_write.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS: dict[str, list[str]] = {
    "plain": [],
    "nodict": ["--conf", "spark.hadoop.parquet.enable.dictionary#text=false"],
    "noshufcomp": [
        "--conf", "spark.shuffle.compress=false",
        "--conf", "spark.shuffle.spill.compress=false",
    ],
    "combo": [
        "--conf", "spark.hadoop.parquet.enable.dictionary#text=false",
        "--conf", "spark.shuffle.compress=false",
        "--conf", "spark.shuffle.spill.compress=false",
    ],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--template-root", required=True)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--cpus", type=int, nargs="+", default=[8])
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    ap.add_argument("--out", default=None,
                    help="append jsonl here (default stdout only)")
    args = ap.parse_args()

    sink = open(args.out, "a") if args.out else None

    def emit(obj: dict) -> None:
        line = json.dumps(obj)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()

    for rnd in range(1, args.rounds + 1):
        for name in args.variants:
            confs = VARIANTS[name]
            for cpus in args.cpus:
                env = dict(os.environ)
                env.setdefault("SPARK_DRIVER_MEMORY", "16g")
                env.pop("SPARK_GRAFT_TIMING", None)
                if confs:
                    env["PYSPARK_SUBMIT_ARGS"] = " ".join(confs) + " pyspark-shell"
                else:
                    env.pop("PYSPARK_SUBMIT_ARGS", None)
                proc = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py"),
                     "--use-template", args.template_root, "--cpus", str(cpus)],
                    capture_output=True, text=True, timeout=3600, env=env,
                )
                lines = [l for l in proc.stdout.strip().splitlines()
                         if l.startswith("{")]
                if not lines:
                    emit({"variant": name, "round": rnd, "cpus": cpus,
                          "error": proc.stderr[-800:]})
                    continue
                emit({"variant": name, "round": rnd,
                      "run": json.loads(lines[-1])})


if __name__ == "__main__":
    main()
