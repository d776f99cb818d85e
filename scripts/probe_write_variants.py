"""A/B probe: write/shuffle-path config variants on the scaling protocol's arms.

Interleaves variants round-robin (same estimator rationale as the scaling
batches: host steal is one-sided noise, so per-variant best-of across
interleaved rounds is the capacity comparison), reusing a prepared pristine
template (``bench.py --prepare-template``). Each trial is a fresh JVM running
``bench.run_core_from_template`` with the variant's confs injected two ways:

- ``submit``: ``PYSPARK_SUBMIT_ARGS --conf`` — works for confs the session
  builder does NOT pin (pinned confs override submit-args defaults);
- ``extra``: patched into ``session.get_spark(extra_conf=...)`` inside the
  trial subprocess — later ``.config`` wins, so this overrides pinned confs
  (parquet codec).

Motivation (BENCH/METHODOLOGY_r3.md): the big arm's residual scaling loss
lives in the distributed write/shuffle phases (busy-but-slower at 8 threads —
single-socket memory-bandwidth/GC contention). Variants that cut per-row
memory traffic / encode CPU should help the contended arm disproportionately:

- ``nodict``: parquet dictionary OFF for the high-entropy ``text`` column
  (dictionary trial on ~unique strings is allocation churn abandoned at the
  page threshold); low-cardinality columns keep theirs.
- ``noshufcomp``: shuffle block + spill compression OFF — shuffle dirs are
  tmpfs in the protocol, so lz4 there is CPU without saved I/O.
- ``lz4raw`` / ``zstd1``: parquet codec swap for snappy on the write path.

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

# name -> (submit_confs, extra_confs)
VARIANTS: dict[str, tuple[list[str], dict[str, str]]] = {
    "plain": ([], {}),
    "nodict": (["spark.hadoop.parquet.enable.dictionary#text=false"], {}),
    "noshufcomp": (
        ["spark.shuffle.compress=false", "spark.shuffle.spill.compress=false"],
        {},
    ),
    "lz4raw": ([], {"spark.sql.parquet.compression.codec": "lz4_raw"}),
    "zstd1": ([], {"spark.sql.parquet.compression.codec": "zstd",
                   "spark.hadoop.parquet.compression.codec.zstd.level": "1"}),
    "combo": (
        ["spark.hadoop.parquet.enable.dictionary#text=false",
         "spark.shuffle.compress=false", "spark.shuffle.spill.compress=false"],
        {},
    ),
    # second set: page/split geometry (real cluster tuning, not sandbox-only)
    "page8m": (["spark.hadoop.parquet.page.size=8388608"], {}),
    "nocrc": (["spark.hadoop.parquet.page.write-checksum.enabled=false"], {}),
    "maxpart64m": ([], {"spark.sql.files.maxPartitionBytes": "67108864"}),
}

_DRIVER = """
import json, os, sys
sys.path.insert(0, {repo!r})
import e2e_ocsf_cyber_lakehouse_blueprint_spark.session as S
_orig = S.get_spark
def _patched(*a, **kw):
    ec = dict(kw.pop("extra_conf", None) or {{}})
    ec.update(json.loads(os.environ.get("PROBE_EXTRA_CONF", "{{}}")))
    return _orig(*a, extra_conf=ec, **kw)
S.get_spark = _patched
import bench
print(json.dumps(bench.run_core_from_template(sys.argv[1], int(sys.argv[2]))))
""".format(repo=REPO)


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
            submit, extra = VARIANTS[name]
            for cpus in args.cpus:
                env = dict(os.environ)
                env.setdefault("SPARK_DRIVER_MEMORY", "16g")
                env.pop("SPARK_GRAFT_TIMING", None)
                if submit:
                    env["PYSPARK_SUBMIT_ARGS"] = " ".join(
                        f"--conf {c}" for c in submit) + " pyspark-shell"
                else:
                    env.pop("PYSPARK_SUBMIT_ARGS", None)
                env["PROBE_EXTRA_CONF"] = json.dumps(extra)
                proc = subprocess.run(
                    [sys.executable, "-c", _DRIVER,
                     args.template_root, str(cpus)],
                    capture_output=True, text=True, timeout=3600, env=env,
                    cwd=REPO,
                )
                lines = [l for l in proc.stdout.strip().splitlines()
                         if l.startswith("{")]
                if not lines:
                    emit({"variant": name, "round": rnd, "cpus": cpus,
                          "error": proc.stderr[-800:]})
                    continue
                emit({"variant": name, "round": rnd, "cpus": cpus,
                      "run": json.loads(lines[-1])})


if __name__ == "__main__":
    main()
