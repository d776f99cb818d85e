"""Physical-plan audit for the headline queries.

Prints, per query, the scale-relevant facts of the plan Catalyst actually
chose: exchange (shuffle) count, broadcast joins, parquet pushed filters,
read schemas (column pruning), whole-stage-codegen span count, and any
cartesian products (which should never appear). Output is the raw material
for docs/PLANS.md.

Usage: python scripts/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_ocsf_cyber_lakehouse_blueprint_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

# Queries whose plan is the query itself (not a maintenance side effect).
DEFAULT = [
    "bronze_ingest", "silver_extract", "gold_case_route", "union_by_name",
    "window_dedup", "turn_numbering", "agg_pricing_summary", "join_top_orders",
    "join_broadcast_dim", "anti_join_gc", "stats_census", "dedup_exact",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard", "text_stats",
    "text_quality", "text_rolling_fp", "sim_topk", "sim_pairs_lsh",
    "sim_lsh_topk", "sim_ivf_topk", "scan_checksum",
]


def audit(df) -> dict:
    jvm = df.sparkSession._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    def nodes(name: str) -> int:
        # formatted mode shows each node in the tree AND a "(n) Name" detail
        # header; count the headers so every physical node counts once.
        return len(re.findall(rf"\(\d+\) {name}", plan))

    facts = {
        "exchanges": nodes("Exchange"),
        "broadcast_joins": nodes("BroadcastHashJoin"),
        "sortmerge_joins": nodes("SortMergeJoin"),
        "hash_aggregates": nodes("HashAggregate"),
        "codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "cartesian": nodes("CartesianProduct") + nodes("BroadcastNestedLoopJoin"),
        "python_udf_nodes": nodes("BatchEvalPython") + nodes("ArrowEvalPython"),
        "pushed_filters": sorted(set(
            m.strip() for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
            if m.strip()
        )),
        "read_schemas": sorted(set(re.findall(r"ReadSchema: (struct<[^\n]*)", plan))),
    }
    return facts


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    names = names or DEFAULT
    spark = get_spark(parallelism=8, shuffle_partitions=8, app_name="plan-audit")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        facts = audit(df)
        print(f"\n== {name}")
        for k, v in facts.items():
            if k in ("pushed_filters", "read_schemas"):
                for item in v:
                    print(f"   {k[:-1]}: {item[:140]}")
            else:
                print(f"   {k}: {v}")
        if facts["cartesian"]:
            print("   !! CARTESIAN/NESTED-LOOP PRESENT")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
