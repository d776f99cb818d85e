"""Isolate what makes the router write path slow vs a plain exchange+write:
A = single relation, hash exchange, flat write        (fast baseline)
B = A + partitionBy(ts_day)                           (dyn-partition writer)
C = union-of-children relation, hash exchange, flat   (union cost)
D = C + read_data_files wrapper                        (engine scan cost)
E = full router (labels + search tree) flat write      (router expr cost)
F = full router + partitionBy                          (= engine path)
2 interleaved trials each, report min.

Usage: python scripts/profile_router_isolate.py <template_root> <cpus>
"""

from __future__ import annotations

import functools
import json
import os
import shutil
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")

from pyspark.sql import functions as F

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.functions.ranging import (
    allocate_buckets, bucket_search_tree, inverse_hash_labels, slice_grid,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators import clustering as CL
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators import compaction as C
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.clustering import (
    cluster_key_column,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.ledger import (
    split_size_for_rewrites,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.session import get_spark


def main():
    template_root, cpus = sys.argv[1], int(sys.argv[2])
    loc = os.path.join(template_root, "t")
    spark = get_spark(parallelism=cpus, shuffle_partitions=max(cpus, 8),
                      app_name=f"pri-{cpus}")
    table = Table.load(spark, loc)
    if table.current_snapshot().summary.get("job") != "compact":
        C.CompactionJob(table, max_concurrency=min(16, cpus)).run()
        table.refresh()

    some = [f.path for f in table.live_data_files()[:4]]
    warm = os.path.join(template_root, f"iw{cpus}")
    spark.read.parquet(*some).limit(50000).write.mode("overwrite").parquet(warm)
    shutil.rmtree(warm, ignore_errors=True)

    job = CL.ClusteringJob(table, curve="zorder")
    plans = job._plan()
    files = [f for p in plans for f in p.input_files]
    turn_range, ts_range = CL.dimension_ranges(files)
    key = cluster_key_column("zorder", conv_col=job.conv_col,
                             turn_col=job.turn_col, ts_col=job.ts_col,
                             turn_range=turn_range, ts_us_range=ts_range)
    paths = [f.path for f in files]
    group = C.group_plans(plans, 64)[0]
    dels, eqdels = table.live_delete_files(), table.live_eq_delete_files()
    n = max(1, group.n_output_files)
    total_rows = sum(f.record_count for f in files)

    with split_size_for_rewrites(spark, 32 * 1024 * 1024):
        single = spark.read.schema(table.schema).parquet(*paths) \
            .withColumn("_k", key)

        def mk_children(wrap_engine):
            def child(i_plan):
                i, plan = i_plan
                if wrap_engine:
                    df = table.read_data_files(plan.input_files,
                                               delete_files=dels,
                                               eq_delete_files=eqdels)
                else:
                    df = spark.read.schema(table.schema).parquet(
                        *[f.path for f in plan.input_files])
                return df.withColumn("_pidx", F.lit(i))
            with ThreadPoolExecutor(max_workers=16) as pool:
                cs = list(pool.map(child, enumerate(group.plans)))
            return functools.reduce(lambda a, b: a.unionByName(b), cs), len(cs)

        union_plain, nc = mk_children(False)
        union_engine, _ = mk_children(True)

        def routed_df(un_raw):
            un = un_raw.withColumn("_k", key)
            grid_points = min(512, max(32, 2 * max(
                p.n_output_files for p in group.plans)))
            fr = [i / grid_points for i in range(1, grid_points)]
            frac = min(1.0, 400_000 / max(1, total_rows))
            narrow = (un_raw if frac >= 1.0
                      else un_raw.sample(False, frac, seed=42)).withColumn("_k", key)
            stat_rows = (narrow.groupBy("_pidx")
                         .agg(F.percentile_approx("_k",
                              F.array(*[F.lit(f) for f in fr]),
                              F.lit(2000)).alias("_grid"),
                              F.count(F.lit(1)).alias("_rows")).collect())
            stats = {r["_pidx"]: (list(r["_grid"] or []), r["_rows"])
                     for r in stat_rows}
            allocs = allocate_buckets(n, [stats.get(i, ([], 0))[1]
                                          for i in range(nc)])
            child_bounds = [slice_grid(stats.get(i, ([], 0))[0], allocs[i])
                            for i in range(nc)]
            bases, b0 = [], 0
            for b in child_bounds:
                bases.append(b0)
                b0 += len(b) + 1
            labels = inverse_hash_labels(b0)
            label_arr = F.array(*[F.lit(int(l)).cast("int") for l in labels])

            def pidx_tree(lo, hi):
                if lo == hi:
                    return bucket_search_tree(F.col("_k"), child_bounds[lo],
                                              bases[lo])
                mid = (lo + hi) // 2
                return F.when(F.col("_pidx") <= F.lit(mid),
                              pidx_tree(lo, mid)).otherwise(
                                  pidx_tree(mid + 1, hi))

            return un.withColumn("_rl", F.element_at(
                label_arr, pidx_tree(0, nc - 1).cast("int") + F.lit(1))), b0

        out = os.path.join(template_root, f"io-{cpus}")

        def wr(df, part=False):
            w = df.write.mode("overwrite")
            if part:
                w = w.partitionBy("ts_day")
            w.parquet(out)

        cases = {}
        cases["A_single_hash_flat"] = lambda: wr(
            single.repartition(n, "_k").sortWithinPartitions("_k").drop("_k"))
        cases["B_single_hash_partby"] = lambda: wr(
            table.spec.with_partition_columns(single)
            .repartition(n, "_k").sortWithinPartitions("ts_day", "_k")
            .drop("_k"), part=True)
        cases["C_union_hash_flat"] = lambda: wr(
            union_plain.withColumn("_k", key)
            .repartition(n, "_k").sortWithinPartitions("_k")
            .drop("_k", "_pidx"))
        cases["D_unionengine_hash_flat"] = lambda: wr(
            union_engine.withColumn("_k", key)
            .repartition(n, "_k").sortWithinPartitions("_k")
            .drop("_k", "_pidx"))

        def e_case():
            df, b0 = routed_df(union_plain)
            wr(df.repartition(b0, F.col("_rl")).sortWithinPartitions("_k")
               .drop("_k", "_rl", "_pidx"))
        cases["E_router_flat"] = e_case

        def f_case():
            df, b0 = routed_df(union_engine)
            df = table.spec.with_partition_columns(df)
            wr(df.repartition(b0, F.col("_rl"))
               .sortWithinPartitions("ts_day", "_k")
               .drop("_k", "_rl", "_pidx"), part=True)
        cases["F_router_engine"] = f_case

        T = {"cpus": cpus, "n_children": nc}
        for trial in range(2):
            for name, fn in cases.items():
                t0 = time.time()
                fn()
                dt = time.time() - t0
                T[name] = round(min(T.get(name, 1e9), dt), 2)
        shutil.rmtree(out, ignore_errors=True)
    print(json.dumps(T))
    spark.stop()


if __name__ == "__main__":
    main()
