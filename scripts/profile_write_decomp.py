"""Decompose the clustering main write job: read/key -> +shuffle -> +sort ->
+parquet encode -> +partitionBy, each as a separate timed job, at a given
parallelism. Finds WHERE the non-scaling wall time lives.

Usage: python scripts/profile_write_decomp.py <template_root> <cpus>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")

from pyspark.sql import functions as F

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
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
    if not os.path.isdir(os.path.join(loc, "metadata")) or \
            os.environ.get("FORCE_RESTORE") == "1":
        shutil.rmtree(loc, ignore_errors=True)
        shutil.copytree(os.path.join(template_root, "pristine"), loc)
    spark = get_spark(parallelism=cpus, shuffle_partitions=max(cpus, 8),
                      app_name=f"pwd-{cpus}")
    table = Table.load(spark, loc)
    if not table.current_snapshot().summary.get("job") == "compact":
        C.CompactionJob(table, max_concurrency=min(16, cpus)).run()
        table.refresh()

    # warm
    some = [f.path for f in table.live_data_files()[:4]]
    warm = os.path.join(template_root, f"dw{cpus}")
    spark.read.parquet(*some).limit(50000).write.mode("overwrite").parquet(warm)
    (spark.read.parquet(warm).repartitionByRange(4, "conv_id", "turn_idx")
     .sortWithinPartitions("conv_id").write.mode("overwrite").parquet(warm + "2"))
    shutil.rmtree(warm, ignore_errors=True); shutil.rmtree(warm + "2", ignore_errors=True)

    job = CL.ClusteringJob(table, curve="zorder")
    plans = job._plan()
    files = [f for p in plans for f in p.input_files]
    turn_range, ts_range = CL.dimension_ranges(files)
    key = cluster_key_column("zorder", conv_col=job.conv_col,
                             turn_col=job.turn_col, ts_col=job.ts_col,
                             turn_range=turn_range, ts_us_range=ts_range)
    paths = [f.path for f in files]
    nbytes = sum(f.file_size_bytes for f in files)
    n = 51
    T = {"n_files": len(paths), "gb": round(nbytes / 2**30, 2), "cpus": cpus}

    def t(name, fn):
        t0 = time.time()
        fn()
        T[name] = round(time.time() - t0, 2)

    with split_size_for_rewrites(spark, 32 * 1024 * 1024):
        base = spark.read.schema(table.schema).parquet(*paths)
        keyed = base.withColumn("_k", key)
        t("1_read_key_noop", lambda: keyed.write.format("noop")
          .mode("overwrite").save())
        t("2_plus_shuffle_noop", lambda: keyed.repartition(n, "_k")
          .write.format("noop").mode("overwrite").save())
        t("3_plus_sort_noop", lambda: keyed.repartition(n, "_k")
          .sortWithinPartitions("_k").write.format("noop").mode("overwrite").save())
        out1 = os.path.join(template_root, f"o1-{cpus}")
        t("4_parquet_flat", lambda: keyed.repartition(n, "_k")
          .sortWithinPartitions("_k").drop("_k")
          .write.mode("overwrite").parquet(out1))
        out2 = os.path.join(template_root, f"o2-{cpus}")
        t("5_parquet_partitionBy", lambda: keyed.repartition(n, "_k")
          .sortWithinPartitions("_k").drop("_k")
          .withColumn("ts_day", F.date_format("ts", "yyyy-MM-dd"))
          .write.partitionBy("ts_day").mode("overwrite").parquet(out2))
        t("6_rangepart_parquet", lambda: keyed
          .repartitionByRange(n, "_k").sortWithinPartitions("_k").drop("_k")
          .write.mode("overwrite").parquet(out1))
        def du(d):
            return round(sum(os.path.getsize(os.path.join(r, f))
                             for r, _, fs in os.walk(d) for f in fs) / 2**20)

        t("4b_parquet_flat_again", lambda: keyed.repartition(n, "_k")
          .sortWithinPartitions("_k").drop("_k")
          .write.mode("overwrite").parquet(out2))
        T["mb_hash"] = du(out2)
        t("6b_rangepart_again", lambda: keyed
          .repartitionByRange(n, "_k").sortWithinPartitions("_k").drop("_k")
          .write.mode("overwrite").parquet(out1))
        T["mb_range"] = du(out1)

        # 7: the engine's exact router path (children + search tree + labels)
        import functools
        from concurrent.futures import ThreadPoolExecutor

        from e2e_ocsf_cyber_lakehouse_blueprint_spark.functions.ranging import (
            allocate_buckets, bucket_search_tree, inverse_hash_labels,
            slice_grid,
        )
        group = C.group_plans(plans, 64)[0]
        dels, eqdels = table.live_delete_files(), table.live_eq_delete_files()

        def child(i_plan):
            i, plan = i_plan
            return table.read_data_files(
                plan.input_files, delete_files=dels, eq_delete_files=eqdels
            ).withColumn("_pidx", F.lit(i))
        with ThreadPoolExecutor(max_workers=16) as pool:
            children = list(pool.map(child, enumerate(group.plans)))
        un_raw = functools.reduce(lambda a, b: a.unionByName(b), children)
        un = un_raw.withColumn("_k", key)
        total_rows = sum(f.record_count for f in files)
        grid_points = min(512, max(32, 2 * max(p.n_output_files for p in group.plans)))
        fr = [i / grid_points for i in range(1, grid_points)]
        frac = min(1.0, 400_000 / max(1, total_rows))
        narrow = (un_raw if frac >= 1.0 else un_raw.sample(False, frac, seed=42)) \
            .withColumn("_k", key)
        stat_rows = (narrow.groupBy("_pidx")
                     .agg(F.percentile_approx("_k", F.array(*[F.lit(f) for f in fr]),
                                              F.lit(2000)).alias("_grid"),
                          F.count(F.lit(1)).alias("_rows")).collect())
        stats = {r["_pidx"]: (list(r["_grid"] or []), r["_rows"]) for r in stat_rows}
        nc = len(children)
        allocs = allocate_buckets(group.n_output_files,
                                  [stats.get(i, ([], 0))[1] for i in range(nc)])
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
                return bucket_search_tree(F.col("_k"), child_bounds[lo], bases[lo])
            mid = (lo + hi) // 2
            return F.when(F.col("_pidx") <= F.lit(mid),
                          pidx_tree(lo, mid)).otherwise(pidx_tree(mid + 1, hi))

        routed = un.withColumn("_rl", F.element_at(
            label_arr, pidx_tree(0, nc - 1).cast("int") + F.lit(1)))
        sortkeys = table.spec.column_names + ["_k"]
        routed = table.spec.with_partition_columns(routed)
        out3 = os.path.join(template_root, f"o3-{cpus}")
        t("7_router_engine", lambda: routed.repartition(b0, F.col("_rl"))
          .sortWithinPartitions(*sortkeys).drop("_k", "_rl", "_pidx")
          .write.partitionBy(*table.spec.column_names)
          .mode("overwrite").parquet(out3))
        T["mb_router"] = du(out3)
        T["router_bins"] = b0
        shutil.rmtree(out1, ignore_errors=True)
        shutil.rmtree(out2, ignore_errors=True)
        shutil.rmtree(out3, ignore_errors=True)
    print(json.dumps(T))
    spark.stop()


if __name__ == "__main__":
    main()
