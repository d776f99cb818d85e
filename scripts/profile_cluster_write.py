"""Sub-step timing inside the clustering write job: children build / sketch /
driver plan / main exchange+write, at a given parallelism, to find what keeps
z.write_jobs from scaling 8 -> 32 cores at bench scale.

Usage: python scripts/profile_cluster_write.py <template_root> <cpus>
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
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.ledger import (
    split_size_for_rewrites,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.session import get_spark


def main():
    template_root, cpus = sys.argv[1], int(sys.argv[2])
    loc = os.path.join(template_root, "t")
    shutil.rmtree(loc, ignore_errors=True)
    shutil.copytree(os.path.join(template_root, "pristine"), loc)
    spark = get_spark(parallelism=cpus, shuffle_partitions=max(cpus, 8),
                      app_name=f"pcw-{cpus}")
    table = Table.load(spark, loc)
    # compact first (zorder in the bench runs over the compacted table)
    C.CompactionJob(table, max_concurrency=min(16, cpus)).run()
    table.refresh()

    # warm codegen paths
    warm = os.path.join(template_root, f"w{cpus}")
    some = [f.path for f in table.live_data_files()[:4]]
    spark.read.parquet(*some).limit(50000).write.mode("overwrite").parquet(warm)
    (spark.read.parquet(warm).repartitionByRange(4, "conv_id", "turn_idx")
     .sortWithinPartitions("conv_id").write.mode("overwrite").parquet(warm + "2"))
    shutil.rmtree(warm, ignore_errors=True)
    shutil.rmtree(warm + "2", ignore_errors=True)

    job = CL.ClusteringJob(table, curve="zorder", max_concurrency=min(16, cpus))
    plans = job._plan()
    all_files = [f for p in plans for f in p.input_files]
    turn_range, ts_range = CL.dimension_ranges(all_files)
    from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.clustering import (
        cluster_key_column,
    )
    key_expr = cluster_key_column(
        "zorder", conv_col=job.conv_col, turn_col=job.turn_col,
        ts_col=job.ts_col, turn_range=turn_range, ts_us_range=ts_range)
    group = C.group_plans(plans, 64)[0]
    spec = table.spec
    dels = table.live_delete_files()
    eqdels = table.live_eq_delete_files()
    keys = spec.column_names + ["_zkey"]
    n = max(1, group.n_output_files)
    total_rows = sum(f.record_count for p in group.plans for f in p.input_files)
    T = {}

    with split_size_for_rewrites(spark, job.target_file_size):
        t0 = time.time()
        def child(i_plan):
            i, plan = i_plan
            return table.read_data_files(
                plan.input_files, delete_files=dels, eq_delete_files=eqdels
            ).withColumn("_pidx", F.lit(i))
        with ThreadPoolExecutor(max_workers=min(16, max(1, len(group.plans)))) as pool:
            children = list(pool.map(child, enumerate(group.plans)))
        un_raw = functools.reduce(lambda a, b: a.unionByName(b), children)
        un = un_raw.withColumn("_zkey", key_expr)
        T["build_children"] = time.time() - t0

        t0 = time.time()
        grid_points = min(512, max(32, 2 * max(p.n_output_files for p in group.plans)))
        fr = [i / grid_points for i in range(1, grid_points)]
        frac = min(1.0, 400_000 / max(1, total_rows))
        narrow = un_raw if frac >= 1.0 else un_raw.sample(False, frac, seed=42)
        narrow = narrow.withColumn("_zkey", key_expr)
        stat_rows = (narrow.groupBy("_pidx")
                     .agg(F.percentile_approx("_zkey", F.array(*[F.lit(f) for f in fr]),
                                              F.lit(2000)).alias("_grid"),
                          F.count(F.lit(1)).alias("_rows")).collect())
        T["sketch_job"] = time.time() - t0

        t0 = time.time()
        stats = {r["_pidx"]: (list(r["_grid"] or []), r["_rows"]) for r in stat_rows}
        n_children = len(children)
        allocs = allocate_buckets(n, [stats.get(i, ([], 0))[1] for i in range(n_children)])
        child_bounds = [slice_grid(stats.get(i, ([], 0))[0], allocs[i])
                        for i in range(n_children)]
        bases, base = [], 0
        for b in child_bounds:
            bases.append(base)
            base += len(b) + 1
        labels = inverse_hash_labels(base)
        label_arr = F.array(*[F.lit(int(l)).cast("int") for l in labels])

        def pidx_tree(lo, hi):
            if lo == hi:
                return bucket_search_tree(F.col("_zkey"), child_bounds[lo], bases[lo])
            mid = (lo + hi) // 2
            return F.when(F.col("_pidx") <= F.lit(mid),
                          pidx_tree(lo, mid)).otherwise(pidx_tree(mid + 1, hi))

        routed = un.withColumn("_range_label", F.element_at(
            label_arr, pidx_tree(0, n_children - 1).cast("int") + F.lit(1)))
        routed = spec.with_partition_columns(routed)
        out = (routed.repartition(base, F.col("_range_label"))
               .sortWithinPartitions(*keys)
               .drop("_zkey", "_range_label", "_pidx"))
        T["driver_plan"] = time.time() - t0

        t0 = time.time()
        out_dir = C._staging_dir(table, "pcw")
        C._partitioned_write(table, out, out_dir)
        T["main_write_job"] = time.time() - t0

    T["n_bins"] = base
    T["n_children"] = n_children
    T["total_rows"] = total_rows
    T["cpus"] = cpus
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in T.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
