"""Phase-internal profiling for the scaling protocol: time every sub-step of
the compact and zorder phases (plan / write jobs / harvest / commit) at a given
parallelism, to locate the serial (Amdahl) fraction that caps N->4N efficiency.

Usage: python scripts/profile_phases.py <template_root> <cpus>
(template built by `python bench.py --prepare-template DIR --cpus 32`)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")

from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.stats import harvest_file_stats
from e2e_ocsf_cyber_lakehouse_blueprint_spark.format.table import Table
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators import compaction as C
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators import clustering as CL
from e2e_ocsf_cyber_lakehouse_blueprint_spark.operators.ledger import (
    Ledger, partition_key, split_size_for_rewrites,
)
from e2e_ocsf_cyber_lakehouse_blueprint_spark.session import get_spark

T: dict[str, float] = {}


def tick(name):
    class _c:
        def __enter__(self):
            self.t0 = time.time()

        def __exit__(self, *a):
            T[name] = T.get(name, 0.0) + time.time() - self.t0

    return _c()


def profile_compact(table):
    with tick("c.plan"):
        table.refresh()
        snapshot = table.current_snapshot()
        plans = C.plan_compaction(
            table, target_file_size=table.property_int(
                "write.target-file-size-bytes", C.DEFAULT_TARGET_FILE_SIZE))
    job_id = f"compact-{snapshot.snapshot_id}"
    ledger = Ledger(table.location, job_id, "compact")
    groups = C.group_plans(plans, 64)
    dirs = []
    with split_size_for_rewrites(table.spark, table.property_int(
            "write.target-file-size-bytes", C.DEFAULT_TARGET_FILE_SIZE)):
        for g in groups:
            with tick("c.write_jobs"):
                dirs.append((g, C.write_group_binpack(
                    table, g, ("conv_id", "turn_idx"), job_id)))
        with tick("c.harvest"):
            files = harvest_file_stats(
                table.spark, sorted({d for _, d in dirs}), table.schema,
                [f.name for f in table.spec.fields],
                table.hash_stat_columns(), table.stat_columns(),
            )
    with tick("c.commit"):
        by_part = {}
        for f in files:
            by_part.setdefault(partition_key(f.partition), []).append(f)
        deleted = [f.path for p in plans for f in p.input_files]
        added = [f for fs in by_part.values() for f in fs]
        table.commit_rewrite(deleted, added, operation="replace",
                             summary_extra={"job": "compact"})
    return sum(v for k, v in T.items() if k.startswith("c."))


def profile_zorder(table):
    with tick("z.plan"):
        table.refresh()
        snapshot = table.current_snapshot()
        job = CL.ClusteringJob(table, curve="zorder", max_concurrency=8)
        plans = job._plan()
        all_files = [f for p in plans for f in p.input_files]
        turn_range, ts_range = CL.dimension_ranges(all_files)
        writer = job._group_writer_factory(turn_range, ts_range)
    job_id = f"cluster-zorder-{snapshot.snapshot_id}"
    groups = C.group_plans(plans, 64)
    dirs = []
    with split_size_for_rewrites(table.spark, job.target_file_size):
        for g in groups:
            with tick("z.write_jobs"):
                dirs.append((g, writer(g, job_id)))
        with tick("z.harvest"):
            files = harvest_file_stats(
                table.spark, sorted({d for _, d in dirs}), table.schema,
                [f.name for f in table.spec.fields],
                table.hash_stat_columns(), table.stat_columns(),
            )
    with tick("z.commit"):
        deleted = [f.path for p in plans for f in p.input_files]
        table.commit_rewrite(deleted, list(files), operation="replace",
                             summary_extra={"job": "cluster"})
    return sum(v for k, v in T.items() if k.startswith("z."))


def main():
    template_root, cpus = sys.argv[1], int(sys.argv[2])
    loc = os.path.join(template_root, "t")
    shutil.rmtree(loc, ignore_errors=True)
    shutil.copytree(os.path.join(template_root, "pristine"), loc)
    spark = get_spark(parallelism=cpus, shuffle_partitions=max(cpus, 8),
                      app_name=f"profile-{cpus}")
    table = Table.load(spark, loc)
    # warm JIT/codegen/committer like the bench does
    warm = os.path.join(template_root, f"pwarm-{cpus}")
    some = [f.path for f in table.live_data_files()[:4]]
    spark.read.parquet(*some).limit(50000).write.mode("overwrite").parquet(warm)
    spark.read.parquet(warm).count()
    shutil.rmtree(warm, ignore_errors=True)

    c = profile_compact(table)
    z = profile_zorder(table)
    out = {k: round(v, 2) for k, v in sorted(T.items())}
    out["compact_total"] = round(c, 2)
    out["zorder_total"] = round(z, 2)
    out["cpus"] = cpus
    import json
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
