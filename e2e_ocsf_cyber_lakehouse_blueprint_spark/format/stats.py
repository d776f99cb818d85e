"""Per-data-file column statistics, harvested with one distributed Spark agg.

Mirrors what Delta collects at write time for data skipping (the reference
enables it implicitly; see `utilities/post_setup_ocsf_tables.py:78-81`). One
``groupBy(_metadata.file_path)`` aggregation computes row counts and per-column
min/max/null-count for every freshly written file — fully distributed, so the
harvest scales with executors (no driver-side footer reads). The file-metadata
pseudo-column is the same one the reference uses for provenance
(`bronze_github_audit_logs.py:26`).

Only one metadata-sized row per file is collected to the driver.
"""

from __future__ import annotations

import datetime
import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bloom import harvest_blooms
from .manifest import DataFile, encode_bound, truncate_lower, truncate_upper
from .partition import PARTITION_COL_PREFIX

_BOUNDABLE = (
    T.StringType, T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.FloatType, T.DoubleType, T.DateType, T.TimestampType, T.TimestampNTZType,
    T.BooleanType, T.DecimalType,
)


def normalize_path(path: str) -> str:
    """Canonical manifest path: strip file:/ URI prefixes (Hadoop emits both
    ``file:/p`` and ``file:///p``) so metadata joins against plain listings."""
    if path.startswith("file:"):
        path = "/" + path[len("file:"):].lstrip("/")
    return path


def _normalize(value) -> object:
    if isinstance(value, (datetime.datetime, datetime.date)):
        return str(value)
    if isinstance(value, bool):
        return int(value)
    return value


def hash_bound_key(col: str) -> str:
    return f"xxh64({col})"


# materialized `_metadata` fields (the pseudo-column is per-relation and does
# not survive a Union, so multi-dir harvests project it per branch first)
_META_PATH = "_meta_file_path"
_META_SIZE = "_meta_file_size"


def harvest_file_stats(
    spark: SparkSession,
    staging_dir: str | list[str],
    schema: T.StructType,
    partition_col_names: list[str],
    hash_stat_columns: list[str] | None = None,
    stat_columns: list[str] | None = None,
    bloom_columns: list[str] | None = None,
    bloom_bits: int = 8192,
) -> list[DataFile]:
    """Compute DataFile entries (stats + partition tuple) for every parquet file
    under ``staging_dir`` (one directory Spark just wrote, possibly
    partitionBy'd — or a list of such directories, harvested in ONE Spark job;
    maintenance jobs batch all their partitions' staging dirs this way).
    """
    dirs = [staging_dir] if isinstance(staging_dir, str) else list(staging_dir)
    # one read per staging root (each discovers its own _p_* partition dirs;
    # a single multi-root read trips CONFLICTING_DIRECTORY_STRUCTURES), then
    # union into ONE aggregation job. `_metadata` is per-relation and cannot
    # cross a Union — materialize the two fields per branch first.
    parts = [
        spark.read.parquet(d).select(
            "*",
            F.col("_metadata.file_path").alias(_META_PATH),
            F.col("_metadata.file_size").alias(_META_SIZE),
        )
        for d in dirs
    ]
    df = functools.reduce(lambda a, b: a.unionByName(b), parts)
    return harvest_df_stats(df, schema, partition_col_names, hash_stat_columns,
                            stat_columns, bloom_columns, bloom_bits)


def harvest_df_stats(
    df: DataFrame,
    schema: T.StructType,
    partition_col_names: list[str],
    hash_stat_columns: list[str] | None = None,
    stat_columns: list[str] | None = None,
    bloom_columns: list[str] | None = None,
    bloom_bits: int = 8192,
) -> list[DataFile]:
    """``stat_columns`` restricts which columns get min/max/null bounds.

    At scale this is the difference between a metadata-priced harvest and a
    second full read of the table: bounding a wide payload column (e.g. 2KB
    ``text``) decompresses the dominant column for bounds nobody prunes on.
    Column pruning pushes the restriction into the parquet scan (ReadSchema),
    so the harvest reads only the narrow key columns."""
    stat_fields = [f for f in schema.fields if isinstance(f.dataType, _BOUNDABLE)]
    if stat_columns is not None:
        allowed = set(stat_columns)
        stat_fields = [f for f in stat_fields if f.name in allowed]
    hash_cols = [
        c for c in (hash_stat_columns or [])
        if c in {f.name for f in schema.fields
                 if isinstance(f.dataType, T.StringType)}
    ]
    aggs = [
        F.count(F.lit(1)).alias("_rc"),
        F.max(F.col(_META_SIZE if _META_SIZE in df.columns
                    else "_metadata.file_size")).alias("_fsize"),
    ]
    for f in stat_fields:
        aggs.append(F.min(f.name).alias(f"_lo_{f.name}"))
        aggs.append(F.max(f.name).alias(f"_hi_{f.name}"))
        aggs.append(F.count(F.when(F.col(f.name).isNull(), 1)).alias(f"_nc_{f.name}"))
    for c in hash_cols:
        # derived hash bounds: prune conv_id = X even when file order is
        # hash-of-conv (Z-order dimension), where string bounds stay wide
        aggs.append(F.min(F.xxhash64(c)).alias(f"_hlo_{c}"))
        aggs.append(F.max(F.xxhash64(c)).alias(f"_hhi_{c}"))

    # partition values live in `_p_<name>` directory columns (partition.py);
    # alias back to the logical partition-field names for manifest entries
    group_cols = [F.col(_META_PATH if _META_PATH in df.columns
                        else "_metadata.file_path").alias("_fp")] + [
        F.col(PARTITION_COL_PREFIX + c).cast("string").alias(c)
        for c in partition_col_names
    ]
    rows = df.groupBy(*group_cols).agg(*aggs).collect()

    out: list[DataFile] = []
    for r in rows:
        lower, upper, nulls = {}, {}, {}
        for f in stat_fields:
            lo, hi = r[f"_lo_{f.name}"], r[f"_hi_{f.name}"]
            nulls[f.name] = r[f"_nc_{f.name}"]
            if lo is None:
                continue
            lo, hi = _normalize(lo), _normalize(hi)
            if isinstance(f.dataType, T.StringType):
                lo = truncate_lower(lo)
                hi = truncate_upper(hi)
                if hi is None:
                    continue
            lower[f.name] = encode_bound(lo)
            upper[f.name] = encode_bound(hi)
        for c in hash_cols:
            if r[f"_hlo_{c}"] is not None:
                lower[hash_bound_key(c)] = encode_bound(int(r[f"_hlo_{c}"]))
                upper[hash_bound_key(c)] = encode_bound(int(r[f"_hhi_{c}"]))
        path = normalize_path(r["_fp"])
        out.append(
            DataFile(
                path=path,
                partition={c: r[c] for c in partition_col_names},
                record_count=r["_rc"],
                file_size_bytes=r["_fsize"],
                lower_bounds=lower,
                upper_bounds=upper,
                null_counts=nulls,
            )
        )
    bloom_cols = [
        c for c in (bloom_columns or [])
        if c in {f.name for f in schema.fields
                 if isinstance(f.dataType, T.StringType)}
    ]
    if bloom_cols:
        # second narrow job (path + bloom key columns only — column pruning
        # keeps the payload out of the scan); see format/bloom.py for shape
        path_col = _META_PATH if _META_PATH in df.columns else "_metadata.file_path"
        by_path = harvest_blooms(
            df.select(F.col(path_col).alias("_bfp"), *bloom_cols),
            "_bfp", bloom_cols, m=bloom_bits)
        by_path = {normalize_path(p): b for p, b in by_path.items()}
        for d in out:
            d.blooms = by_path.get(d.path, {})
    out.sort(key=lambda d: d.path)
    return out


def distinct_census(df: DataFrame, cols: list[str], *, approximate: bool = True,
                    rsd: float = 0.05) -> DataFrame:
    """Distinct-key census (SURVEY.md §2.4) for sizing clustering grids and
    bucket counts. ``approximate=True`` uses HyperLogLog++
    (``approx_count_distinct``): one pass, constant memory per column — at
    10^12 turns an exact countDistinct would shuffle every key, the approx
    form never shuffles more than sketch buffers."""
    agg = (
        (F.approx_count_distinct(c, rsd) if approximate else F.countDistinct(c))
        .alias(f"n_{c}")
        for c in cols
    )
    return df.agg(F.count(F.lit(1)).alias("n_rows"), *agg)
