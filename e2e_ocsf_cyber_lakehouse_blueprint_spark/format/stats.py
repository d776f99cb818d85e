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
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bloom import harvest_blooms, harvest_key_stats
from .manifest import DataFile, encode_bound, truncate_lower, truncate_upper
from .partition import PARTITION_COL_PREFIX
from ..timing import phase_timer

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


def inputs_carry_key_stats(files) -> bool:
    """True when any input file of a copy-on-write rewrite carries bloom
    bitsets or derived xxh64 bounds. A map-only rewrite (delete/update/merge)
    keeps each file's key neighborhood, so dropping those stats on the
    outputs silently demotes point lookups on the rewritten span to
    bounds-only pruning (wide lexical bounds on curve files prune nothing)
    until the next clustering pass; callers pass this as
    ``write_data_files(harvest_key_stats=...)`` to preserve stats quality
    through the rewrite. Append-era inputs without key stats stay cheap:
    no stats to preserve, no forced harvest."""
    return any(
        f.blooms or any(k.startswith("xxh64(") for k in f.lower_bounds)
        for f in files
    )


def layout_hash_cols(
    hash_cols: list[str],
    bloom_cols: list[str],
    properties: dict,
    sort_order: str | None,
) -> list[str]:
    """Which 'stats.hash-columns' a post-write harvest should actually scan.

    Derived xxh64 bounds localize per file ONLY under a hash-leading curve
    layout: zorder/hilbert interleave ``xxhash64(conv_col)`` bits at the top
    of the key, so each output file covers a narrow hash range while its
    string bounds stay wide (functions/zorder.py). A lexicographic layout
    (bin-pack compaction's ``sortWithinPartitions(conv_id, ...)``, plain
    appends) is the opposite — string bounds are tight and the per-file hash
    range of any many-key file is ~the full 64-bit space: such bounds never
    prune, but harvesting them costs one extra scan of the key column per
    write. At the 10^12-turn design point that is pure read amplification,
    so non-curve layouts skip the hash harvest (merge scoping and pruning
    treat absent hash bounds conservatively — operators/merge.py,
    plans/pruning.py). Two overrides:

    - when 'stats.bloom-columns' is set the fused key scan runs for the
      bitsets regardless, and the hash bounds ride along for free;
    - 'stats.hash-columns.always=true' restores the unconditional harvest
      (e.g. workloads appending near-single-key files, where even an
      unordered file's hash range is tight enough to prune).
    """
    if not hash_cols:
        return []
    if bloom_cols or properties.get("stats.hash-columns.always") == "true":
        return hash_cols
    if not sort_order:
        return []
    curve, _, rest = sort_order.partition("(")
    if curve not in ("zorder", "hilbert"):
        return []
    # only the curve's leading (hash) dimension gets a tight per-file range;
    # the value dimensions (turn_idx, ts) are not hashed by the key kernel
    hash_dim = rest.rstrip(")").split(",")[0].strip()
    return [c for c in hash_cols if c == hash_dim]


def layout_bloom_cols(
    bloom_cols: list[str],
    properties: dict,
    sort_order: str | None,
) -> list[str]:
    """Which 'stats.bloom-columns' a post-write harvest should build bitsets
    for, by layout ('stats.bloom.layouts' property):

    - ``all`` (default): every write — Delta's bloomFilter option behavior.
    - ``curve``: only curve-layout rewrites (zorder/hilbert outputs). In a
      medallion flow every append is compacted and then clustered by the
      next MAINTAIN pass, so bitsets built for append/compaction-era files
      are paid for and thrown away within one maintenance cycle — at the
      10^12-turn design point that is a full key-column read per write for
      nothing. Files without blooms degrade conservatively everywhere
      (merge scoping and pruning keep them), so the only cost is scoping
      precision on not-yet-clustered data.
    """
    if not bloom_cols:
        return []
    mode = properties.get("stats.bloom.layouts", "all")
    if mode == "all":
        return bloom_cols
    if mode != "curve":
        raise ValueError(f"stats.bloom.layouts must be all|curve, got {mode!r}")
    curve = (sort_order or "").partition("(")[0]
    return bloom_cols if curve in ("zorder", "hilbert") else []


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
    partitionBy'd — or a list of such directories; maintenance jobs batch all
    their partitions' staging dirs into one harvest).

    Fast path: min/max/null/row stats come from the parquet FOOTERS the write
    job already produced (what Iceberg/Delta harvest at commit time) — a
    metadata-priced read instead of a second scan of the new files, which was
    the measured per-job serial floor in the two-cluster-size protocol.
    Derived xxh64 hash bounds and bloom bitsets (in no footer) come from
    NARROW scans of just those key columns — never the wide payload. Any
    file whose footer lacks usable stats (pre-engine writers) falls back to
    the one-scan path."""
    dirs = [staging_dir] if isinstance(staging_dir, str) else list(staging_dir)
    with phase_timer("harvest.footers"):
        files = _harvest_from_footers(
            dirs, schema, partition_col_names, stat_columns)
    if files is not None:
        string_cols = {f.name for f in schema.fields
                       if isinstance(f.dataType, T.StringType)}
        hash_cols = [c for c in (hash_stat_columns or []) if c in string_cols]
        bloom_cols = [c for c in (bloom_columns or []) if c in string_cols]
        if bloom_cols:
            # fused job: ONE narrow scan computes xxh64 bounds AND bloom
            # bitsets (bloom.harvest_key_stats) — the separate bounds agg +
            # explode-based bloom job were the measured per-write floor
            key_cols = list(dict.fromkeys([*hash_cols, *bloom_cols]))
            parts = [
                spark.read.schema(_key_scan_schema(key_cols)).parquet(d)
                .select(F.col("_metadata.file_path").alias("_kfp"), *key_cols)
                for d in dirs
            ]
            df = functools.reduce(lambda a, b: a.unionByName(b), parts)
            with phase_timer("harvest.keys"):
                by_path = harvest_key_stats(df, "_kfp", hash_cols, bloom_cols,
                                            m=bloom_bits)
            by_path = {normalize_path(p): e for p, e in by_path.items()}
            for f in files:
                e = by_path.get(f.path)
                if e is None:
                    continue
                for c, (lo, hi) in e["hash_bounds"].items():
                    f.lower_bounds[hash_bound_key(c)] = encode_bound(lo)
                    f.upper_bounds[hash_bound_key(c)] = encode_bound(hi)
                f.blooms = e["blooms"]
        elif hash_cols:
            _merge_hash_bounds(spark, dirs, files, hash_cols)
        return files
    # fallback: one distributed scan computes everything
    # (one read per staging root — each discovers its own _p_* partition
    # dirs; a single multi-root read trips CONFLICTING_DIRECTORY_STRUCTURES —
    # then union into ONE aggregation job. `_metadata` is per-relation and
    # cannot cross a Union: materialize the two fields per branch first.)
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


# footer-stat types whose Python values encode IDENTICALLY to the scan
# harvest's (so pruning comparisons behave the same whichever path ran);
# Decimal/binary are deliberately excluded — their footer encodings drift
_FOOTER_SAFE = (
    T.StringType, T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.FloatType, T.DoubleType, T.DateType, T.TimestampType,
    T.TimestampNTZType, T.BooleanType,
)


def _footer_value(v):
    """Normalize a pyarrow footer statistic to the scan harvest's encoding."""
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:  # ltz micros come back tz-aware UTC
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return str(v)
    return _normalize(v)


def footer_file_stats(path: str, stat_fields, partition: dict) -> DataFile:
    """One DataFile from one parquet footer: row count, size, per-column
    min/max/null over all row groups. A column missing usable stats in ANY
    row group gets no bounds (conservative; pruning treats absent bounds as
    always-match). Raises on unreadable footers — the caller falls back."""
    import os

    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    wanted = {f.name for f in stat_fields}
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    nulls: dict[str, int] = {}
    bounds_dead: set[str] = set()  # a row group lacked min/max
    nulls_dead: set[str] = set()   # a row group lacked a null count
    rows = 0
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        rows += rg.num_rows
        for i in range(rg.num_columns):
            c = rg.column(i)
            name = c.path_in_schema
            if name not in wanted:
                continue
            st = c.statistics
            # null counts and min/max are INDEPENDENT: an all-null column
            # has a null count but no bounds (and the scan harvest records
            # exactly that), so neither gates the other
            if st is not None and st.has_null_count:
                nulls[name] = nulls.get(name, 0) + st.null_count
            else:
                nulls_dead.add(name)
            if name in bounds_dead:
                continue
            if st is None or not st.has_min_max:
                bounds_dead.add(name)
                continue
            mn, mx = _footer_value(st.min), _footer_value(st.max)
            if name in mins:
                mins[name] = min(mins[name], mn)
                maxs[name] = max(maxs[name], mx)
            else:
                mins[name], maxs[name] = mn, mx
    lower, upper = {}, {}
    for name in mins:
        if name in bounds_dead:
            continue
        lo, hi = mins[name], maxs[name]
        if isinstance(lo, str):
            lo = truncate_lower(lo)
            hi = truncate_upper(hi)
            if hi is None:
                continue
        lower[name] = encode_bound(lo)
        upper[name] = encode_bound(hi)
    return DataFile(
        path=normalize_path(path),
        partition=partition,
        record_count=rows,
        file_size_bytes=os.path.getsize(path),
        lower_bounds=lower,
        upper_bounds=upper,
        null_counts={k: v for k, v in nulls.items() if k not in nulls_dead},
    )


def _partition_from_path(path: str, root: str,
                         partition_col_names: list[str]) -> dict:
    """Recover partition values from `_p_<name>=<value>` path components
    (the same Hive-style layout ``partitionBy`` writes; values unescaped the
    way Spark escapes them)."""
    from urllib.parse import unquote

    vals: dict[str, str | None] = {c: None for c in partition_col_names}
    rel = os.path.relpath(os.path.dirname(path), root)
    for comp in rel.split(os.sep):
        if "=" not in comp:
            continue
        k, _, v = comp.partition("=")
        if k.startswith(PARTITION_COL_PREFIX):
            k = k[len(PARTITION_COL_PREFIX):]
        if k in vals:
            vals[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
    return vals


def _harvest_from_footers(
    dirs: list[str],
    schema: T.StructType,
    partition_col_names: list[str],
    stat_columns: list[str] | None,
) -> list[DataFile] | None:
    """Driver-side footer harvest over freshly staged dirs (file count is
    bounded by the job's output bins, and a footer read is ~1ms). Returns
    None when any footer is unreadable or a partition value cannot be
    recovered — the caller then runs the one-scan fallback."""
    import os

    stat_fields = [f for f in schema.fields
                   if isinstance(f.dataType, _FOOTER_SAFE)
                   and isinstance(f.dataType, _BOUNDABLE)]
    if stat_columns is not None:
        allowed = set(stat_columns)
        stat_fields = [f for f in stat_fields if f.name in allowed]
    jobs: list[tuple[str, str]] = []  # (root, path)
    for d in dirs:
        for r, _sub, names in os.walk(d):
            jobs.extend((d, os.path.join(r, n))
                        for n in names if n.endswith(".parquet"))
    if not jobs:
        return []

    def one(job):
        root, p = job
        part = _partition_from_path(p, root, partition_col_names)
        return footer_file_stats(p, stat_fields, part)

    try:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(jobs))) as pool:
            out = list(pool.map(one, jobs))
    except Exception:
        return None
    out.sort(key=lambda d: d.path)
    return out


def _key_scan_schema(key_cols: list[str]) -> T.StructType:
    """Pinned reader schema for the narrow key-column harvest scans.

    ``spark.read.parquet(dir)`` EAGERLY lists the directory and infers the
    schema from a footer on the DRIVER — once per staging dir, per write
    (measured ~1.2s/dir on a 185-file dir in isolation; a grouped rewrite
    harvests one dir, but an N-partition maintenance pass at the design
    point batches MANY dirs into one harvest, each paying its own eager
    listing+inference serially on the driver). Key columns are pre-filtered
    to STRING (the only type the xxh64-bound/bloom layer hashes), so the
    reader schema is known without touching any footer; `_p_*` partition
    dir columns are appended by partition discovery as usual and never
    selected."""
    return T.StructType([T.StructField(c, T.StringType(), True)
                         for c in key_cols])


def _merge_hash_bounds(spark: SparkSession, dirs: list[str],
                       files: list[DataFile], hash_cols: list[str]) -> None:
    """Derived xxh64 bounds via ONE narrow scan of just the hash columns
    (footers cannot provide them; the scan reads a single short string
    column instead of every stat column)."""
    parts = [
        spark.read.schema(_key_scan_schema(hash_cols)).parquet(d)
        .select(F.col("_metadata.file_path").alias("_fp"), *hash_cols)
        for d in dirs
    ]
    df = functools.reduce(lambda a, b: a.unionByName(b), parts)
    aggs = []
    for c in hash_cols:
        aggs.append(F.min(F.xxhash64(c)).alias(f"_hlo_{c}"))
        aggs.append(F.max(F.xxhash64(c)).alias(f"_hhi_{c}"))
    rows = df.groupBy("_fp").agg(*aggs).collect()
    by_path = {normalize_path(r["_fp"]): r for r in rows}
    for f in files:
        r = by_path.get(f.path)
        if r is None:
            continue
        for c in hash_cols:
            if r[f"_hlo_{c}"] is not None:
                f.lower_bounds[hash_bound_key(c)] = encode_bound(
                    int(r[f"_hlo_{c}"]))
                f.upper_bounds[hash_bound_key(c)] = encode_bound(
                    int(r[f"_hhi_{c}"]))


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
