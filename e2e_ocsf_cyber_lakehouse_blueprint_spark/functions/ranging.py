"""Sample-free range routing for clustering rewrites.

``repartitionByRange`` hides a full execution of the child plan: Spark's
RangePartitioner launches a sampling job that decodes EVERY column (the child
RDD is executed as-is, so parquet column pruning cannot help) just to learn
key boundaries. On a transcripts table the payload column dominates the bytes,
so the sample pass costs ~80% of the map stage — at the 100 TB design point
that is an entire extra decode of the table per clustering run (measured at
sandbox scale: sample 19 exec-s vs map 24 exec-s, profile notes in
docs/PLANS.md).

This module computes the same boundaries from a NARROW pass instead and
routes rows to reducers without any sampling:

1. bounds:  one column-pruned scan of just the key inputs, aggregated with
   ``percentile_approx(key, grid)`` per table partition (a QuantileSummaries
   sketch — distributed, one tiny shuffle). The driver slices the grid into
   each partition's file-count boundaries.
2. bucket:  a binary-search CASE tree over the partition's bounds (depth
   log2(files) of codegen'd comparisons — no Python, no linear scan for the
   common grouped case).
3. route:   ``repartition(n, label)`` where ``label`` is an int chosen so
   that Spark's Murmur3 hash routes bucket i exactly to reducer i
   (``pmod(hash(label_i), n) == i``). Hash partitioning with inverted labels
   IS identity range partitioning — one exchange, zero sampling.

The Murmur3_x86_32 implementation mirrors the public algorithm (Austin
Appleby, public domain) exactly as Spark evaluates ``F.hash`` on an
IntegerType column with seed 42; ``tests/test_ranging.py`` pins the match
against Spark itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASK32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    x &= _MASK32
    return ((x << r) | (x >> (32 - r))) & _MASK32


def murmur3_int32(value: int, seed: int = 42) -> int:
    """Spark-compatible Murmur3_x86_32 of one IntegerType value (signed
    result, matching ``F.hash(int_col)``)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    k1 = (value & _MASK32) * c1 & _MASK32
    k1 = _rotl32(k1, 15) * c2 & _MASK32
    h1 = (seed & _MASK32) ^ k1
    h1 = (_rotl32(h1, 13) * 5 + 0xE6546B64) & _MASK32
    h1 ^= 4  # length in bytes
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & _MASK32
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & _MASK32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def inverse_hash_labels(n: int) -> list[int]:
    """labels[i] is an int whose Spark hash-partitioning slot (mod n) is i,
    so ``repartition(n, label)`` places bucket i exactly in reducer i.

    Expected O(n) probes total (each candidate hits a uniform slot); bounded
    deterministic scan keeps plans reproducible across runs."""
    labels: list[int | None] = [None] * n
    found = 0
    candidate = 0
    while found < n:
        slot = murmur3_int32(candidate) % n  # pmod: murmur result may be <0
        if labels[slot] is None:
            labels[slot] = candidate
            found += 1
        candidate += 1
        if candidate > 64 * n + 1024:  # pragma: no cover - murmur is uniform
            raise RuntimeError(f"label search did not converge for n={n}")
    return labels  # type: ignore[return-value]


def bucket_search_tree(key: Column, bounds: list[int], base: int = 0) -> Column:
    """Binary CASE tree: index (``base`` offset) of the first bound >= key,
    i.e. rows with key <= bounds[i] fall in bucket base+i. Depth log2(n) of
    codegen'd comparisons per row."""
    n = len(bounds) + 1  # buckets

    def build(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(base + lo)
        mid = (lo + hi) // 2
        return F.when(key <= F.lit(bounds[mid]), build(lo, mid)).otherwise(
            build(mid + 1, hi)
        )

    return build(0, n - 1)


def slice_grid(grid: list, n_buckets: int) -> list:
    """n_buckets-1 cut points from a fine quantile grid (deduped, sorted)."""
    if n_buckets <= 1 or not grid:
        return []
    g = len(grid)
    cuts = []
    for j in range(1, n_buckets):
        cuts.append(grid[min(g - 1, max(0, round(j * g / n_buckets) - 1))])
    # dedupe while keeping order: duplicate cuts only make empty reducers
    out = []
    for c in cuts:
        if not out or c > out[-1]:
            out.append(c)
    return out


def allocate_buckets(n_total: int, rows: list[int]) -> list[int]:
    """Largest-remainder proration of ``n_total`` reducers across children by
    row count (>=1 each — an empty child still needs a routable bucket)."""
    total = sum(rows) or 1
    shares = [n_total * r / total for r in rows]
    allocs = [max(1, int(s)) for s in shares]
    leftover = n_total - sum(allocs)
    order = sorted(range(len(rows)), key=lambda i: shares[i] - int(shares[i]),
                   reverse=True)
    for i in order:
        if leftover <= 0:
            break
        allocs[i] += 1
        leftover -= 1
    return allocs


QUANTILE_GRID = 128   # fine-grid points sketched per partition
QUANTILE_ACC = 5000   # QuantileSummaries accuracy (rel. err 1/acc)


def route_by_key_ranges(
    df: DataFrame, pcols: list[str], key_col: str, n_total: int,
    grid_points: int = QUANTILE_GRID, accuracy: int = QUANTILE_ACC,
    label_col: str = "_range_label",
) -> tuple[DataFrame, int]:
    """Replace ``repartitionByRange(n_total, *pcols, key)`` with a sample-free
    equivalent. Returns (routed df carrying ``label_col``, reducer count).

    One narrow sketch pass learns, per table partition, a fine quantile grid
    of the key plus the row count; the driver prorates ``n_total`` reducers
    across partitions by rows (the RangePartitioner's sample is row-weighted
    too, so balance quality is the same) and slices each grid into that many
    contiguous key ranges. Rows are then routed through ONE hash exchange on
    an inverted-hash label — bucket i lands exactly in reducer i, buckets
    never straddle table partitions, and every reducer holds one contiguous
    key range of one partition: identical layout to the sampled range
    exchange, minus the hidden full-decode sampling job."""
    fr = [i / grid_points for i in range(1, grid_points)]
    narrow = df.select(*pcols, key_col)  # Catalyst prunes payload columns
    rows = (
        narrow.groupBy(*pcols)
        .agg(
            F.percentile_approx(
                key_col, F.array(*[F.lit(f) for f in fr]), F.lit(accuracy)
            ).alias("_grid"),
            F.count(F.lit(1)).alias("_rows"),
        )
        .collect()
    )
    if not rows:
        return df.withColumn(label_col, F.lit(0)), 1
    allocs = allocate_buckets(n_total, [r["_rows"] for r in rows])
    bucket = None
    base = 0
    for r, n_p in zip(rows, allocs):
        bounds = slice_grid(list(r["_grid"] or []), n_p)
        tree = bucket_search_tree(F.col(key_col), bounds, base)
        cond = None
        for c in pcols:
            eq = F.col(c).eqNullSafe(F.lit(r[c]))
            cond = eq if cond is None else cond & eq
        if cond is None:  # unpartitioned table: single group
            bucket = tree
        else:
            bucket = tree if bucket is None else F.when(cond, tree).otherwise(bucket)
        base += len(bounds) + 1
    labels = inverse_hash_labels(base)
    label_arr = F.array(*[F.lit(int(l)).cast("int") for l in labels])
    routed = df.withColumn(
        label_col, F.element_at(label_arr, bucket.cast("int") + F.lit(1))
    ).repartition(base, F.col(label_col))
    return routed, base
