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
    slower, measured at n=32).

    Base shingle hash: first 15 hex chars of md5 (60 bits < p*2^31 overflow
    bound), so a DuckDB oracle recomputes identical signatures; a*h stays
    under 2^62 (no ANSI overflow in either engine)."""
    coef, p = _minhash_perm_exprs(n_hashes, seed)
    base = F.transform(
        shingles(text_col, shingle_k),
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"), F.lit(p)
        ),
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
    max_bucket: int = 10_000,
    verify_threshold: float | None = None,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b) via banded minhash buckets.

    Scale guards (each one a measured hot-key failure otherwise):
    - zero-shingle docs (fewer than ``shingle_k`` tokens) are dropped BEFORE
      signing — they all share the degenerate init signature and would land
      in one all-pairs bucket;
    - buckets larger than ``max_bucket`` ids are dropped (a boilerplate
      shingle shared by everything otherwise makes one reducer do an O(b^2)
      self-join); the cap is a window count on the same (band, bh) keys the
      self-join shuffles on, so it costs no extra exchange;
    - with ``verify_threshold`` set, candidates are verified with EXACT
      shingle-set jaccard (array_intersect on the two shingle sets) and the
      output carries (id_a, id_b, jaccard >= threshold).
    """
    rows_per_band = n_hashes // bands
    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    with_sh = (
        base.withColumn("_sh", F.array_distinct(shingles("_t", shingle_k)))
        .filter(F.size("_sh") > 0)
    )
    sig = with_sh.select(
        "_id", "_sh",
        minhash_signature("_t", n_hashes, shingle_k, seed).alias("_sig"),
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
    wb = Window.partitionBy("band", "bh")
    banded = banded.withColumn("_n", F.count("*").over(wb)).filter(
        F.col("_n") <= max_bucket
    ).drop("_n")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(right, (F.col("l.band") == F.col("r.band"))
                  & (F.col("l.bh") == F.col("r.bh"))
                  & (F.col("l._id") < F.col("r._id")))
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    if verify_threshold is None:
        return pairs
    sets_a = with_sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    sets_b = with_sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    inter = F.size(F.array_intersect("_sha", "_shb"))
    return (
        pairs.join(sets_a, "id_a").join(sets_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(inter / (F.size("_sha") + F.size("_shb") - inter), 6),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_survivors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 7,
    max_bucket: int = 10_000,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """The REMOVE step of near-dup dedup: the corpus minus near-duplicate
    losers, keep-lowest-id policy.

    Verified minhash-LSH pairs (id_a < id_b) mark every ``id_b`` a loser; a
    left-anti join keeps the rest. Deterministic and one-pass (no iterative
    connected components): a doc survives iff no smaller-id doc is jaccard-
    similar to it, the standard greedy canonicalization for training-data
    pipelines. Scale shape = the pair pipeline's (banded self-join, never
    all-pairs) + one broadcast-sized anti-join of distinct loser ids."""
    pairs = minhash_lsh_candidates(
        df, id_col, text_col,
        n_hashes=n_hashes, bands=bands, shingle_k=shingle_k, seed=seed,
        max_bucket=max_bucket, verify_threshold=verify_threshold,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_k: int = 3,
    threshold: float = 0.6,
    max_df: int = 10_000,
) -> DataFrame:
    """Exact word-k-gram Jaccard for pairs sharing >=1 sub-cap shingle.

    (id_a, id_b, jaccard) with jaccard >= threshold, id_a < id_b, and the
    jaccard EXACT (array_intersect over the full shingle sets).

    Scale shape: candidate pairs come from a shared-shingle equi-join over
    shingles with document frequency <= ``max_df`` — without the cap, ONE
    boilerplate shingle present in 10^6 docs makes a single reducer expand
    O(df^2) pairs (the minhash path caps its buckets the same way;
    ``max_bucket`` in :func:`minhash_lsh_candidates`). The df filter is a
    window count on the same shingle key the self-join shuffles on, so it
    adds no exchange. Verification then scores candidates on the FULL
    sets, so the cap costs recall only for pairs whose every shared shingle
    is ultra-common — the boilerplate-only matches dedup wants to ignore.
    """
    sh = (
        df.select(F.col(id_col).alias("_id"),
                  F.array_distinct(shingles(text_col, shingle_k)).alias("_sh"))
        .filter(F.size("_sh") > 0)
    )
    exploded = sh.select("_id", F.explode("_sh").alias("s"))
    wdf = Window.partitionBy("s")
    capped = (
        exploded.withColumn("_df", F.count("*").over(wdf))
        .filter(F.col("_df") <= max_df).drop("_df")
    )
    cand = (
        capped.alias("a")
        .join(capped.alias("b"),
              (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sets_a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    sets_b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    inter = F.size(F.array_intersect("_sha", "_shb"))
    return (
        cand.join(sets_a, "id_a").join(sets_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(inter / (F.size("_sha") + F.size("_shb") - inter), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------- simhash


def _nth_bit(h, i):
    """Bit i (0=LSB) of the (hi, lo) split word hash; i is a COLUMN, so the
    shift is done arithmetically: half < 2^32 and the divisor is a power of
    two, making the double division exact and floor the true right-shift."""
    half = F.when(i >= 32, h["hi"]).otherwise(h["lo"])
    shifted = F.floor(half / F.pow(F.lit(2.0), F.pmod(i, F.lit(32)).cast("double")))
    return F.pmod(shifted, F.lit(2)).cast("long")


def _bit_value(b):
    """2^b as a signed int64 for a column b in [0, 63] (bit 63 = sign bit)."""
    return F.when(b == 63, F.lit(-(1 << 63)).cast("long")).otherwise(
        F.pow(F.lit(2.0), b.cast("double")).cast("long"))


def simhash(text_col) -> F.Column:
    """64-bit simhash as a PURE Catalyst expression (no Python per row).

    Per word occurrence: a 64-bit hash from the first 16 hex chars of md5(w)
    (big-endian), split into (hi, lo) 32-bit halves so every bit op stays in
    long range. Per bit b: the sign of sum(+/-1 per word) decides the
    signature bit. md5-based so a DuckDB oracle recomputes identical values.

    Shape note: ONE aggregate pass over the word hashes with a 64-counter
    array accumulator — a per-bit aggregate formulation would inline (and
    recompute) the md5 subtree 64x, the same Catalyst-inlining trap measured
    on the minhash signature (30x, see minhash_signature)."""
    toks = word_tokens(text_col)
    md5s = F.transform(toks, F.md5)
    hs = F.transform(md5s, lambda m: F.struct(
        F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("lo"),
    ))
    counts = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.transform(acc, lambda a, i: a + (_nth_bit(h, i) * 2 - 1)),
    )
    return F.aggregate(
        F.zip_with(counts, F.sequence(F.lit(0), F.lit(63)),
                   lambda c, b: F.struct(c.alias("c"), b.alias("b"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.when(x["c"] > 0, _bit_value(x["b"])).otherwise(F.lit(0).cast("long")),
    )


def simhash_chunk_layout(max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) chunks covering 64 bits, ``max_hamming + 1`` of them.

    Pigeonhole: a pair with hamming <= d differs in at most d chunks, so with
    d+1 chunks at least one chunk matches exactly -> banding on chunk equality
    is COMPLETE for hamming <= d (the round-1 fixed 4x16 layout silently
    dropped pairs with hamming 4..10 that differed in all four chunks)."""
    nc = min(64, max_hamming + 1)
    base, rem = divmod(64, nc)
    layout, off = [], 0
    for i in range(nc):
        w = base + (1 if i < rem else 0)
        layout.append((off, w))
        off += w
    return layout


def simhash_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3, max_bucket: int = 10_000,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, hamming <= max_hamming), complete up to
    the hot-bucket cap.

    Candidate generation bands the signature into ``max_hamming + 1`` chunks
    (see ``simhash_chunk_layout``); any chunk-equal pair is a candidate and is
    then verified with an exact xor-popcount. Zero-word docs are excluded up
    front — they all share signature 0 and would otherwise form one degenerate
    all-pairs bucket (the same hot-bucket guard as minhash LSH).

    ``max_bucket`` bounds the self-join fan-out: a (ci, cv) chunk bucket
    holding more than ``max_bucket`` docs (a near-identical corpus slab —
    boilerplate-heavy crawls concentrate into one 16-bit chunk value) would
    make one reducer expand O(b^2) pairs. The cap is a window count over the
    same (ci, cv) keys the self-join shuffles on, so it adds no exchange;
    docs dropped from ONE hot chunk can still pair via their other
    ``max_hamming`` chunks, so recall degrades gracefully rather than the
    job dying."""
    sh = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .filter(F.size(word_tokens("_t")) > 0)
        .select("_id", simhash("_t").alias("_sh"))
    )
    layout = simhash_chunk_layout(max_hamming)
    chunks = sh.select(
        "_id", "_sh",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftrightunsigned("_sh", off)
                 .bitwiseAND(F.lit((1 << w) - 1)).alias("cv"),
            )
            for i, (off, w) in enumerate(layout)
        ])).alias("c"),
    ).select("_id", "_sh", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    wc = Window.partitionBy("ci", "cv")
    chunks = chunks.withColumn("_n", F.count("*").over(wc)).filter(
        F.col("_n") <= max_bucket
    ).drop("_n")
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
