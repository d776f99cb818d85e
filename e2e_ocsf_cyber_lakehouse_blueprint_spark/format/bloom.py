"""Per-file bloom filters for point-lookup file skipping.

Min/max bounds (stats.py) prune range predicates, and the derived
``xxh64(col)`` bounds prune equality on hash-clustered files — but a fresh
time-ordered append holds an arbitrary mix of conv_ids, so its conv_id
bounds span the whole keyspace and ``conv_id = X`` cannot skip anything.
This module is the third skipping layer, the analogue of Delta/Iceberg
bloom-filter indexes the reference's Databricks tables get from
``delta.bloomFilter`` column options: a small per-file bloom bitset stored
in the manifest entry, consulted driver-side by ``plans/pruning.py`` before
any DataFrame is built.

Build path (``harvest_blooms``) is one narrow Spark job, scale-shaped:

- k bit positions per row via double hashing (Kirsch–Mitzenmacher):
  ``pos_i = pmod(h1 + i*h2, m)`` with ``h1 = xxhash64(v)`` and
  ``h2 = xxhash64(v || 0x01) | 1`` — both Catalyst expressions, no UDF.
- ``explode`` to (file, pos), map to (word_idx, single-bit word), then ONE
  ``groupBy(file, word_idx).agg(bit_or(word))`` — map-side combined, so the
  shuffle carries at most ``m/64`` words per file regardless of row count.
- The collected result is the SPARSE non-zero word list (a freshly
  clustered file often sets few words), encoded as
  ``"{m}:{k}:{idx}={word_hex},..."`` in the manifest's string map.

Query path (``bloom_might_contain``) replicates the two Spark hashes with
the pure-Python xxh64 replica (functions/xxh64.py) including JVM 64-bit
wraparound in ``h1 + i*h2``, so a bit the build set is exactly the bit the
probe tests. False → the value is PROVABLY absent from the file; True →
read it (blooms only ever skip, never filter rows — Catalyst re-applies the
predicate, so correctness never depends on this layer).

Sizing: m bits per file from the ``stats.bloom-bits`` table property
(default 8192 = 1 KiB/file), k=4. FPR ≈ (1-e^{-kn/m})^k ≈ 2.4% at n=1000
distinct keys per file; at 10^12 turns with ~32 MB files the manifests grow
by ~1 KiB/file — the same order as the existing bounds maps — and the
harvest shuffle stays ≤ 128 words/file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.xxh64 import spark_xxhash64_string

BLOOM_DEFAULT_BITS = 8192
BLOOM_K = 4
_H2_SALT = "\x01"  # second hash = xxhash64(value || salt), forced odd
_U64 = (1 << 64) - 1


def bloom_key(col: str) -> str:
    return f"bloom({col})"


def encode_bloom(m: int, k: int, words: dict[int, int]) -> str:
    body = ",".join(f"{i}={w & _U64:x}" for i, w in sorted(words.items()) if w)
    return f"{m}:{k}:{body}"


def decode_bloom(s: str) -> tuple[int, int, dict[int, int]]:
    m_s, k_s, body = s.split(":", 2)
    words = {}
    if body:
        for tok in body.split(","):
            i, w = tok.split("=")
            words[int(i)] = int(w, 16)
    return int(m_s), int(k_s), words


def _positions(value: str, m: int, k: int) -> list[int]:
    # Both hashes are reduced mod m BEFORE the double-hash walk so the JVM
    # side needs no overflowing 64-bit arithmetic (ANSI mode forbids it);
    # (h1 + i*h2) mod m is unchanged by the reduction. m must be a power of
    # two: then `| 1` before the reduction keeps the step odd, i.e. the k
    # probes never collapse onto a sub-cycle of the table.
    # Python % on a signed int is already pmod (non-negative for m > 0).
    h1 = spark_xxhash64_string(value) % m
    h2 = (spark_xxhash64_string(value + _H2_SALT) | 1) % m
    return [(h1 + i * h2) % m for i in range(k)]


def _find_word(body: str, idx: int) -> int:
    """Fetch word ``idx`` from the sparse ``"i=hex,..."`` body WITHOUT
    materializing the full word dict. A densely-set bloom (a clustered
    32 MB file holds ~8k distinct keys) encodes to tens of KB; a probe
    needs only k words of it, so driver-side point-lookup planning over
    many files does k C-speed substring finds per file instead of parsing
    thousands of tokens per file."""
    tok = f"{idx}="
    at = body.find("," + tok)
    if at >= 0:
        start = at + 1 + len(tok)
    elif body.startswith(tok):
        start = len(tok)
    else:
        return 0
    end = body.find(",", start)
    return int(body[start:] if end < 0 else body[start:end], 16)


def bloom_of_values(values, m: int = BLOOM_DEFAULT_BITS, k: int = BLOOM_K) -> str:
    """Encoded bitset of the given string values — same hash family as the
    harvested per-file blooms, so the result is directly comparable with
    ``bloom_might_contain`` / ``blooms_disjoint``."""
    words: dict[int, int] = {}
    for v in values:
        for pos in _positions(str(v), m, k):
            words[pos >> 6] = words.get(pos >> 6, 0) | (1 << (pos & 63))
    return encode_bloom(m, k, words)


def blooms_disjoint(a: str, b: str) -> bool:
    """True when two same-geometry bitsets PROVE their key sets share no
    value: any shared value sets the same k positions in both (same m, k,
    hash family), so an empty word-wise AND rules out every common key.
    A nonempty AND (possibly bit-collision) or mismatched geometry returns
    False — the caller must treat that conservatively. Cost is one pass
    over the SMALLER sparse word map (an equality delete's bitset has a few
    set words; a data file's has thousands) — pure driver-side metadata."""
    am, ak, abody = a.split(":", 2)
    bm, bk, bbody = b.split(":", 2)
    if (am, ak) != (bm, bk):
        return False
    small, big = (abody, bbody) if len(abody) <= len(bbody) else (bbody, abody)
    if not small:
        return True
    for tok in small.split(","):
        i, w = tok.split("=")
        if int(w, 16) & _find_word(big, int(i)):
            return False
    return True


def bloom_might_contain(encoded: str, value: str) -> bool:
    m_s, k_s, body = encoded.split(":", 2)
    m, k = int(m_s), int(k_s)
    for pos in _positions(value, m, k):
        if not (_find_word(body, pos >> 6) >> (pos & 63)) & 1:
            return False
    return True


def harvest_blooms(
    df: DataFrame,
    path_col: str,
    cols: list[str],
    *,
    m: int = BLOOM_DEFAULT_BITS,
    k: int = BLOOM_K,
) -> dict[str, dict[str, str]]:
    """{file_path: {bloom(col): encoded}} for every file in ``df``.

    One job per call covering ALL bloom columns: each column contributes k
    (file, word_idx, bit) rows per input row; ``bit_or`` folds them map-side
    so the shuffle and the driver collect are O(files × m/64), independent
    of row count."""
    if not cols:
        return {}
    if m & (m - 1):
        raise ValueError(f"bloom m must be a power of two, got {m}")
    branches = []
    for c in cols:
        h1 = F.pmod(F.xxhash64(F.col(c)), F.lit(m))
        h2 = F.pmod(F.xxhash64(F.concat(F.col(c), F.lit(_H2_SALT)))
                    .bitwiseOR(F.lit(1).cast("long")), F.lit(m))
        poss = F.array(*[F.pmod(h1 + F.lit(i).cast("long") * h2, F.lit(m))
                         for i in range(k)])
        branches.append(
            df.filter(F.col(c).isNotNull())
            .select(F.col(path_col).alias("_fp"), F.lit(c).alias("_col"),
                    F.explode(poss).alias("_pos"))
        )
    exploded = branches[0]
    for b in branches[1:]:
        exploded = exploded.unionByName(b)
    words = (
        exploded
        .select("_fp", "_col", (F.col("_pos") / 64).cast("int").alias("_wi"),
                F.expr("shiftleft(1L, cast(_pos % 64 as int))").alias("_w"))
        .groupBy("_fp", "_col", "_wi")
        .agg(F.bit_or("_w").alias("_word"))
        .collect()
    )
    acc: dict[str, dict[str, dict[int, int]]] = {}
    for r in words:
        acc.setdefault(r["_fp"], {}).setdefault(r["_col"], {})[r["_wi"]] = r["_word"]
    return {
        fp: {bloom_key(c): encode_bloom(m, k, ws) for c, ws in by_col.items()}
        for fp, by_col in acc.items()
    }


def harvest_key_stats(
    df: DataFrame,
    path_col: str,
    hash_cols: list[str],
    bloom_cols: list[str],
    *,
    m: int = BLOOM_DEFAULT_BITS,
    k: int = BLOOM_K,
) -> dict[str, dict]:
    """ONE fused narrow job computing BOTH per-file xxh64 hash bounds (for
    ``hash_cols``) and bloom bitsets (for ``bloom_cols``).

    The post-write harvest used to be two jobs — a min/max(xxhash64) agg
    plus the explode-based ``harvest_blooms`` — each re-scanning the same
    key column of the files just written; measured together they were the
    dominant per-write serial floor once footer stats removed the wide
    scan. This fusion runs a single scan that ships only
    ``(file, h1, h2)`` longs (hashes computed JVM-side by Catalyst, never
    strings).

    MAP-SIDE PARTIALS, no row shuffle: rows arrive file-contiguous from the
    scan, so a ``mapInPandas`` pass folds each Arrow batch into per-(file,
    column) partial bitsets (numpy scatter-OR) and h1 min/max. Only those
    ~1 KiB partials — one per batch per column, not one row per key — cross
    the wire into the final ``groupBy(file)`` merge. The previous
    ``groupBy(file).applyInPandas`` single-stage version shuffled every
    (file, h1, h2) row: ~25 bytes/turn, i.e. a full-data exchange per write
    at the 10^12-turn design point, and the measured non-scaling component
    of the post-write harvest in the two-cluster-size protocol.

    NULL keys are masked JVM-side into a boolean column, and partial bounds
    travel as non-null int64 + presence flag, so int64 hash precision
    survives the pandas transfer (a nullable long would degrade to float64).

    BLOOM-FREE FAST PATH: when ``bloom_cols`` is empty the bitset machinery
    is dead weight, yet the pandas stages would still pay Python worker
    spawn + numpy/pandas import on first use in a JVM. Hash bounds alone
    are a plain ``groupBy(file).agg(min/max(xxhash64))`` —
    whole-stage-codegen'd, map-side-combined, zero Python processes — so
    that path is taken instead and rows ship through pandas only when
    bitsets are actually requested. (stats.harvest_file_stats routes
    bloom-free harvests to its own agg already; this guard makes the fused
    entry point safe to call directly with either shape.)

    Returns ``{file_path: {"hash_bounds": {col: (lo, hi)},
    "blooms": {bloom(col): encoded}}}``.
    """
    import numpy as np
    import pandas as pd

    if m & (m - 1):
        raise ValueError(f"bloom m must be a power of two, got {m}")
    all_cols = list(dict.fromkeys([*hash_cols, *bloom_cols]))
    if not all_cols:
        return {}
    if not bloom_cols:
        # null keys hash to NULL (not the xxhash64 seed) so min/max skip them,
        # matching the pandas path's isNotNull mask
        sel = [F.col(path_col).alias("_fp")] + [
            F.when(F.col(c).isNotNull(), F.xxhash64(F.col(c))).alias(f"_h_{c}")
            for c in all_cols
        ]
        aggs = []
        for c in all_cols:
            aggs.append(F.min(f"_h_{c}").alias(f"_lo_{c}"))
            aggs.append(F.max(f"_h_{c}").alias(f"_hi_{c}"))
        acc: dict[str, dict] = {}
        for r in df.select(*sel).groupBy("_fp").agg(*aggs).collect():
            e = acc.setdefault(r["_fp"], {"hash_bounds": {}, "blooms": {}})
            for c in all_cols:
                if r[f"_lo_{c}"] is not None:
                    e["hash_bounds"][c] = (r[f"_lo_{c}"], r[f"_hi_{c}"])
        return acc
    sel = [F.col(path_col).alias("_fp")]
    for c in all_cols:
        h1 = F.xxhash64(F.col(c))
        sel.append(F.col(c).isNotNull().alias(f"_nn_{c}"))
        sel.append(F.coalesce(h1, F.lit(0).cast("long")).alias(f"_h1_{c}"))
        if c in bloom_cols:
            h2 = (F.xxhash64(F.concat(F.col(c), F.lit(_H2_SALT)))
                  .bitwiseOR(F.lit(1).cast("long")))
            sel.append(F.coalesce(h2, F.lit(1).cast("long")).alias(f"_h2_{c}"))
    keyed = df.select(*sel)

    hash_set, bloom_set = set(hash_cols), set(bloom_cols)
    partial_schema = ("_fp string, _col string, _has boolean, _lo long, "
                      "_hi long, _bits binary")

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"_fp": [], "_col": [], "_has": [], "_lo": [], "_hi": [],
                   "_bits": []}
            # a scan partition packs whole files sequentially, so a batch
            # holds at most a couple of file runs; group within the batch
            for fp, g in pdf.groupby("_fp", sort=False):
                for c in all_cols:
                    mask = g[f"_nn_{c}"].to_numpy(dtype=bool)
                    h1 = g[f"_h1_{c}"].to_numpy(dtype=np.int64)[mask]
                    has = bool(h1.size)
                    lo = int(h1.min()) if has else 0
                    hi = int(h1.max()) if has else 0
                    raw = None
                    if c in bloom_set:
                        bits = np.zeros(m // 64, dtype=np.uint64)
                        if has:
                            h2 = g[f"_h2_{c}"].to_numpy(dtype=np.int64)[mask]
                            with np.errstate(over="ignore"):
                                p1 = (h1 % m).astype(np.uint64)
                                p2 = (h2 % m).astype(np.uint64)
                                for i in range(k):
                                    # hashes reduced mod m BEFORE the
                                    # double-hash walk, same as _positions
                                    # and harvest_blooms — no overflow, bit
                                    # placement identical
                                    pos = (p1 + np.uint64(i) * p2) % np.uint64(m)
                                    np.bitwise_or.at(
                                        bits, pos // np.uint64(64),
                                        np.uint64(1) << (pos % np.uint64(64)))
                        raw = bits.tobytes()
                    out["_fp"].append(fp)
                    out["_col"].append(c)
                    out["_has"].append(has)
                    out["_lo"].append(lo)
                    out["_hi"].append(hi)
                    out["_bits"].append(raw)
            yield pd.DataFrame(out)

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        fp = pdf["_fp"].iloc[0]
        out = {"_fp": [], "_col": [], "_lo": [], "_hi": [], "_bloom": []}
        for c in all_cols:
            sub = pdf[pdf["_col"] == c]
            hasm = sub["_has"].to_numpy(dtype=bool)
            lo = hi = None
            if c in hash_set and hasm.any():
                lo = int(sub["_lo"].to_numpy(dtype=np.int64)[hasm].min())
                hi = int(sub["_hi"].to_numpy(dtype=np.int64)[hasm].max())
            enc = None
            if c in bloom_set:
                bits = np.zeros(m // 64, dtype=np.uint64)
                for raw in sub["_bits"]:
                    if raw is not None:
                        bits |= np.frombuffer(bytes(raw), dtype=np.uint64)
                nz = np.nonzero(bits)[0]
                enc = encode_bloom(
                    m, k, {int(w): int(bits[w]) for w in nz})
            out["_fp"].append(fp)
            out["_col"].append(c)
            out["_lo"].append(lo)
            out["_hi"].append(hi)
            out["_bloom"].append(enc)
        return pd.DataFrame(out)

    rows = (
        keyed.mapInPandas(partials, partial_schema)
        .groupBy("_fp")
        .applyInPandas(merge,
                       "_fp string, _col string, _lo long, _hi long, _bloom string")
        .collect()
    )
    acc: dict[str, dict] = {}
    for r in rows:
        e = acc.setdefault(r["_fp"], {"hash_bounds": {}, "blooms": {}})
        if r["_lo"] is not None:
            e["hash_bounds"][r["_col"]] = (r["_lo"], r["_hi"])
        if r["_bloom"] is not None:
            e["blooms"][bloom_key(r["_col"])] = r["_bloom"]
    return acc
