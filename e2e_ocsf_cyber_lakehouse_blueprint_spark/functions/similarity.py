"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the correctness baseline. Dot products are pure
  Catalyst (`F.zip_with` + `F.aggregate` in double precision — deterministic
  left-to-right accumulation both here and in the DuckDB oracle).
- LSH-bucketed ANN: random-hyperplane signatures (a vectorized pandas UDF doing
  one matmul per Arrow batch) -> candidates share a signature bucket -> exact
  re-rank within buckets. The scale path: the self-join is per bucket, never
  all-pairs, and the hyperplanes are broadcast once per executor.
- IVF-style variant: k deterministic centroid seeds, route each vector to its
  nearest centroid (one matmul), probe n_probe cells at query time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector — one scan, one top-k sort
    (Spark's TakeOrderedAndProject: no full shuffle for small k)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def pairwise_cosine_knn(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs with cosine >= threshold (exact; for modest N or as verifier).

    Normalizes once, joins on nothing (cartesian bounded by caller) — use the
    LSH path for large N.
    """
    n = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_n"),
    )
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(b, F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(
                dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ------------------------------------------------------------------ LSH ANN

def _hyperplanes(dim: int, n_planes: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(dim, n_planes)).astype(np.float64)


def _sign_sig_batch_factory(dim: int, n_planes: int, seed: int):
    H = _hyperplanes(dim, n_planes, seed)

    def _fn(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=np.int64)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (M @ H) > 0  # one matmul per Arrow batch
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((bits @ weights).astype(np.int64))

    return _fn


def lsh_bucket_column(dim: int, n_planes: int = 16, seed: int = 11):
    return pandas_udf(_sign_sig_batch_factory(dim, n_planes, seed), "long")


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 11,
) -> DataFrame:
    """ANN top-k: filter to the query's hyperplane bucket, exact re-rank inside.

    Recall < 1.0 by construction; tests compare against brute force for
    overlap. At scale the bucket column is precomputed+persisted (cluster by
    bucket) so queries touch one bucket's files only.
    """
    dim = len(query_vec)
    H = _hyperplanes(dim, n_planes, seed)
    qsig = int(((np.asarray(query_vec, dtype=np.float64) @ H) > 0)
               @ (1 << np.arange(n_planes, dtype=np.int64)))
    bucket = lsh_bucket_column(dim, n_planes, seed)
    candidates = df.withColumn("_b", bucket(F.col(vec_col))).filter(F.col("_b") == qsig)
    return brute_force_topk(candidates, query_vec, id_col=id_col, vec_col=vec_col, k=k)


# ------------------------------------------------------------------ IVF

def _ivf_centroids(n_cells: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    C = rng.normal(size=(n_cells, dim))
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def ivf_assign(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    n_cells: int = 16,
    dim: int | None = None,
    seed: int = 13,
) -> DataFrame:
    """Assign each vector to its nearest of n_cells deterministic random
    centroids (unit-normalized gaussians) — the partitioning half of IVF."""
    sample = df.select(vec_col).first()
    d = dim or len(sample[0])
    C = _ivf_centroids(n_cells, d, seed)

    def _assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=np.int32)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(Mn @ C.T, axis=1).astype(np.int32))

    udf = pandas_udf(_assign, "int")
    return df.withColumn("ivf_cell", udf(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 13,
) -> DataFrame:
    """IVF ANN search: route vectors to centroid cells (ivf_assign), probe the
    query's n_probe nearest cells, exact cosine re-rank within.

    At scale the table is written partitioned by ivf_cell, so the probe filter
    becomes partition pruning (scan n_probe/n_cells of the data); here the
    filter runs over the assignment column directly."""
    assigned = ivf_assign(df, vec_col=vec_col, n_cells=n_cells, seed=seed)
    C = _ivf_centroids(n_cells, len(query_vec), seed)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(C @ q), kind="stable")[:n_probe]
    cand = assigned.filter(F.col("ivf_cell").isin([int(c) for c in probe]))
    return brute_force_topk(cand, query_vec, id_col=id_col, vec_col=vec_col, k=k)
