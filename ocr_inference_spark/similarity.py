"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k neighbours — the correctness
  baseline. The dot product is a JVM-side ``F.zip_with`` +
  ``F.aggregate`` (no Python), norms are precomputed once per side, and
  the query side is broadcast (queries << corpus).
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic planes from xxhash64 of the dimension index), candidate
  join within buckets, exact re-rank of candidates. At 10^12 rows the
  bucket join replaces the O(Q·N) scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """For every query vector: top-k corpus neighbours by cosine.

    Output: (query_id, neighbor_id, cosine, rank); self-matches excluded.
    Ties broken by neighbor id for cross-engine determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane_sign(vec, plane_seed: int, dim: int):
    """Sign bit of <v, h_seed> for a deterministic pseudo-random
    hyperplane: component j of h = xxhash64(j, seed) mapped to ±1."""
    signs = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(
            F.pmod(F.xxhash64(j, F.lit(plane_seed)), F.lit(2)) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0)),
    )
    return (
        F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x * s),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        > 0
    ).cast("int")


def lsh_bucket(vec, n_planes: int, dim: int):
    """Concatenated hyperplane sign bits -> integer bucket id."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bucket = bucket.bitwiseOR(
            F.shiftleft(_hyperplane_sign(vec, p, dim).cast("long"), p)
        )
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH candidates, exact
    cosine re-rank. Each of ``n_tables`` tables offsets the plane seeds,
    so a near pair missed by one table is caught by another."""
    def with_buckets(df, prefix):
        out = df
        for t in range(n_tables):
            plane = F.lit(0).cast("long")
            for p in range(n_planes):
                plane = plane.bitwiseOR(
                    F.shiftleft(
                        _hyperplane_sign(
                            F.col(vec_col), t * n_planes + p, dim
                        ).cast("long"),
                        p,
                    )
                )
            out = out.withColumn(f"{prefix}b{t}", plane)
        return out

    c = with_buckets(corpus, "c").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
        *[F.col(f"cb{t}") for t in range(n_tables)],
    )
    q = with_buckets(queries, "q").select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
        *[F.col(f"qb{t}") for t in range(n_tables)],
    )
    cond = F.lit(False)
    for t in range(n_tables):
        cond = cond | (F.col(f"cb{t}") == F.col(f"qb{t}"))
    cand = c.join(F.broadcast(q), cond & (F.col("query_id") != F.col("neighbor_id")))
    scored = cand.withColumn(
        "cosine",
        F.round(
            _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")), 6
        ),
    ).select("query_id", "neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
