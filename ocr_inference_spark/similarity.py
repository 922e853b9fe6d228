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
    ).where(F.col("cnorm") > 0)  # cosine undefined for zero vectors (ANSI div/0)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    ).where(F.col("qnorm") > 0)
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
    def table_buckets(df):
        """array of per-table bucket ids (index = table id)."""
        tables = []
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
            tables.append(plane)
        return F.array(*tables)

    # Explode both sides to (table_id, bucket) rows and EQUI-join on
    # ["t", "bucket"]. An OR-of-equalities condition cannot be planned as
    # a hash join (Spark falls back to BroadcastNestedLoopJoin, i.e. the
    # same O(N·Q) pair scan as brute force); the exploded equi-join is a
    # real hash/bucket join that only touches same-bucket pairs.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
        F.posexplode(table_buckets(corpus[vec_col])).alias("t", "bucket"),
    ).where(F.col("cnorm") > 0)  # cosine undefined for zero vectors
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(table_buckets(queries[vec_col])).alias("t", "bucket"),
    )
    cand = (
        c.join(F.broadcast(q), ["t", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        # a pair may collide in several tables — dedup before re-ranking
        .select("query_id", "neighbor_id", "cvec", "cnorm")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    ).where(F.col("qnorm") > 0)
    scored = cand.join(F.broadcast(qvecs), "query_id").withColumn(
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
