"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, one shuffle for the top-k.
Scale path: LSH sign-bucket search — candidates share a hyperplane-sign
bucket, cutting the candidate set by ~2^bits before scoring.

Numeric discipline: elements are cast to double BEFORE multiplying
(float×float is exact in double) and accumulated sequentially with
F.aggregate, so scores are deterministic and reproducible on any engine —
the DuckDB oracle computes bit-identical dot products."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a, b) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y:
                   x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(df: DataFrame, queries: DataFrame, k: int = 5, *,
                vec_col: str = "embedding", id_col: str = "vec_id",
                q_vec_col: str = "embedding", q_id_col: str = "vec_id",
                exclude_self: bool = True) -> DataFrame:
    """Exact brute-force cosine top-k per query.

    queries is expected to be small (broadcast); the corpus side streams.
    Scores are rounded to 1e-6 before ranking with an id tie-break so
    results are deterministic across summation engines."""
    q = F.broadcast(queries.select(F.col(q_id_col).alias("q_id"),
                                   F.col(q_vec_col).alias("q_vec")))
    scored = (df.select(F.col(id_col).alias("c_id"),
                        F.col(vec_col).alias("c_vec"))
                .crossJoin(q)
                .withColumn("score", F.round(cosine("c_vec", "q_vec"), 6)))
    if exclude_self:
        scored = scored.filter(F.col("c_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(),
                                           F.col("c_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("q_id", "c_id", "score", "rank"))


def lsh_sign_bucket(vec_col, planes: int = 8) -> Column:
    """Hyperplane-sign bucket id from the first ``planes`` dimensions
    (deterministic axis-aligned planes — no RNG, reproducible anywhere)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0)
    for i in range(planes):
        bucket = bucket + F.when(F.element_at(v, i + 1) > 0,
                                 F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_topk(df: DataFrame, queries: DataFrame, k: int = 5, *,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    planes: int = 6) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's sign bucket
    are scored. Recall loses near bucket boundaries; planes trades recall
    vs speedup (~2^planes candidate reduction)."""
    c = df.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"),
                  lsh_sign_bucket(vec_col, planes).alias("bucket"))
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).alias("q_vec"),
                       lsh_sign_bucket(vec_col, planes).alias("bucket"))
    scored = (c.join(F.broadcast(q), on="bucket")
               .filter(F.col("c_id") != F.col("q_id"))
               .withColumn("score", F.round(cosine("c_vec", "q_vec"), 6)))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(),
                                           F.col("c_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("q_id", "c_id", "score", "rank"))
