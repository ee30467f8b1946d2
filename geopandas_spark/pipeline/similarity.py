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


def lsh_sign_bucket(vec_col, planes: int = 8, offset: int = 0) -> Column:
    """Hyperplane-sign bucket id from ``planes`` dimensions starting at
    ``offset`` (deterministic axis-aligned planes — no RNG, reproducible
    anywhere). Distinct offsets give independent band tables."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0)
    for i in range(planes):
        bucket = bucket + F.when(F.element_at(v, offset + i + 1) > 0,
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


def _lit_vec(vals) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def ivf_topk(df: DataFrame, queries: DataFrame, k: int = 5, *,
             vec_col: str = "embedding", id_col: str = "vec_id",
             nlist: int = 8, nprobe: int = 3,
             exclude_self: bool = True) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Centroids are the ``nlist`` lowest-id vectors — a deterministic stand-in
    for offline k-means training (at cluster scale you train centroids once
    and broadcast them; the query plan is identical). Scale shape:

    - assignment is **pure map-side codegen**: centroids are collected once
      (tiny) and inlined as literal arrays, so each corpus vector finds its
      nearest list via one projection — no shuffle, no UDF, whole-stage
      codegen over the 100 TB scan;
    - each query probes its ``nprobe`` nearest lists; candidates come from
      an equi-join on the list id (hash join, AQE-aware) instead of the
      brute-force cross join — a ~corpus/nlist·nprobe candidate reduction;
    - only the final per-query top-k ranks with a window (q_id cardinality
      = number of queries, small).

    Ties break exactly like :func:`cosine_topk` (score desc, id asc, scores
    rounded to 1e-6) so results are engine-reproducible.
    """
    cents = (df.select(F.col(id_col).alias("cent_id"),
                       F.col(vec_col).alias("cvec"))
               .orderBy("cent_id").limit(nlist).collect())
    cents = [(int(r["cent_id"]), [float(x) for x in r["cvec"]])
             for r in cents]

    def nearest_struct(vec):
        """array_max over per-centroid (score, -id) structs = argmax with
        the (score desc, id asc) tie-break, all JVM-side."""
        entries = []
        for cid, cvec in cents:
            cv = _lit_vec(cvec)
            s = F.round(dot(vec, cv) / (norm(vec) * norm(cv)), 6)
            entries.append(F.struct(s.alias("s"),
                                    F.lit(-cid).alias("nid")))
        return F.array(*entries)

    corpus = (df.select(F.col(id_col).alias("c_id"),
                        F.col(vec_col).alias("c_vec"))
                .withColumn("__list__",
                            -F.array_max(nearest_struct(F.col("c_vec")))["nid"]))
    probes = (queries.select(F.col(id_col).alias("q_id"),
                             F.col(vec_col).alias("q_vec"))
                     .withColumn("__pl__",
                                 F.slice(F.sort_array(
                                     nearest_struct(F.col("q_vec")), False),
                                     1, nprobe))
                     .withColumn("__p__", F.explode("__pl__"))
                     .select("q_id", "q_vec",
                             (-F.col("__p__.nid")).alias("__list__")))
    scored = (corpus.join(F.broadcast(probes), on="__list__")
                    .withColumn("score", F.round(cosine("c_vec", "q_vec"), 6)))
    if exclude_self:
        scored = scored.filter(F.col("c_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(),
                                           F.col("c_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("q_id", "c_id", "score", "rank"))


def embedding_dedup_pairs(df: DataFrame, threshold: float = 0.4, *,
                          vec_col: str = "embedding", id_col: str = "vec_id",
                          method: str = "lsh", planes: int = 6,
                          bands: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score >= threshold).

    ``method='exact'`` scores every pair — the verification baseline, and
    what the SQL oracle checks. ``method='lsh'`` is the scale path: ``bands``
    independent sign-hash band tables generate candidates through equi-joins
    on the bucket key (each band looks at a disjoint ``planes``-dim slice),
    the union dedupes, and only candidates pay the exact cosine. Recall is
    1-(1-p^planes)^bands for pair agreement probability p — tune bands up
    for higher recall at more candidate volume.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va__"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb__"))
    if method == "exact":
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        parts = []
        for band in range(bands):
            off = band * planes
            la = a.withColumn("__bk__",
                              lsh_sign_bucket("__va__", planes, off))
            lb = b.withColumn("__bk__",
                              lsh_sign_bucket("__vb__", planes, off))
            parts.append(la.join(lb, on="__bk__")
                           .filter(F.col("id_a") < F.col("id_b"))
                           .drop("__bk__"))
        cand = parts[0]
        for p in parts[1:]:
            cand = cand.unionByName(p)
        cand = cand.dropDuplicates(["id_a", "id_b"])
    else:
        raise ValueError(f"unknown method {method!r}")
    return (cand.withColumn("score", F.round(cosine("__va__", "__vb__"), 6))
                .filter(F.col("score") >= threshold)
                .select("id_a", "id_b", "score"))
