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


def dot(a, b, dim: int = None) -> Column:
    """Sequential left-associated dot product.

    With ``dim`` the sum is unrolled into a flat ``e1*f1 + e2*f2 + …``
    expression — higher-order functions (aggregate/zip_with) are
    CodegenFallback in Spark, so the unrolled form runs in whole-stage
    codegen ~10× faster while keeping the exact same left-to-right
    accumulation order (bit-identical to the aggregate form and to the
    DuckDB list_sum oracle twin). Without ``dim`` (ragged arrays) the
    aggregate form is used."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    if dim:
        out = F.element_at(a, 1).cast("double") * \
            F.element_at(b, 1).cast("double")
        for i in range(2, dim + 1):
            out = out + F.element_at(a, i).cast("double") * \
                F.element_at(b, i).cast("double")
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y:
                   x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def norm(a, dim: int = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a, b, dim: int = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def _vec_dim(df: DataFrame, vec_col: str):
    """Fixed vector dimensionality (one tiny first() job), or None if the
    frame is empty. Embedding tables are fixed-dim in practice; the dim
    unlocks the codegen'd unrolled dot product."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"]) if row is not None and row["d"] is not None else None


def cosine_topk(df: DataFrame, queries: DataFrame, k: int = 5, *,
                vec_col: str = "embedding", id_col: str = "vec_id",
                q_vec_col: str = "embedding", q_id_col: str = "vec_id",
                exclude_self: bool = True) -> DataFrame:
    """Exact brute-force cosine top-k per query.

    queries is expected to be small (broadcast); the corpus side streams.
    Scores are rounded to 1e-6 before ranking with an id tie-break so
    results are deterministic across summation engines."""
    dim = _vec_dim(df, vec_col)
    # norms hoisted out of the pair join: each side's norm is computed
    # once per row, not once per (candidate × query) pair
    q = F.broadcast(queries.select(F.col(q_id_col).alias("q_id"),
                                   F.col(q_vec_col).alias("q_vec"))
                    .withColumn("q_norm", norm("q_vec", dim)))
    scored = (df.select(F.col(id_col).alias("c_id"),
                        F.col(vec_col).alias("c_vec"))
                .withColumn("c_norm", norm("c_vec", dim))
                .crossJoin(q)
                .withColumn("score", F.round(
                    dot("c_vec", "q_vec", dim) /
                    (F.col("c_norm") * F.col("q_norm")), 6)))
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
    dim = _vec_dim(df, vec_col)
    c = df.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"),
                  lsh_sign_bucket(vec_col, planes).alias("bucket")) \
          .withColumn("c_norm", norm("c_vec", dim))
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).alias("q_vec"),
                       lsh_sign_bucket(vec_col, planes).alias("bucket")) \
               .withColumn("q_norm", norm("q_vec", dim))
    scored = (c.join(F.broadcast(q), on="bucket")
               .filter(F.col("c_id") != F.col("q_id"))
               .withColumn("score", F.round(
                   dot("c_vec", "q_vec", dim) /
                   (F.col("c_norm") * F.col("q_norm")), 6)))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(),
                                           F.col("c_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("q_id", "c_id", "score", "rank"))


def _lit_vec(vals) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _nearest_struct_expr(vec, cents, dim):
    """array of per-centroid (cosine-score, -label) structs for `vec`;
    array_max of it = (score desc, label asc) argmax, all JVM-side.
    Centroid elements inline as scalar literals (see _dot_lit note)."""
    import math

    def _dot_lit(v, cvec):
        out = F.element_at(v, 1).cast("double") * F.lit(float(cvec[0]))
        for i in range(1, len(cvec)):
            out = out + F.element_at(v, i + 1).cast("double") * \
                F.lit(float(cvec[i]))
        return out

    vn = norm(vec, dim)
    entries = []
    for cid, cvec in cents:
        acc = float(cvec[0]) * float(cvec[0])
        for x in cvec[1:]:
            acc = acc + float(x) * float(x)
        cn = math.sqrt(acc) or 1.0
        s = F.round(_dot_lit(vec, cvec) / (vn * F.lit(cn)), 6)
        entries.append(F.struct(s.alias("s"), F.lit(-cid).alias("nid")))
    return F.array(*entries)


def kmeans_centroids(df: DataFrame, *, vec_col: str = "embedding",
                     id_col: str = "vec_id", k: int = 8,
                     iters: int = 5) -> list:
    """Distributed spherical Lloyd's k-means returning [(label, vector)]
    for use as IVF centroids (``ivf_topk(centroids=...)``).

    Deterministic by construction (reproducible across retries/engines):
    init = the k lowest-id vectors; each iteration is one fully native
    pass — inlined-literal cosine assignment (the same codegen shape as
    the IVF list assignment, no UDF, no shuffle before the agg) →
    posexplode → groupBy (cluster, dim) avg → collect k×dim doubles.
    Empty clusters keep their previous centroid. Driver state is
    k×dim floats; the corpus is scanned ``iters`` times."""
    dim = _vec_dim(df, vec_col)
    init = (df.select(F.col(id_col).alias("cid"),
                      F.col(vec_col).alias("cvec"))
              .orderBy("cid").limit(k).collect())
    cents = [(i, [float(x) for x in r["cvec"]])
             for i, r in enumerate(init)]
    base = df.select(F.col(vec_col).alias("v"))
    for _ in range(int(iters)):
        assign = -F.array_max(
            _nearest_struct_expr(F.col("v"), cents, dim))["nid"]
        means = (base.withColumn("__c__", assign)
                 .select("__c__", F.posexplode("v").alias("pos", "x"))
                 .groupBy("__c__", "pos")
                 .agg(F.avg(F.col("x").cast("double")).alias("m"))
                 .collect())
        upd = {}
        for r in means:
            upd.setdefault(int(r["__c__"]), {})[int(r["pos"])] = float(r["m"])
        cents = [(cid,
                  [upd[cid][p] for p in range(dim)] if cid in upd else old)
                 for cid, old in cents]
    return cents


def ivf_topk(df: DataFrame, queries: DataFrame, k: int = 5, *,
             vec_col: str = "embedding", id_col: str = "vec_id",
             nlist: int = 8, nprobe: int = 3,
             exclude_self: bool = True, centroids=None) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Default centroids are the ``nlist`` lowest-id vectors — a
    deterministic stand-in usable as an oracle fixture; pass
    ``centroids=kmeans_centroids(df, k=nlist)`` (or any [(label, vec)]
    list) for trained lists — at cluster scale you train once offline
    and broadcast. Scale shape:

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
    dim = _vec_dim(df, vec_col)
    if centroids is not None:
        cents = [(int(cid), [float(x) for x in cvec])
                 for cid, cvec in centroids]
    else:
        rows = (df.select(F.col(id_col).alias("cent_id"),
                          F.col(vec_col).alias("cvec"))
                  .orderBy("cent_id").limit(nlist).collect())
        cents = [(int(r["cent_id"]), [float(x) for x in r["cvec"]])
                 for r in rows]

    import math

    def _dot_lit(vec, cvec):
        """Unrolled vec·centroid with the centroid elements inlined as
        scalar literals (not a literal array — element_at over a 64-elem
        literal array per term blows the janino method-size limit and
        forces interpreter fallback). Same left-assoc order as dot()."""
        out = F.element_at(vec, 1).cast("double") * F.lit(float(cvec[0]))
        for i in range(1, len(cvec)):
            out = out + F.element_at(vec, i + 1).cast("double") * \
                F.lit(float(cvec[i]))
        return out

    def nearest_struct(vec):
        """array_max over per-centroid (score, -id) structs = argmax with
        the (score desc, id asc) tie-break, all JVM-side. Centroid norms
        are Python-precomputed doubles — bit-identical to the JVM's
        sequential sum + Math.sqrt on the same values."""
        vn = norm(vec, dim)
        entries = []
        for cid, cvec in cents:
            acc = float(cvec[0]) * float(cvec[0])
            for x in cvec[1:]:
                acc = acc + float(x) * float(x)
            cn = math.sqrt(acc)
            s = F.round(_dot_lit(vec, cvec) / (vn * F.lit(cn)), 6)
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
                    .withColumn("score",
                                F.round(cosine("c_vec", "q_vec", dim), 6)))
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
    dim = _vec_dim(df, vec_col)
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
    return (cand.withColumn("score",
                            F.round(cosine("__va__", "__vb__", dim), 6))
                .filter(F.col("score") >= threshold)
                .select("id_a", "id_b", "score"))


def _abs_max(vec, dim: int = None) -> Column:
    """max(|v_i|) — unrolled into codegen'd GREATEST when dim is known."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    if dim:
        parts = [F.abs(F.element_at(vec, i).cast("double"))
                 for i in range(1, dim + 1)]
        return parts[0] if dim == 1 else F.greatest(*parts)
    return F.aggregate(vec, F.lit(0.0),
                       lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))))


def quantize_embeddings(df: DataFrame, *, vec_col: str = "embedding",
                        out_col: str = "qvec", scale_col: str = "qscale",
                        dim: int = None) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the standard 4×
    compression for trillion-token embedding stores (engine-added; the
    reference has no embedding surface at all).

    scale = max|v|/127; q_i = floor(v_i/scale + 0.5) ∈ [-127, 127]
    (floor(x+0.5) rather than round() so the twin's arithmetic is
    engine-independent), stored as array<tinyint> + a double scale.
    Cosine is scale-invariant, so quantized cosine approximates the
    exact score within ~1/127 per component; reconstruction error is
    bounded by scale/2 per component. Fully native columnar expressions
    — at 100 TB this is a map-only pass that writes a 4×-smaller
    column."""
    dim = dim or _vec_dim(df, vec_col)
    v = F.col(vec_col)
    scale = _abs_max(v, dim) / F.lit(127.0)
    safe = F.when(scale > 0, scale).otherwise(F.lit(1.0))
    if dim:
        q = F.array(*[
            F.floor(F.element_at(v, i).cast("double") / safe + 0.5)
             .cast("tinyint") for i in range(1, dim + 1)])
    else:
        q = F.transform(v, lambda x:
                        F.floor(x.cast("double") / safe + 0.5)
                         .cast("tinyint"))
    return (df.withColumn(scale_col, safe)
              .withColumn(out_col, q))


def dequantize(qvec, scale) -> Column:
    """array<tinyint> + scale → array<double> reconstruction."""
    qvec = F.col(qvec) if isinstance(qvec, str) else qvec
    scale = F.col(scale) if isinstance(scale, str) else scale
    return F.transform(qvec, lambda q: q.cast("double") * scale)
