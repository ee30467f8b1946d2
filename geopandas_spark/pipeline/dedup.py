"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Design for 100 TB:
- exact dedup is a hash-groupBy (one shuffle on a 32-hex key, not the text);
- MinHash signatures are computed natively (shingles via substring
  sequences, per-permutation min over md5 — no Python in the plan), so the
  whole signature stage is whole-stage-codegen'd;
- LSH banding turns near-dup detection into an equi-join on (band, key):
  the classic shuffle-friendly formulation — candidate pairs only, never
  the full n² comparison;
- hashing is md5-based, deterministic and engine-portable (the DuckDB
  oracle computes the identical signatures in plain SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", keep: str = "min") -> DataFrame:
    """Keep one row per distinct ``text_col`` (the survivor has the
    min/max ``id_col``). Shuffles on md5(text), not the text itself."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h).orderBy(
        F.col(id_col).asc() if keep == "min" else F.col(id_col).desc())
    return (df.withColumn("__rn__", F.row_number().over(w))
              .filter(F.col("__rn__") == 1).drop("__rn__"))


def shingles(text_col, k: int = 5) -> Column:
    """Distinct character k-shingles of a string, as an array column.

    Pure native: substring over a sequence of offsets."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, k)))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       num_hashes: int = 8, k: int = 5,
                       out_prefix: str = "mh") -> DataFrame:
    """Add ``num_hashes`` MinHash signature columns.

    Permutation i is simulated by hashing each shingle as md5(i || '|' ||
    shingle) and taking the lexicographic min — deterministic across
    engines (DuckDB computes the same min(md5(...)) in SQL)."""
    sh = shingles(text_col, k)
    out = df.withColumn("__sh__", sh)
    for i in range(num_hashes):
        # NB: bind the prefix OUTSIDE the lambda — a 2-arg lambda would make
        # pyspark pass the array index as the second argument
        prefix = F.lit(f"{i}|")
        sig = F.array_min(
            F.transform(F.col("__sh__"),
                        lambda s: F.md5(F.concat(prefix, s))))
        out = out.withColumn(f"{out_prefix}{i}", sig)
    return out.drop("__sh__")


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 8,
                      bands: int = 4, k: int = 5,
                      bucket_window="auto",
                      hot_bucket_threshold: int = 8192,
                      auto_window: int = 4) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    rows-per-band = num_hashes // bands; two docs become a candidate pair
    iff some band of their signatures agrees exactly. Returns distinct
    (id_a, id_b) with id_a < id_b.

    ``bucket_window=None`` emits ALL pairs per bucket — the oracle
    twin's exact semantics (full recall), but O(n²) inside a bucket: one
    hot bucket (a template duplicated 100k×) emits 10^10 pairs and kills
    the job (measured: a 150k-row bucket at the 2M-row stress tier never
    finishes). ``bucket_window=w`` is the scale path: each doc pairs
    with its w id-order successors IN THE SAME BUCKET plus the bucket's
    minimum id (star edge), generated natively with window lead()/
    first() — NO self-join, O(n·(w+1)) pairs per bucket. Bucket
    connectivity is preserved (chain + star), and the star edge keeps
    every bucket's component diameter ≤ 2 so downstream min-label
    propagation converges in a few rounds; only when a verifier prunes
    star+chain edges that all-pairs would have kept can the final
    components differ.

    ``bucket_window="auto"`` (default, r10 ADVICE: the bounded path must
    not silently cost recall on ordinary corpora) probes bucket sizes on
    a deterministic 1/64 id-hash sample (one cheap extra action over the
    sampled rows only) and uses the exact all-pairs path unless some
    bucket's ESTIMATED size exceeds ``hot_bucket_threshold`` (default
    8192 ≈ 33M pairs from one bucket), in which case the bounded path
    with ``auto_window`` successors kicks in. A hot bucket big enough to
    matter (≥ threshold) is essentially guaranteed to surface in a 1/64
    sample (binomial: ≥8192 members → ~128 sampled ± 11)."""
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, num_hashes, k)
    sigs = sigs.select(id_col, *[f"mh{i}" for i in range(num_hashes)])
    keys = [F.concat_ws("#", *[F.col(f"mh{b * rows + r}")
                               for r in range(rows)])
            for b in range(bands)]
    if isinstance(bucket_window, str) and bucket_window == "auto":
        probe_max = (
            sigs.filter(F.crc32(F.col(id_col).cast("string")) % 64 == 0)
                .select(F.posexplode(F.array(*keys)).alias("band", "bk"))
                .groupBy("band", "bk").count()
                .agg(F.max("count").alias("m")).collect()[0]["m"]) or 0
        bucket_window = (auto_window
                         if probe_max * 64 >= hot_bucket_threshold
                         else None)
    if bucket_window is not None:
        # ONE plan: signatures evaluated once per row (the per-band
        # union recomputed the shingle+md5 pipeline once per band),
        # posexplode to (band, bucket) rows, one window shuffle
        from pyspark.sql import Window
        banded = sigs.select(F.col(id_col).alias("id"),
                             F.posexplode(F.array(*keys))
                              .alias("band", "bk"))
        w_ = Window.partitionBy("band", "bk").orderBy("id")
        nbrs = F.array(
            F.first("id").over(w_),
            *[F.lead("id", j).over(w_)
              for j in range(1, int(bucket_window) + 1)])
        p = (banded
             .withColumn("__nb__", nbrs)
             .select(F.col("id").alias("u"),
                     F.explode("__nb__").alias("v"))
             .filter(F.col("v").isNotNull() & (F.col("u") != F.col("v")))
             .select(F.least("u", "v").alias("id_a"),
                     F.greatest("u", "v").alias("id_b")))
        return p.distinct()
    pairs = None
    for b in range(bands):
        banded = sigs.select(F.col(id_col).alias("id"),
                             keys[b].alias("bk")) \
                     .withColumn("band", F.lit(b))
        a = banded.alias("a")
        bb = banded.alias("b")
        p = (a.join(bb, on=["band", "bk"])
              .filter(F.col("a.id") < F.col("b.id"))
              .select(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b")))
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 5,
                        threshold: float = 0.8,
                        candidates: DataFrame = None) -> DataFrame:
    """Exact character-k-gram Jaccard similarity for candidate pairs.

    ``candidates`` defaults to the LSH pairs — at scale never the n² cross
    join. Jaccard = |A∩B| / |A∪B| on distinct shingle sets (all native:
    array_intersect / array_union)."""
    if candidates is None:
        candidates = minhash_lsh_pairs(df, id_col, text_col, k=k)
    sh = df.select(F.col(id_col).alias("id"),
                   shingles(text_col, k).alias("sh"))
    j = (candidates
         .join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
               on="id_a")
         .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
               on="id_b")
         .withColumn("jaccard",
                     F.size(F.array_intersect("sh_a", "sh_b")) /
                     F.size(F.array_union("sh_a", "sh_b")))
         .select("id_a", "id_b", "jaccard"))
    return j.filter(F.col("jaccard") >= threshold)


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 25) -> DataFrame:
    """Duplicate clusters from candidate pairs: (id, comp) where ``comp``
    is the min id in the node's connected component.

    Iterative min-label propagation (the MapReduce connected-components
    family — Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): each round every node takes the min label over
    itself and its neighbors; converges in O(max component diameter)
    rounds, which for near-dup clusters (dense, star-like) is small.
    Each round is one shuffle-on-id join + groupBy; the frontier is
    persisted and the loop exits at the fixpoint (count of changed labels
    = 0 — one cheap action per round). At 100 TB the pairs input is the
    LSH/SimHash candidate set (linear-ish in corpus size), never n²."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges.persist()
    labels = (edges.select(F.col("src").alias("id")).distinct()
                   .withColumn("comp", F.col("id")))
    labels.persist()
    for _ in range(max_iter):
        nbr = (edges.join(labels.select(F.col("id").alias("dst"),
                                        F.col("comp").alias("dcomp")),
                          on="dst")
                    .groupBy("src").agg(F.min("dcomp").alias("ncomp")))
        new = (labels.join(nbr, labels["id"] == nbr["src"], "left")
                     .select(labels["id"],
                             F.least("comp", "ncomp").alias("comp"),
                             (F.col("ncomp") < F.col("comp"))
                             .alias("__chg__")))
        new = new.localCheckpoint(eager=True)   # truncate lineage per round
        changed = new.filter(F.col("__chg__")).limit(1).count()
        old = labels
        labels = new.drop("__chg__")
        old.unpersist()
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_by_components(df: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Drop near-duplicates: keep the min-id document of every duplicate
    cluster plus all documents that never appeared in a candidate pair.
    ``pairs`` is any (id_a, id_b) candidate set (LSH bands, SimHash
    blocks, embedding buckets) — composition point of the dedup stack."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("comp") != F.col("id")) \
                 .select(F.col("id").alias(id_col))
    return df.join(losers, on=id_col, how="left_anti")


def simhash64(text_col, k: int = 4, bits: int = 60) -> Column:
    """SimHash over character k-grams, fully native (≤ 60 bits).

    Each shingle's md5's leading hex chars give the bits; per bit position
    we sum +1/-1 votes across shingles and keep the sign. One aggregate
    pass with an array<int> vote accumulator (zip_with against a literal
    mask array) — the earlier per-bit formulation ran ``bits`` separate
    aggregate passes over the shingle array (60× the work and ~1.3 MiB of
    expression tree; the single-pass form measured 19× faster on 50k
    scale-tier documents with bit-identical output)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    sh = shingles(c, k)
    nhex = (bits + 3) // 4
    h = F.transform(sh, lambda s: F.conv(F.substring(F.md5(s), 1, nhex), 16, 10)
                    .cast("long"))
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    votes = F.aggregate(
        h, F.array_repeat(F.lit(0), bits),
        lambda acc, v: F.zip_with(
            acc, masks,
            lambda a, m: a + F.when(v.bitwiseAND(m) != 0, 1).otherwise(-1)))
    return F.aggregate(
        F.zip_with(votes, masks,
                   lambda cnt, m: F.when(cnt > 0, m)
                                   .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda a, x: a.bitwiseOR(x))


def simhash_dedup_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", max_hamming: int = 3
                        ) -> DataFrame:
    """Near-dup pairs whose SimHashes differ in ≤ max_hamming bits.

    Candidate generation: split the 60-bit hash into 4 15-bit blocks; by
    pigeonhole, pairs within Hamming distance 3 share ≥ 1 exact block →
    equi-join per block, then exact popcount filter."""
    sh = df.select(F.col(id_col).alias("id"),
                   simhash64(text_col).alias("sh"))
    pairs = None
    for blk in range(4):
        key = F.shiftright(F.col("sh"), blk * 15).bitwiseAND(F.lit((1 << 15) - 1))
        t = sh.withColumn("bk", key).withColumn("blk", F.lit(blk))
        a, b = t.alias("a"), t.alias("b")
        p = (a.join(b, on=["blk", "bk"])
              .filter(F.col("a.id") < F.col("b.id"))
              .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                      F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b")))
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.distinct()
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.withColumn("hamming", ham)
                 .filter(F.col("hamming") <= max_hamming)
                 .select("id_a", "id_b", "hamming"))


def fuzzy_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", *, num_hashes: int = 8,
                bands: int = 4, k: int = 5,
                jaccard_threshold: float = 0.8,
                bucket_window="auto",
                hot_bucket_threshold: int = 8192) -> DataFrame:
    """The canonical large-corpus fuzzy-dedup recipe as one call:

        MinHash signatures → LSH band candidates → exact n-gram Jaccard
        verify → connected components → min-id survivor per cluster.

    Every stage is the already-oracle-checked building block (minhash /
    lsh_pairs / jaccard / dedup_components queries); this composition is
    the pipeline a 100 TB pretraining corpus actually runs. Scale shape:
    candidate generation defaults to ``bucket_window="auto"`` — exact
    all-pairs (full recall) unless a sampled probe detects a hot bucket
    (a template duplicated 100k× would emit 10^10 all-pairs from ONE
    bucket), in which case the bounded chain+star generator (O(n·w) per
    bucket, see minhash_lsh_pairs) kicks in; exact Jaccard scores only
    LSH candidates, and cluster resolution is the iterative min-label
    propagation bounded by the candidate graph (star edges keep bucket
    components diameter ≤ 2). Pass ``bucket_window=None`` to force
    exact all-pairs, or an int to force the bounded path.

    Returns the deduplicated DataFrame (original columns)."""
    cands = minhash_lsh_pairs(df, id_col, text_col,
                              num_hashes=num_hashes, bands=bands, k=k,
                              bucket_window=bucket_window,
                              hot_bucket_threshold=hot_bucket_threshold)
    verified = ngram_jaccard_pairs(df, id_col, text_col, k=k,
                                   threshold=jaccard_threshold,
                                   candidates=cands)
    return dedup_by_components(df, verified.select("id_a", "id_b"),
                               id_col=id_col)
