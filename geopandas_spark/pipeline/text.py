"""Text-analysis operators: tokens, quality, language-ID, fingerprints.

All pure native Spark SQL expressions (regexp + arithmetic) — zero Python
in the plan, so they run at codegen speed over 100 TB and have exact
DuckDB-SQL oracle twins."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "los"],
}


def token_count(text_col) -> Column:
    """Whitespace token count (maximal non-space runs)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(r"\S+"), 0))


def bpe_ish_token_count(text_col) -> Column:
    """BPE-ish token estimate: words + digits + punctuation as separate
    tokens (a cl100k-style pre-tokenizer regex approximation)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(
        c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0))


def _count_matches(c, pattern) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_chars / n_tokens / punct & digit & upper ratios / mean word len."""
    c = F.col(text_col)
    n_chars = F.length(c)
    safe = F.greatest(n_chars, F.lit(1)).cast("double")
    return (df
            .withColumn("n_chars2", n_chars)
            .withColumn("n_tokens", token_count(c))
            .withColumn("punct_ratio",
                        _count_matches(c, r"[^\w\s]") / safe)
            .withColumn("digit_ratio", _count_matches(c, r"[0-9]") / safe)
            .withColumn("upper_ratio", _count_matches(c, r"[A-Z]") / safe)
            .withColumn("mean_token_len",
                        n_chars.cast("double") /
                        F.greatest(token_count(c), F.lit(1)).cast("double")))


def stopword_ratio(text_col, lang: str = "en") -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+"), 0)
    hits = F.size(F.array_intersect(F.array_distinct(words),
                                    F.array(*[F.lit(w) for w in
                                              LANG_MARKERS[lang]])))
    return hits / F.greatest(F.size(F.array_distinct(words)),
                             F.lit(1)).cast("double")


def quality_score(text_col) -> Column:
    """Heuristic document quality in [0, 1]: length sweet spot, moderate
    punctuation, presence of stopwords (Gopher/C4-style rules)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(c).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct = _count_matches(c, r"[^\w\s]").cast("double") / F.greatest(
        F.length(c), F.lit(1)).cast("double")
    punct_score = F.when(punct > 0.2, F.lit(0.0)).otherwise(F.lit(1.0) - punct)
    stop_score = F.least(stopword_ratio(c) * F.lit(5.0), F.lit(1.0))
    return F.round((len_score + punct_score + stop_score) / F.lit(3.0), 6)


def language_id(text_col) -> Column:
    """Stopword-marker language ID: the language whose marker words hit the
    most distinct words wins; ties and zero hits → 'und' (undetermined)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.array_distinct(
        F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+"), 0))
    scores = {lang: F.size(F.array_intersect(
        words, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # deterministic priority order on ties: en > de > fr > es
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((scores[lang] == best) & (best > 0),
                     F.lit(lang)).otherwise(out)
    return out


def fingerprint(text_col) -> Column:
    """Normalized document fingerprint: lowercase, collapse whitespace,
    strip punctuation, md5 — robust to formatting-only edits."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", ""), r"\s+", " "))
    return F.md5(norm)


def pii_scrub(text_col) -> Column:
    """Redact common PII patterns: emails, international-ish phone numbers,
    and 16-digit card-like numbers (native regexp_replace chain — codegen,
    zero Python; the standard pre-training scrub pass)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    out = F.regexp_replace(
        c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>")
    # cards first (16-19 digits, optional space/dash groups) so the phone
    # pass can't partially consume one and leak the tail
    out = F.regexp_replace(
        out, r"\b(?:\d[ -]?){15,18}\d\b", "<CARD>")
    out = F.regexp_replace(
        out, r"\+?\d[\d\- ]{7,14}\d", "<PHONE>")
    return out


def gopher_rules(df: DataFrame, text_col: str = "text",
                 min_words: int = 5, max_words: int = 100000,
                 max_symbol_ratio: float = 0.1,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1, the
    published heuristic filter set): word-count bounds, mean word length
    band, symbol ('#'/'…') ratio cap. Adds boolean rule columns + a
    combined ``gopher_pass`` — all native expressions."""
    c = F.col(text_col)
    words = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+"), 0)
    n_words = F.size(words)
    mean_wl = F.when(n_words > 0,
                     F.aggregate(words, F.lit(0),
                                 lambda acc, w: acc + F.length(w))
                     .cast("double") / n_words).otherwise(F.lit(0.0))
    n_sym = F.size(F.regexp_extract_all(c, F.lit(r"[#…]"), 0))
    sym_ratio = n_sym.cast("double") / F.greatest(F.length(c), F.lit(1))
    return (df.withColumn("r_words",
                          (n_words >= min_words) & (n_words <= max_words))
              .withColumn("r_wordlen", (mean_wl >= min_mean_word_len) &
                          (mean_wl <= max_mean_word_len))
              .withColumn("r_symbols", sym_ratio <= max_symbol_ratio)
              .withColumn("gopher_pass",
                          F.col("r_words") & F.col("r_wordlen") &
                          F.col("r_symbols")))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 §A1.1, "repetitious
    documents"): duplicate-line fraction, duplicate-paragraph fraction and
    top-bigram character fraction — the signals that catch boilerplate and
    template spam that length/symbol rules miss.

    All native array expressions (split / array_distinct / aggregate), so
    the pass stays in whole-stage codegen at 100 TB. The top-bigram scan
    is O(distinct-bigrams · bigrams) per row — bounded by document length,
    no shuffle, no UDF."""
    c = F.col(text_col)

    def _dup_frac(sep):
        parts = F.filter(F.split(c, sep),
                         lambda x: F.length(F.trim(x)) > 0)
        n = F.size(parts)
        return F.when(n > 0,
                      (n - F.size(F.array_distinct(parts))).cast("double")
                      / n).otherwise(F.lit(0.0))

    words = F.regexp_extract_all(F.lower(c), F.lit(r"[a-z0-9]+"), 0)
    grams = F.when(
        F.size(words) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(words) - 2),
                    lambda i: F.concat_ws(" ", F.element_at(words, i + 1),
                                          F.element_at(words, i + 2)))
    ).otherwise(F.array().cast("array<string>"))
    top_cnt = F.when(
        F.size(grams) > 0,
        F.array_max(F.transform(
            F.array_distinct(grams),
            lambda g: F.size(F.filter(grams, lambda x: x == g))))
    ).otherwise(F.lit(0))
    top_frac = F.when(F.size(grams) > 0,
                      top_cnt.cast("double") / F.size(grams)) \
                .otherwise(F.lit(0.0))
    return (df.withColumn("dup_line_frac", F.round(_dup_frac(r"\n"), 6))
              .withColumn("dup_para_frac", F.round(_dup_frac(r"\n\n+"), 6))
              .withColumn("top_bigram_frac", F.round(top_frac, 6)))


def normalize_url(url_col) -> Column:
    """Canonical URL for dedup/blocklists: lowercase scheme+host, strip
    scheme, 'www.', trailing slash, fragment and tracking params
    (utm_*/fbclid/gclid) — native regexp chain."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.regexp_replace(c, r"#.*$", "")
    # tracking params: mid-query (keep the delimiter for the next param)
    # then trailing — two passes so '?utm=x&q=1' → '?q=1', not '&q=1'
    u = F.regexp_replace(u, r"([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*&",
                         "$1")
    u = F.regexp_replace(u, r"[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*$", "")
    u = F.regexp_replace(u, r"\?$", "")
    u = F.regexp_replace(u, r"^[Hh][Tt][Tt][Pp][Ss]?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"/$", "")
    # host is case-insensitive; path is not — lowercase only up to the
    # first '/'
    host = F.lower(F.regexp_extract(u, r"^([^/]*)", 1))
    path = F.regexp_replace(u, r"^[^/]*", "")
    return F.concat(host, path)


def url_domain(url_col) -> Column:
    """Registrable-ish domain of a URL (last two host labels)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.lower(F.regexp_extract(
        F.regexp_replace(c, r"^[A-Za-z]+://", ""), r"^([^/:]*)", 1))
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def filter_blocked_domains(df: DataFrame, url_col: str,
                           blocklist) -> DataFrame:
    """Drop rows whose URL's domain is on the blocklist. The blocklist is
    inlined as a literal array (typical lists are 10³–10⁵ entries → a
    broadcast-able isin); for larger lists pass a DataFrame and this
    becomes a broadcast anti-join."""
    if isinstance(blocklist, DataFrame):
        b = blocklist.select(F.col(blocklist.columns[0]).alias("__dom__"))
        return (df.withColumn("__dom__", url_domain(url_col))
                  .join(F.broadcast(b), on="__dom__", how="left_anti")
                  .drop("__dom__"))
    return df.filter(~url_domain(url_col).isin(list(blocklist)))


def train_split(df: DataFrame, id_col: str = "doc_id",
                val_pct: int = 10, salt: str = "split-v1") -> DataFrame:
    """Deterministic hash-based train/validation split: md5(salt|id) mod
    100 — stable across partitionings, retries and engines (the property
    a 100 TB pipeline needs; random() splits are neither reproducible nor
    oracle-checkable). Adds ``split`` ∈ {train, val}."""
    h = F.md5(F.concat(F.lit(salt + "|"),
                       F.col(id_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % 100
    return df.withColumn(
        "split", F.when(bucket < val_pct, F.lit("val"))
                  .otherwise(F.lit("train")))


def word_ngrams(text_col, n: int = 8) -> Column:
    """Lower-cased whitespace word n-grams as an array<string> column —
    pure codegen (split + sequence + transform + slice), no Python.
    Documents shorter than n tokens yield an empty array (guarded:
    Spark's sequence() would otherwise produce a descending range)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        starts, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams) \
            .otherwise(F.array().cast("array<string>"))


def contamination(df: DataFrame, bench_df: DataFrame, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: Optional[str] = None,
                  n: int = 8) -> DataFrame:
    """Benchmark-overlap (decontamination) scan: per-document count of
    distinct word n-grams shared with an evaluation/benchmark corpus —
    the published n-gram-collision decontamination method used by large
    LM training pipelines (13-gram in GPT-3's appendix; n is a knob).

    Scale design (100 TB corpus × small benchmark set):
    - n-gram generation is whole-stage codegen (no UDF);
    - both sides join on md5(ngram) — a uniform 128-bit key, so the
      shuffle has no linguistic skew (common phrases hash apart) and
      equality on the hash equals equality on the gram;
    - the benchmark side is distinct-ed and typically tiny → Catalyst/AQE
      broadcasts it, so the corpus never shuffles at all;
    - per-doc distinct() bounds the explode before the join.

    Returns df + ``n_contaminated`` (0 for clean docs).
    """
    bt = bench_text_col or text_col
    bench_grams = (bench_df
                   .select(F.explode(word_ngrams(bt, n)).alias("g"))
                   .select(F.md5("g").alias("__gh__")).distinct())
    doc_grams = (df.select(F.col(id_col),
                           F.explode(word_ngrams(text_col, n)).alias("g"))
                 .select(id_col, F.md5("g").alias("__gh__")).distinct())
    hits = (doc_grams.join(bench_grams, "__gh__")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_contaminated")))
    return (df.join(hits, id_col, "left")
              .withColumn("n_contaminated",
                          F.coalesce("n_contaminated", F.lit(0))))


def decontaminate(df: DataFrame, bench_df: DataFrame, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: Optional[str] = None, n: int = 8,
                  max_matches: int = 0) -> DataFrame:
    """Drop documents sharing more than ``max_matches`` distinct word
    n-grams with the benchmark corpus (see ``contamination``). With the
    default max_matches=0 this is a left-anti join on the hit set — the
    cheapest possible plan (no count aggregation needed)."""
    bt = bench_text_col or text_col
    if max_matches == 0:
        bench_grams = (bench_df
                       .select(F.explode(word_ngrams(bt, n)).alias("g"))
                       .select(F.md5("g").alias("__gh__")).distinct())
        dirty = (df.select(F.col(id_col),
                           F.explode(word_ngrams(text_col, n)).alias("g"))
                 .select(id_col, F.md5("g").alias("__gh__"))
                 .join(bench_grams, "__gh__")
                 .select(id_col).distinct())
        return df.join(dirty, id_col, "left_anti")
    c = contamination(df, bench_df, text_col=text_col, id_col=id_col,
                      bench_text_col=bench_text_col, n=n)
    return (c.filter(F.col("n_contaminated") <= max_matches)
             .drop("n_contaminated"))


def char_entropy(text_col) -> Column:
    """Shannon entropy (bits/char) of the character distribution — the
    cheap gibberish/boilerplate detector curation pipelines pair with the
    Gopher rules (near-zero = repeated filler, ~4+ = natural text,
    higher = random noise). Pure native: split-to-chars + a sorted
    distinct alphabet + one aggregate; O(|alphabet|·len) per doc with a
    small constant (text alphabets are tiny), no Python in the plan."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # the (?!^) lookahead also matches at end-of-string, leaving a
    # trailing "" element — drop empties
    chars = F.filter(F.split(c, "(?!^)"), lambda x: x != "")
    n = F.size(chars)
    uniq = F.array_sort(F.array_distinct(chars))
    probs = F.transform(
        uniq,
        lambda u: F.size(F.filter(chars, lambda x: x == u))
        / n.cast("double"))
    h = -F.aggregate(probs, F.lit(0.0),
                     lambda acc, p: acc + p * F.log2(p))
    return F.when(n > 0, h).otherwise(F.lit(0.0))


def chunk_documents(df: DataFrame, text_col: str = "text", *,
                    chunk_tokens: int = 64, stride: int = 32,
                    id_cols: Optional[list] = None) -> DataFrame:
    """Split each document into overlapping whitespace-token windows —
    the pretraining chunker (context-window packing's upstream stage).

    One output row per (doc, window): ``chunk_id`` (0-based), the window
    start token index, the rejoined ``chunk_text`` (single-space
    normalized) and its ``chunk_tokens`` count. Window starts step by
    ``stride`` (< chunk_tokens gives overlap); the final window is the
    shorter tail; an empty/whitespace-only doc yields one empty chunk
    (chunk_id 0, 0 tokens) so no document silently disappears.

    Scale shape: pure native expressions — split + sequence +
    posexplode + slice + array_join, whole-stage codegen'd, map-only
    (no shuffle); the 1->N fan-out is a generator inside the scan
    stage, so it parallelizes by input split at 100 TB."""
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    c = F.col(text_col)
    toks = F.regexp_extract_all(c, F.lit(r"\S+"), 0)
    nt = F.size(toks)
    nchunks = F.greatest(
        (F.ceil((nt - F.lit(chunk_tokens)) / F.lit(float(stride)))
         + F.lit(1)).cast("int"), F.lit(1))
    starts = F.sequence(F.lit(0), (nchunks - 1) * stride, F.lit(stride))
    keep = [F.col(k) for k in (id_cols if id_cols is not None
                               else df.columns) if k != text_col]
    ex = df.select(*keep, F.col(text_col).alias("__t__"),
                   F.posexplode(starts).alias("chunk_id", "tok_start"))
    toks2 = F.regexp_extract_all(F.col("__t__"), F.lit(r"\S+"), 0)
    window = F.slice(toks2, F.col("tok_start") + 1, chunk_tokens)
    return (ex.select(*[k for k in (id_cols if id_cols is not None
                                    else df.columns) if k != text_col],
                      "chunk_id", "tok_start",
                      F.array_join(window, " ").alias("chunk_text"),
                      F.size(window).alias("chunk_tokens")))
