"""Large-scale training-data pipeline operators.

Beyond the reference's geospatial surface, the engine ships the operators a
100 TB text/multimodal data pipeline needs (BASELINE.json north star):
dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search over
embeddings, text analysis (language-ID, quality, tokens, fingerprints), and
multimodal column plumbing. Everything is native Spark SQL expressions where
possible — the md5-based hashing keeps results engine-portable (the same
SQL runs on DuckDB for the correctness oracle).
"""

from geopandas_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup, minhash_signatures, minhash_lsh_pairs, ngram_jaccard_pairs,
    connected_components, dedup_by_components, fuzzy_dedup, simhash64,
    simhash_dedup_pairs,
)
from geopandas_spark.pipeline.text import (  # noqa: F401
    add_text_stats, quality_score, language_id, fingerprint, token_count,
    pii_scrub, gopher_rules, train_split, repetition_stats, normalize_url,
    url_domain, filter_blocked_domains, word_ngrams, contamination,
    decontaminate, char_entropy, chunk_documents, bpe_ish_token_count,
)
from geopandas_spark.pipeline.similarity import (  # noqa: F401
    cosine_topk, lsh_bucket_topk, ivf_topk, kmeans_centroids,
    quantize_embeddings, dequantize, embedding_dedup_pairs, centroid_scores,
)
from geopandas_spark.pipeline.pack import (  # noqa: F401
    distributed_cumsum, pack_sequences,
)
from geopandas_spark.pipeline.multimodal import (  # noqa: F401
    decode_images, extract_image_features,
)
