"""Large-scale training-data pipeline operators (beyond the reference's
surface, per BASELINE.json's north star): deduplication, similarity
search, text analysis, multimodal column handling.

Design rules: everything is a DataFrame→DataFrame transformer built
from pyspark.sql.functions (JVM/codegen) wherever possible; hashes are
md5-derived so every deterministic operator is cross-checkable against
a DuckDB oracle; the shapes shard at 100 TB (no global windows on
unbounded keys, no driver-side materialization of row-scale data).
"""

from delta_spark.ops.text import (
    fingerprint,
    language_id,
    quality_score,
    text_stats,
)
from delta_spark.ops.dedup import (
    dedup_exact,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    shingles,
    simhash,
)
from delta_spark.ops.similarity import (
    cosine_similarity_col,
    embedding_near_dups,
    ivf_topk,
    knn_brute_force,
)
