"""Training-data pipeline operators beyond analysis: deterministic
dataset splitting, benchmark decontamination, and sequence packing —
the plumbing between a cleaned document corpus and a tokenizer-ready
training set.

Scale stance (the 100 TB contract):

- `split_dataset` is a pure projection (one xxhash64 per row, no
  shuffle) — split membership is a FUNCTION of the id, so re-running on
  a grown corpus never reassigns old rows across splits.
- `decontaminate` shuffles each side once on the n-gram fingerprint
  (broadcast when the benchmark side is small, which it always is) —
  the corpus is never self-joined.
- `pack_sequences` is the only genuinely order-sensitive operator:
  documents are range-partitioned into length-sorted buckets and
  greedily packed WITHIN partitions via one Arrow-batched
  `applyInPandas` — each task packs its own bucket, no global sort, no
  driver involvement. Packing quality is within one partial bin per
  partition of the sequential greedy bound.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def split_dataset(df: DataFrame, id_col: str = "doc_id",
                  weights: Optional[dict[str, float]] = None,
                  seed: int = 0, hash_method: str = "xxhash64") -> DataFrame:
    """Deterministic hash split: adds a `split` column ('train'/'val'/
    'test' by default). Membership depends only on (id, seed) — stable
    under corpus growth, re-sharding, and re-runs, unlike `randomSplit`
    (which reshuffles every execution plan change).

    ``hash_method``: 'xxhash64' (default — one JVM-side hash, fastest)
    or 'md5' — the engine-portable variant: any engine with md5
    (DuckDB, Trino, Spark) assigns the identical split, so a corpus
    split here can be reproduced or audited outside Spark bit-for-bit.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    # bucket in [0, 1) from the 64-bit hash
    if hash_method == "md5":
        # top 60 bits of md5(id || ':' || seed): both Spark and DuckDB
        # parse 15 hex chars into the same BIGINT and round the same
        # way on the double divide
        h = F.conv(F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"),
                           F.lit(f":{seed}"))), 1, 15), 16, 10).cast("bigint")
        u = h.cast("double") / F.lit(float(2 ** 60))
    elif hash_method == "xxhash64":
        u = (F.xxhash64(F.col(id_col), F.lit(seed)).cast("double")
             / F.lit(float(2 ** 63)) + F.lit(1.0)) / F.lit(2.0)
    else:
        raise ValueError(f"unknown hash_method: {hash_method!r}")
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def ngram_fingerprints(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """(id, fp) pairs: one xxhash64 per word n-gram of the normalized
    text. The contamination unit of comparison (Brown et al.-style
    n-gram overlap)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    return (df.select(F.col(id_col), F.explode(grams).alias("gram"))
            .filter(F.size(F.split(F.col("gram"), " ")) == n)
            .select(id_col, F.xxhash64("gram").alias("fp"))
            .distinct())


def decontaminate(df: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 8, max_hits: int = 0) -> DataFrame:
    """Drop training documents sharing more than `max_hits` word
    n-grams with any benchmark text. The benchmark side (always small)
    is broadcast; the corpus shuffles once on the fingerprint."""
    corpus_fp = ngram_fingerprints(df, text_col, id_col, n)
    bench_fp = (ngram_fingerprints(
        benchmark.select(F.col(text_col),
                         F.monotonically_increasing_id().alias("__bid")),
        text_col, "__bid", n)
        .select("fp").distinct())
    hits = (corpus_fp.join(F.broadcast(bench_fp), "fp")
            .groupBy(id_col).agg(F.count("*").alias("__hits"))
            .filter(F.col("__hits") > max_hits)
            .select(id_col))
    return df.join(hits, id_col, "left_anti")


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   max_tokens: int = 2048,
                   buckets: Optional[int] = None) -> DataFrame:
    """Greedy first-fit packing of documents into training sequences of
    at most `max_tokens` tokens. Returns (pack_id string, doc_ids
    array, total_tokens) — one row per packed sequence.

    Distribution: documents are range-bucketed by length so each
    partition packs similarly-sized docs (best case for greedy bin
    packing), then packed independently per partition with one
    Arrow-batched pandas stage. Documents longer than `max_tokens` get
    a singleton pack (truncation is the tokenizer's decision, not
    ours)."""
    import pandas as pd  # noqa: F401 (worker closure)

    if buckets is None:
        # one bucket per core: maximum parallelism without fragmenting
        # small corpora into many partial bins (each partition leaves
        # at most one under-filled bin open)
        from delta_spark.connect_compat import default_parallelism

        buckets = default_parallelism(df.sparkSession)
    src = (df.select(F.col(id_col).cast("string").alias("doc_id"),
                     F.col(tokens_col).cast("long").alias("n_tokens"))
           .filter(F.col("n_tokens").isNotNull())
           .repartitionByRange(buckets, F.col("n_tokens")))

    def _pack(key, pdf):
        import pandas as _pd

        part = int(key[0])
        bins: list[list] = []  # [used, doc_ids], open bins only
        out_ids, out_docs, out_tot = [], [], []
        for doc, n in zip(pdf["doc_id"], pdf["n_tokens"]):
            n = int(n)
            if n >= max_tokens:
                out_ids.append(f"p{part}-s{len(out_ids) + len(bins)}")
                out_docs.append([doc])
                out_tot.append(n)
                continue
            # first-fit over a bounded window of open bins keeps the
            # inner loop O(1) amortized; docs arrive length-clustered
            # (range bucketing), so older bins rarely fit anyway
            for b in bins[-64:]:
                if b[0] + n <= max_tokens:
                    b[0] += n
                    b[1].append(doc)
                    break
            else:
                bins.append([n, [doc]])
        for i, (used, docs) in enumerate(bins):
            out_ids.append(f"p{part}-b{i}")
            out_docs.append(docs)
            out_tot.append(used)
        return _pd.DataFrame({"pack_id": out_ids, "doc_ids": out_docs,
                              "total_tokens": out_tot})

    return (src.withColumn("__p", F.spark_partition_id())
            .groupBy("__p")
            .applyInPandas(_pack, "pack_id string, doc_ids array<string>, "
                                  "total_tokens long"))


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id", seed: int = 7) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each row draws a reproducible uniform
    u from md5(id:seed) and competes with key ln(u)/w (order-equivalent
    to u^(1/w)); the global top-k keys win. Inclusion probability is
    proportional to weight; the draw is a pure function of (id, seed),
    so reruns and engine ports reproduce the identical sample
    (md5 + ln are bit-identical across Spark and DuckDB).

    Scale: no shuffle of the corpus — orderBy(key).limit(k) plans as
    TakeOrderedAndProject (per-partition top-k heaps + one k-row merge
    on the driver), so cost is one scan + O(k) memory."""
    # cast to DOUBLE before dividing: a decimal literal would make
    # Spark compute u in decimal(38,17) while the DuckDB oracle uses
    # DOUBLE, breaking the bit-identical cross-engine guarantee at the
    # k-boundary (same recipe as split_dataset)
    u = (F.expr(
        f"CAST(conv(substring(md5(concat(CAST(`{id_col}` AS STRING), "
        f"':{seed}')), 1, 15), 16, 10) AS BIGINT) + 1")
        .cast("double") / F.lit(float(2 ** 60)))
    w = F.col(weight_col)
    # non-positive weights would invert the competition (ln(u)/w > 0
    # beats every valid row); exclude them rather than emit garbage
    key = F.when(w > 0, F.log(u) / w)
    return (df.withColumn("__wkey", key)
            .where(F.col("__wkey").isNotNull())
            .orderBy(F.col("__wkey").desc())
            .limit(k)
            .drop("__wkey"))


def sample_by_quota(df: DataFrame, group_col: str, quota: int,
                    order_col: str) -> DataFrame:
    """Per-group document cap (the C4/RefinedWeb-style per-domain
    quota): keep the first `quota` rows of each group in `order_col`
    order, deterministically. One shuffle on the group key; a hot
    domain lands in one partition, where AQE skew-split plus the fact
    that only `quota` rows survive the rank keep it bounded. For
    quotas small relative to group sizes, the window beats sampling
    because membership is exact and rerun-stable."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= quota)
            .drop("__rn"))


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    chunk_chars: int = 2000,
                    overlap: int = 200) -> DataFrame:
    """Split each document into fixed-size character windows with
    overlap — the context-window chunking stage between cleaning and
    tokenization. Entirely JVM-side (sequence → transform → substring →
    posexplode), so it's a narrow per-row expansion: no shuffle, no
    Python in the row path, and it scales linearly with corpus bytes.

    Chunk i covers [i*step+1, i*step+chunk_chars] (1-based, step =
    chunk_chars - overlap); the last chunk is short, empty/short docs
    produce exactly one chunk. Returns (id, chunk_id, chunk,
    n_chunk_chars)."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    n = (f"greatest(1, CAST(ceil((length({text_col}) - {overlap}) / "
         f"CAST({step} AS DOUBLE)) AS INT))")
    chunks = (f"transform(sequence(0, {n} - 1), "
              f"i -> substring({text_col}, i * {step} + 1, {chunk_chars}))")
    return (df
            .select(F.col(id_col),
                    F.posexplode(F.expr(chunks)).alias("chunk_id", "chunk"))
            .withColumn("n_chunk_chars", F.length("chunk")))
