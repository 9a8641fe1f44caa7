"""Operator function library.

``geo``        — geometry format conversions (WKB/WKT/GeoJSON), the only
                 scalar functions the reference owns (§2.B5/§2.C5).
``text``       — text analysis: tokenization, quality scoring, language ID,
                 fingerprinting.
``dedup``      — exact + near-duplicate detection (hash, MinHash-LSH,
                 SimHash, n-gram Jaccard).
``similarity`` — embedding similarity search (exact cosine top-k, LSH
                 bucketed variant).
``multimodal`` — opaque-binary-payload column conventions + stubbed decode.

All functions are column-expression builders or DataFrame transformers:
JVM-side built-ins wherever possible (whole-stage codegen), Arrow-batched
pandas UDFs only where built-ins can't express the op. No driver-side
collects anywhere.
"""


def spread_scan(df, *keys, min_bytes=4 << 20, factor=2):
    """Rebalance a CPU-dense scan whose source yields fewer splits than
    the cluster has task slots.

    Spark sizes file splits by BYTES (``spark.sql.files.
    maxPartitionBytes`` / ``openCostInBytes``), which is right for
    I/O-bound plans but starves per-row CPU-dense stages when the
    input is a handful of small-but-text-heavy files: a 65 MB
    documents file opens as ≤16 splits no matter how many cores
    exist (the 4 MB openCost floor caps split count). Worst on a
    low-row-group layout, where row-group alignment additionally
    skews the splits: MinHash signatures over an 8-row-group file
    measured 25.0 → 10.3 s at sf10 from this one exchange.

    APPLY ONLY WHERE A MEASURED A/B WINS. The exchange re-ships the
    projected input once, so it pays only when the stage's per-byte
    CPU dominates that cost. Measured on balanced (many-row-group)
    layouts: the tokenize→explode→aggregate stages of TF-IDF
    (4.26 → 2.70 s sf1, 6.9 → 4.8 s sf10) and bigram-LM scoring win;
    the md5-shingle family and the Arrow-GEMM kernels WASH OR LOSE
    (e.g. winnowing 3.3 → 4.1 s sf1) — those call sites were tried
    and reverted, and the LSH-bucketed pair path is always wrong
    here because its own groupBy reshuffles immediately anyway.

    On a real cluster reading a 100 TB corpus the source provides
    splits >> slots and this is a NO-OP — the partition-count check
    runs first and no shuffle is added.

    ``keys`` should be a high-cardinality column like the doc id —
    hash partitioning is deterministic and skips round-robin's
    sort-before-repartition pass. Sources smaller than ``min_bytes``
    are left alone: at toy scale (the driver's sf0.01 correctness
    sweep, sf0.1 canonical bench) the extra stage would cost more
    than the CPU it spreads, so those plans are byte-identical to
    the pre-helper ones.
    """
    try:
        slots = df.sparkSession.sparkContext.defaultParallelism
        if df._jdf.rdd().getNumPartitions() >= slots:
            return df
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        # py4j maps scala BigInt to a plain int on this Spark; older
        # versions hand back the object — accept both
        raw = stats.sizeInBytes()
        size = raw if isinstance(raw, int) else int(str(raw))
        if size < min_bytes:
            return df
    except Exception:
        # partition/stats introspection is best-effort; never let the
        # balancing hint break the plan itself
        return df
    import pyspark.sql.functions as F

    n = factor * slots
    if keys:
        return df.repartition(n, *[F.col(k) for k in keys])
    return df.repartition(n)


def attach_unpersist(df, *relations):
    """Attach the round-7 ``unpersist_sources()`` hook: operators that
    persist internal relations (the kNN site table, the winnowing
    fingerprint shuffle) return their plan with this callable so
    library callers looping over many invocations can release the
    caches after materialization (the bench's clearCache hid the
    leak). One shared implementation — the hook contract must not
    drift between operators.

    CAVEAT: the attribute lives on THIS DataFrame object only; any
    further transformation (``df.where(...)``, ``df.select(...)``)
    returns a new DataFrame without it, so capture the hook before
    deriving from the result.
    """

    def unpersist_sources():
        return [r.unpersist() for r in relations]

    df.unpersist_sources = unpersist_sources
    return df
