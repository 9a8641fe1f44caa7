"""Embedding similarity-search queries over ``embeddings`` (driver contract).

All cosines run over the deterministic integer quantization
(functions/similarity.py) so Spark and DuckDB produce bit-identical
doubles — no rounding anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from polars_gdal_spark.functions import similarity as S
from polars_gdal_spark.queries import load_tables, query

_Q_SQL = """
  q AS (
    SELECT vec_id, label,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
    FROM embeddings
  )
"""

# SQL twin of functions/similarity.adaptive_planes(n, 64, 8, 24):
# ceil(log2(ceil(n/64))) via length(bin(m-1)) — integer-exact on both
# engines, so Spark (python bit_length) and DuckDB pick the SAME plane
# count at every scale factor. Keeps expected LSH bucket size ~64 as the
# corpus grows instead of letting in-bucket pairs go quadratic.
_ADAPTIVE_PLANES_SQL = """
  params AS (
    SELECT greatest(8, least(24,
             CASE WHEN m <= 1 THEN 0 ELSE length(bin(m - 1)) END)) AS pl
    FROM (SELECT (count(*) + 63) // 64 AS m FROM q)
  )
"""


@query(
    "sim_knn_bruteforce",
    oracle=f"""
    WITH {_Q_SQL},
    qq AS (SELECT v FROM q WHERE vec_id = 0)
    SELECT a.vec_id,
           list_dot_product(a.v, qq.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(qq.v, qq.v))) AS cosine
    FROM q a, qq
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id
    LIMIT 10
    """,
)
def sim_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for the query vector vec_id=0: broadcast
    1-row query, single scan, TakeOrderedAndProject — the exact-ANN
    baseline that stays one pass at any corpus size."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    qv = emb.where(F.col("vec_id") == 0)
    return S.cosine_topk(emb, qv, k=10)


@query(
    "sim_pairwise_label_blocked",
    oracle=f"""
    WITH {_Q_SQL}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) AS cosine
    FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) >= 0.3
    """,
)
def sim_pairwise_label_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate embedding pairs (cosine ≥ 0.3) blocked by label —
    the blocked equi-join pattern: pair space is per-block, not corpus²."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return S.pairwise_cosine(
        emb, id_col="vec_id", vec_col="embedding", group_col="label", threshold=0.3
    )


@query(
    "sim_lsh_bucketed",
    oracle=f"""
    WITH {_Q_SQL},
    {_ADAPTIVE_PLANES_SQL},
    proj AS (
      SELECT q.vec_id, p.p,
             sum(q.v[i.i + 1]
                 * (((((p.p * 73856093) + (i.i * 19349663)) % 83) % 7) - 3)) AS s
      FROM q,
           (SELECT unnest(generate_series(0, (SELECT pl FROM params) - 1))
              AS p) p,
           (SELECT unnest(generate_series(0, 63)) AS i) i
      GROUP BY q.vec_id, p.p
    ),
    bkt AS (
      SELECT vec_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p)
               AS bkt
      FROM proj GROUP BY vec_id
    ),
    qb AS (SELECT q.vec_id, q.v, bkt.bkt FROM q JOIN bkt USING (vec_id))
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) AS cosine
    FROM qb a JOIN qb b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) >= 0.25
    """,
)
def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-random-projection LSH: ``adaptive_planes(n)``
    deterministic hyperplanes → bucket key → bucket-local pairs → exact
    cosine refinement ≥ 0.25. The scale path: equi-join on the bucket,
    no cross product, and — since round 5 — a plane count that grows
    with log2(n) so expected bucket size stays ~64 and in-bucket pair
    generation stays linear (fixed planes=8 measured 13.6× wall at 3×
    data, sf1→sf3). The oracle computes the SAME count in SQL
    (``_ADAPTIVE_PLANES_SQL``); the one driver scalar is a
    metadata-only parquet ``count()``."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    n = emb.count()
    return S.lsh_bucketed_pairs(
        emb, id_col="vec_id", vec_col="embedding",
        planes=S.adaptive_planes(n), threshold=0.25,
        cache_keys=n >= 10_000,
    )


@query(
    "sim_knn_join",
    oracle=f"""
    WITH {_Q_SQL},
    qs AS (SELECT vec_id, v FROM q WHERE vec_id < 10),
    corpus AS (SELECT vec_id, v FROM q WHERE vec_id >= 10),
    scored AS (
      SELECT qs.vec_id AS qid, corpus.vec_id AS vec_id,
             list_dot_product(qs.v, corpus.v)
               / (sqrt(list_dot_product(qs.v, qs.v))
                  * sqrt(list_dot_product(corpus.v, corpus.v))) AS cosine
      FROM qs, corpus
    )
    SELECT qid, vec_id, cosine
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
      FROM scored
    )
    WHERE rn <= 5
    """,
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query brute-force kNN join: top-5 neighbours for each of 10
    query vectors — broadcast query matrix, per-partition numpy GEMM,
    local top-k, then a global top-k window over k×partitions rows (the
    distributed dense-retrieval baseline)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return S.knn_join(
        emb.where(F.col("vec_id") >= 10),
        emb.where(F.col("vec_id") < 10),
        k=5,
    )


_KMEANS_ASSIGN = """
  a{i} AS (
    SELECT vec_id, cid FROM (
      SELECT q.vec_id, c.cid,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, c.qc)
                          / (sqrt(list_dot_product(q.v, q.v))
                             * sqrt(list_dot_product(c.qc, c.qc))) DESC,
                        c.cid
             ) AS rk
      FROM q CROSS JOIN c{j}q c) t
    WHERE rk = 1
  ),
  u{i} AS (
    SELECT a{i}.cid, d.i AS pos,
           sum(q.v[d.i + 1]) / count(*) / 1000000 AS val
    FROM a{i} JOIN q USING (vec_id) CROSS JOIN dims d
    GROUP BY a{i}.cid, d.i
  ),
  c{i}q AS (
    SELECT cid, list_transform(array_agg(val ORDER BY pos),
                               x -> CAST(floor(x * 1000000) AS BIGINT)) AS qc
    FROM u{i} GROUP BY cid
  )
"""


@query(
    "sim_kmeans_centroids",
    oracle=(
        """
    WITH dims AS (SELECT unnest(generate_series(0, 63)) AS i),
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    c0q AS (
      SELECT vec_id AS cid,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qc
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    """
        + _KMEANS_ASSIGN.format(i=1, j=0).strip().rstrip(",").rstrip()
        + ","
        + _KMEANS_ASSIGN.format(i=2, j=1).strip().rstrip(",").rstrip()
        + """
    SELECT cid AS centroid_id, pos, val FROM u2
    """
    ),
)
def sim_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k=8 cosine k-means over the embeddings —
    the IVF centroid-training step. Deterministic end to end: smallest-id
    seeding, exact-int cosine assignment, quantized-integer mean (order-
    independent sums, one exact double division). Output is the final
    centroid set flattened to (centroid_id, pos, val)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    cents = S.kmeans_lloyd(emb, k=8, iters=2)
    return cents.select(
        F.col("vec_id").alias("centroid_id"),
        F.posexplode("embedding").alias("pos", "val"),
    )


@query(
    "sim_ann_recall",
    oracle=f"""
    WITH {_Q_SQL},
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM q WHERE vec_id < 8),
    vecs AS (SELECT vec_id, v FROM q WHERE vec_id > 8),
    qq AS (SELECT v AS qv FROM q WHERE vec_id = 8),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT vecs.vec_id, cent.centroid_id,
               row_number() OVER (
                 PARTITION BY vecs.vec_id
                 ORDER BY list_dot_product(vecs.v, cent.cv)
                          / (sqrt(list_dot_product(vecs.v, vecs.v))
                             * sqrt(list_dot_product(cent.cv, cent.cv))) DESC,
                          cent.centroid_id) AS rk
        FROM vecs, cent
      ) WHERE rk = 1
    ),
    probe AS (
      SELECT centroid_id FROM cent, qq
      ORDER BY list_dot_product(cent.cv, qq.qv)
               / (sqrt(list_dot_product(cent.cv, cent.cv))
                  * sqrt(list_dot_product(qq.qv, qq.qv))) DESC, centroid_id
      LIMIT 2
    ),
    ivf AS (
      SELECT v.vec_id
      FROM vecs v
      JOIN assign a ON a.vec_id = v.vec_id
      JOIN probe p ON p.centroid_id = a.centroid_id, qq
      ORDER BY list_dot_product(v.v, qq.qv)
               / (sqrt(list_dot_product(v.v, v.v))
                  * sqrt(list_dot_product(qq.qv, qq.qv))) DESC, v.vec_id
      LIMIT 5
    ),
    exact AS (
      SELECT a.vec_id
      FROM vecs a, qq
      ORDER BY list_dot_product(a.v, qq.qv)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(qq.qv, qq.qv))) DESC, a.vec_id
      LIMIT 5
    )
    SELECT CAST(count(*) AS BIGINT) AS recall_hits,
           count(*) / 5.0 AS recall_at_5
    FROM exact JOIN ivf USING (vec_id)
    """,
)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality harness: recall@5 of the IVF probe search against the
    brute-force exact top-5 on the same corpus (centroids = vec 0-7,
    query = vec 8, corpus = the rest). The number every production ANN
    deployment tracks — here computed engine-side as a semi-join of the
    two top-k lists, so the metric itself is oracle-checked.

    Scale shape: both arms are the already-bounded top-k plans (pruned
    IVF scan; single-pass TakeOrderedAndProject brute force); the recall
    join is 5×5 rows. At 100 TB you sample queries and run this exact
    composition per query — recall measurement costs one extra broadcast
    join, not a second corpus pass."""
    from polars_gdal_spark.functions.similarity import ivf_search

    emb = load_tables(spark, sf_dir)["embeddings"]
    centroids = emb.where(F.col("vec_id") < 8)
    corpus = emb.where(F.col("vec_id") > 8)
    qv = emb.where(F.col("vec_id") == 8)
    ivf5 = ivf_search(corpus, centroids, qv, k=5, n_probe=2).select("vec_id")
    exact5 = S.cosine_topk(corpus, qv, k=5).select("vec_id")
    return exact5.join(ivf5, "vec_id", "left_semi").agg(
        F.count("*").cast("bigint").alias("recall_hits"),
        (F.count("*") / F.lit(5.0)).alias("recall_at_5"),
    )


@query(
    "sim_ivf_trained",
    oracle=(
        """
    WITH dims AS (SELECT unnest(generate_series(0, 63)) AS i),
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    c0q AS (
      SELECT vec_id AS cid,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qc
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    """
        + _KMEANS_ASSIGN.format(i=1, j=0).strip().rstrip(",").rstrip()
        + ","
        + _KMEANS_ASSIGN.format(i=2, j=1).strip().rstrip(",").rstrip()
        + """,
    vecs AS (SELECT vec_id, v FROM q WHERE vec_id > 8),
    qq AS (SELECT v AS qv FROM q WHERE vec_id = 8),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vecs.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY vecs.vec_id
                 ORDER BY list_dot_product(vecs.v, c.qc)
                          / (sqrt(list_dot_product(vecs.v, vecs.v))
                             * sqrt(list_dot_product(c.qc, c.qc))) DESC,
                          c.cid) AS rk
        FROM vecs CROSS JOIN c2q c) t
      WHERE rk = 1
    ),
    probe AS (
      SELECT c.cid FROM c2q c, qq
      ORDER BY list_dot_product(c.qc, qq.qv)
               / (sqrt(list_dot_product(c.qc, c.qc))
                  * sqrt(list_dot_product(qq.qv, qq.qv))) DESC, c.cid
      LIMIT 2
    )
    SELECT v.vec_id,
           a.cid AS centroid_id,
           list_dot_product(v.v, qq.qv)
             / (sqrt(list_dot_product(v.v, v.v))
                * sqrt(list_dot_product(qq.qv, qq.qv))) AS cosine
    FROM vecs v
    JOIN assign a ON a.vec_id = v.vec_id
    JOIN probe p ON p.cid = a.cid, qq
    ORDER BY cosine DESC, v.vec_id
    LIMIT 5
    """
    ),
)
def sim_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE ANN pipeline, oracle-checked end to end: train k=8
    coarse centroids with two Lloyd iterations (the `sim_kmeans_centroids`
    operator), build the IVF assignment against the TRAINED centroids,
    probe the top-2 cells for the query vector, exact-re-rank top-5 —
    i.e. what a production vector index actually does, rather than the
    fixed-seed-centroid variant (`sim_ivf_probe_search`). Every stage is
    deterministic (smallest-id seeding, exact-int cosines, quantized
    means), so even the trained index hash-matches DuckDB replaying the
    identical computation.

    Scale: training touches the corpus iters× (linear scans, 8-row
    broadcast back); search prunes to n_probe/k of the corpus. The
    composition adds no new shuffle beyond its parts."""
    from polars_gdal_spark.functions.similarity import ivf_search

    emb = load_tables(spark, sf_dir)["embeddings"]
    cents = S.kmeans_lloyd(emb, k=8, iters=2)
    corpus = emb.where(F.col("vec_id") > 8)
    qv = emb.where(F.col("vec_id") == 8)
    return ivf_search(corpus, cents, qv, k=5, n_probe=2)


@query(
    "sim_ivf_knn_join",
    oracle=f"""
    WITH {_Q_SQL},
    cent AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < 8),
    queries AS (SELECT vec_id AS qid, v AS qv FROM q
                WHERE vec_id BETWEEN 8 AND 12),
    corpus AS (SELECT vec_id, v FROM q WHERE vec_id > 12),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT corpus.vec_id, cent.cid,
               row_number() OVER (
                 PARTITION BY corpus.vec_id
                 ORDER BY list_dot_product(corpus.v, cent.cv)
                          / (sqrt(list_dot_product(corpus.v, corpus.v))
                             * sqrt(list_dot_product(cent.cv, cent.cv))) DESC,
                          cent.cid) AS rk
        FROM corpus CROSS JOIN cent) t
      WHERE rk = 1
    ),
    qprobe AS (
      SELECT qid, cid, qv FROM (
        SELECT queries.qid, cent.cid, queries.qv,
               row_number() OVER (
                 PARTITION BY queries.qid
                 ORDER BY list_dot_product(queries.qv, cent.cv)
                          / (sqrt(list_dot_product(queries.qv, queries.qv))
                             * sqrt(list_dot_product(cent.cv, cent.cv))) DESC,
                          cent.cid) AS rk
        FROM queries CROSS JOIN cent) t
      WHERE rk <= 2
    ),
    scored AS (
      SELECT p.qid, c.vec_id,
             list_dot_product(c.v, p.qv)
               / (sqrt(list_dot_product(c.v, c.v))
                  * sqrt(list_dot_product(p.qv, p.qv))) AS cosine
      FROM corpus c
      JOIN assign a ON a.vec_id = c.vec_id
      JOIN qprobe p ON p.cid = a.cid
    )
    SELECT qid, vec_id, cosine FROM (
      SELECT qid, vec_id, cosine,
             row_number() OVER (
               PARTITION BY qid ORDER BY cosine DESC, vec_id
             ) AS rk
      FROM scored) t
    WHERE rk <= 3
    """,
)
def sim_ivf_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN join — many queries retrieved through the IVF index at
    once (the retrieval workload: embed a query batch, join against the
    corpus index). Queries = vecs 8-12, corpus = the rest, centroids =
    vecs 0-7. Each query probes its top-2 cells; candidates come from
    the (query-probe ⋈ corpus-assignment) equi-join on the CELL id —
    never query×corpus — and a per-query window takes the exact top-3.

    Scale shape: corpus assignment is one broadcast-centroid scan
    (reusable across query batches); the probe table is queries×n_probe
    rows (broadcast when the batch is small); the join fans each corpus
    row out to only the queries probing its cell. WindowGroupLimit
    truncates per-partition before the final per-query rank."""
    from pyspark.sql.window import Window

    from polars_gdal_spark.functions.similarity import (
        cosine_q,
        dot_q,
        ivf_assign,
        norm_sq_q,
        quantize,
    )

    emb = load_tables(spark, sf_dir)["embeddings"]
    cents = emb.where(F.col("vec_id") < 8)
    queries = emb.where(F.col("vec_id").between(8, 12))
    corpus = emb.where(F.col("vec_id") > 12)

    assigned = ivf_assign(corpus, cents).select(
        "vec_id", "centroid_id", quantize(F.col("embedding")).alias("_v")
    )
    qn = queries.select(
        F.col("vec_id").alias("qid"), quantize(F.col("embedding")).alias("_qv")
    ).withColumn("_qn", F.sqrt(norm_sq_q(F.col("_qv")).cast("double")))
    cq = F.broadcast(
        cents.select(
            F.col("vec_id").alias("centroid_id"),
            quantize(F.col("embedding")).alias("_cv"),
        ).withColumn("_cn", F.sqrt(norm_sq_q(F.col("_cv")).cast("double")))
    )
    wq = Window.partitionBy("qid").orderBy(
        F.desc("_sim"), F.asc("centroid_id")
    )
    qprobe = (
        qn.crossJoin(cq)
        .withColumn(
            "_sim",
            dot_q(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
        )
        .withColumn("_rk", F.row_number().over(wq))
        .where(F.col("_rk") <= 2)
        .select("qid", "centroid_id", "_qv")
    )
    cand = assigned.join(F.broadcast(qprobe), "centroid_id")
    scored = cand.select(
        "qid",
        "vec_id",
        cosine_q(F.col("_v"), F.col("_qv")).alias("cosine"),
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(wk))
        .where(F.col("_rk") <= 3)
        .select("qid", "vec_id", "cosine")
    )


@query(
    "sim_range_search",
    oracle=f"""
    WITH {_Q_SQL},
    qs AS (SELECT vec_id AS qid, v AS qv FROM q WHERE vec_id < 3)
    SELECT qs.qid, a.vec_id,
           list_dot_product(a.v, qs.qv)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(qs.qv, qs.qv))) AS cosine
    FROM q a CROSS JOIN qs
    WHERE a.vec_id <> qs.qid
      AND list_dot_product(a.v, qs.qv)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(qs.qv, qs.qv))) >= 0.3
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) search: all corpus vectors within cosine ≥ 0.3 of
    each probe (vec_id < 3) — the distance-bounded retrieval shape
    (near-duplicate audits), complementing the count-bounded knn_join.
    Probes broadcast; the corpus side is one embarrassingly parallel
    scan with no shuffle (functions/similarity.cosine_range)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    probes = emb.where(F.col("vec_id") < 3)
    return S.cosine_range(emb, probes, threshold=0.3)


def _jl_signs(d_in: int = 64, d_out: int = 16) -> list[list[int]]:
    """Deterministic Rademacher (+1/-1) projection matrix: the sign for
    (input dim i, output dim j) is derived from md5(f"{i}_{j}") so any
    engine (or a re-run on different cluster topology) regenerates the
    identical matrix — no RNG state to ship."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0], 16) < 8
            else -1
            for i in range(d_in)
        ]
        for j in range(d_out)
    ]


_JL = _jl_signs()
_JL_SQL = (
    "["
    + ", ".join("[" + ", ".join(str(s) for s in row) + "]" for row in _JL)
    + "]"
)


@query(
    "embed_random_projection",
    oracle=f"""
    WITH {_Q_SQL},
    m AS (SELECT {_JL_SQL} AS signs)
    SELECT vec_id,
           CAST(j AS INT) AS dim,
           CAST(list_sum(list_transform(range(1, len(v) + 1),
                         i -> v[i] * signs[j + 1][i])) AS BIGINT) AS qproj
    FROM q, m, (SELECT unnest(range(0, 16)) AS j)
    ORDER BY vec_id, dim
    """,
)
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction 64 -> 16 via a
    deterministic Rademacher sign matrix (signs derived from md5 of the
    coordinate pair, so the matrix needs no storage and no broadcast of
    RNG state — any worker, any engine regenerates it). Output is the
    long form (vec_id, dim, qproj) over the exact integer quantization,
    bit-identical across engines.

    Scale shape (round 11): one Arrow batch GEMM per partition — zero
    shuffle, the 1 KB sign matrix is a task-local constant, and at
    100 TB this stays an embarrassingly parallel scan. The previous
    16-column ``F.aggregate(F.zip_with(...))`` formulation looked like
    whole-stage codegen but is NOT: Catalyst interprets higher-order
    functions per element (the same finding that moved the SRP bucket
    keys to a GEMM pandas UDF — functions/similarity.py
    lsh_bucketed_pairs), and 16 projections × 64 dims of interpreted
    lambda cost 5.2-5.8 s at sf10 vs 0.5 s for the ``mapInArrow``
    int64 matmul (A/B on this host; output ``exceptAll``-identical both
    directions at sf0.1 and sf10). The matmul is exact: quantized
    entries ≤ 1e6 × signs ±1 × 64 dims keeps |dot| ≤ 6.4e7 « 2^63, and
    integer addition is order-independent, so the oracle is unchanged.
    Reference parity: extends the similarity-search surface (SURVEY
    §2.L) with the standard sketching step used before ANN indexing.
    """
    import numpy as np

    emb = load_tables(spark, sf_dir)["embeddings"]
    q = emb.select("vec_id", S.quantize(F.col("embedding")).alias("v"))
    JLT = np.array(_JL, dtype=np.int64).T  # (dim, 16)

    def gemm(batches):
        import numpy as np
        import pyarrow as pa

        W = JLT
        for batch in batches:
            ids = batch.column(0)
            n = len(ids)
            if n == 0:
                continue
            col = batch.column(1)
            # per-ROW validation (round-12, r11 ADVICE): reshape(n, -1)
            # succeeds on ragged input whenever the flattened count
            # happens to divide n (e.g. lists of 63 and 65 elements in
            # a 2-row batch), silently mixing values across rows, and
            # ListArray.flatten() silently drops NULL lists, shifting
            # alignment — so check null_count and every list length
            # explicitly instead of relying on reshape to fail.
            if col.null_count:
                raise ValueError(
                    "embed_random_projection: NULL embedding vector"
                )
            lens = col.value_lengths().to_numpy(zero_copy_only=False)
            if (lens != W.shape[0]).any():
                bad = sorted(set(lens[lens != W.shape[0]].tolist()))
                raise ValueError(
                    f"embed_random_projection: expected {W.shape[0]}-dim "
                    f"vectors, got lengths {bad[:5]}"
                )
            m = (
                col.flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(n, -1)
                .astype(np.int64)
            )
            pr = m @ W  # (n, 16), exact int64
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        np.repeat(
                            ids.to_numpy(zero_copy_only=False), W.shape[1]
                        ),
                        type=pa.int64(),
                    ),
                    pa.array(
                        np.tile(
                            np.arange(W.shape[1], dtype=np.int32), n
                        ),
                        type=pa.int32(),
                    ),
                    pa.array(pr.reshape(-1), type=pa.int64()),
                ],
                names=["vec_id", "dim", "qproj"],
            )

    # no orderBy: the driver's compare is order-insensitive, and a
    # global sort here would add a pointless range-partition exchange
    return q.mapInArrow(gemm, "vec_id bigint, dim int, qproj bigint")


@query(
    "embed_mean_pool",
    oracle="""
    WITH q AS (
      SELECT label, unnest(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
               AS qv,
             unnest(generate_series(0, len(embedding) - 1)) AS dim
      FROM embeddings
    )
    SELECT label, dim,
           CAST(sum(qv) AS BIGINT) AS sum_q,
           count(*) AS n,
           CAST(sum(qv) AS DOUBLE) / (1000000.0 * count(*)) AS mean_val
    FROM q GROUP BY label, dim
    """,
)
def embed_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (centroid pooling) in LONG (label, dim)
    format — the class-prototype computation behind semantic dedup
    cluster centers, label-centroid classifiers, and drift monitors.

    Determinism: the engine-reproducibility pattern shared with the
    similarity kernels — floats quantize to ints (floor(x*1e6)), sums
    are exact bigints under any partitioning/order, and the mean is one
    correctly-rounded double division at the end.

    Scale shape: posexplode fans each vector to |dim| narrow rows, the
    (label, dim) groupBy is map-side combined (shuffle carries one
    partial sum per group per partition — |labels|×|dims| rows, corpus
    size cancels out), and the LONG output format avoids any
    order-sensitive array reassembly (no collect_list).
    """
    from polars_gdal_spark.functions.similarity import quantize

    emb = load_tables(spark, sf_dir)["embeddings"]
    exploded = emb.select(
        "label",
        F.posexplode(quantize(F.col("embedding"))).alias("dim", "qv"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.sum("qv").cast("bigint").alias("sum_q"),
        F.count("*").alias("n"),
        (
            F.sum("qv").cast("double")
            / (F.lit(1000000.0) * F.count("*").cast("double"))
        ).alias("mean_val"),
    )


@query(
    "sim_lsh_multitable",
    oracle=f"""
    WITH {_Q_SQL},
    {_ADAPTIVE_PLANES_SQL},
    proj AS (
      SELECT q.vec_id, t.t, p.p,
             sum(q.v[i.i + 1]
                 * (((((((t.t * 101) + p.p) * 73856093)
                       + (i.i * 19349663)) % 83) % 7) - 3)) AS s
      FROM q,
           (SELECT unnest(generate_series(0, 1)) AS t) t,
           (SELECT unnest(generate_series(0, (SELECT pl FROM params) + 3))
              AS p) p,
           (SELECT unnest(generate_series(0, 63)) AS i) i
      GROUP BY q.vec_id, t.t, p.p
    ),
    bkt AS (
      SELECT vec_id, t,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p)
               AS bkt
      FROM proj GROUP BY vec_id, t
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bkt a
      JOIN bkt b ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           list_dot_product(qa.v, qb.v)
             / (sqrt(list_dot_product(qa.v, qa.v))
                * sqrt(list_dot_product(qb.v, qb.v))) AS cosine
    FROM cand c
    JOIN q qa ON qa.vec_id = c.vec_a
    JOIN q qb ON qb.vec_id = c.vec_b
    WHERE list_dot_product(qa.v, qb.v)
             / (sqrt(list_dot_product(qa.v, qa.v))
                * sqrt(list_dot_product(qb.v, qb.v))) >= 0.25
    """,
)
def sim_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table SRP-LSH (the K/L layout): candidates are the UNION of
    bucket equi-joins over 2 independently seeded 12-plane tables,
    deduplicated, then exact-cosine refined >= 0.25. Longer keys keep
    expected bucket size constant as the corpus grows (pair generation
    stays ~linear); the second table recovers the recall the longer key
    costs — the production ANN K/L shape. K = ``adaptive_planes(n) + 4``
    (4 extra planes over the single-table key because L=2 tables pay the
    recall back): 12 at sf≤0.1 — identical keys/output to the round-4
    fixed-K version — and 13/14 at sf1/sf3 where fixed K measured
    super-linear. The oracle computes the same K via
    ``_ADAPTIVE_PLANES_SQL`` (``pl + 4``). Candidate generation is
    bucket-local per table; never corpus²."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    n = emb.count()
    return S.lsh_bucketed_pairs(
        emb, id_col="vec_id", vec_col="embedding",
        planes=S.adaptive_planes(n) + 4, threshold=0.25, tables=2,
        cache_keys=n >= 10_000,
    )


@query(
    "sim_hard_negatives",
    oracle=f"""
    WITH {_Q_SQL},
    qs AS (SELECT vec_id, label, v FROM q WHERE vec_id < 8),
    corpus AS (SELECT vec_id, label, v FROM q WHERE vec_id >= 8),
    scored AS (
      SELECT qs.vec_id AS qid, corpus.vec_id AS vec_id,
             list_dot_product(qs.v, corpus.v)
               / (sqrt(list_dot_product(qs.v, qs.v))
                  * sqrt(list_dot_product(corpus.v, corpus.v))) AS cosine
      FROM qs JOIN corpus ON qs.label <> corpus.label
    )
    SELECT qid, vec_id, cosine
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
      FROM scored
    )
    WHERE rn <= 5
    """,
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — for each of 8 anchor vectors, the 5 most
    similar corpus vectors with a DIFFERENT label: the contrastive-
    training negatives that sit just outside the class boundary. The
    label mask runs inside the broadcast-GEMM kernel (same-label
    cosines → -inf before the local top-k), so exclusion is free — no
    join, no second pass, and the shuffle still carries only
    k × partitions rows per anchor."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return S.hard_negatives(
        emb.where(F.col("vec_id") >= 8),
        emb.where(F.col("vec_id") < 8),
        k=5,
    )


@query(
    "sim_pq_adc_topk",
    oracle=f"""
    WITH {_Q_SQL},
    blocks AS (SELECT unnest(generate_series(0, 7)) AS b),
    sub AS (
      SELECT q.vec_id, b.b, q.v[b.b*8 + 1 : b.b*8 + 8] AS sv
      FROM q, blocks b
    ),
    cb AS (SELECT vec_id AS c, b, sv AS cv FROM sub WHERE vec_id < 16),
    dist AS (
      SELECT s.vec_id, s.b, cb.c,
             list_dot_product(s.sv, s.sv)
             - 2 * list_dot_product(s.sv, cb.cv)
             + list_dot_product(cb.cv, cb.cv) AS d2
      FROM sub s JOIN cb ON s.b = cb.b
    ),
    enc AS (
      SELECT vec_id, b, c AS code FROM (
        SELECT vec_id, b, c,
               row_number() OVER (PARTITION BY vec_id, b
                                  ORDER BY d2, c) AS rk
        FROM dist) t WHERE rk = 1
    ),
    tq AS (SELECT b, c, d2 FROM dist WHERE vec_id = 0),
    score AS (
      SELECT e.vec_id, sum(t.d2) AS s
      FROM enc e JOIN tq t ON e.b = t.b AND e.code = t.c
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id
    )
    SELECT vec_id, CAST(s AS DOUBLE) AS adc_dist
    FROM score ORDER BY adc_dist, vec_id LIMIT 10
    """,
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al., PAMI 2011) — the memory
    side of the 100 TB story: 64 floats compress to 8 codebook indices
    (8 contiguous 8-dim subspaces × 16 deterministic sampled centroids
    each = the sub-vectors of vec_id 0..15), and the query ranks the
    corpus by ASYMMETRIC distance — per-subspace exact-int L2 tables
    computed once for the query, then m lookups + a sum per corpus row.
    No decompression, no per-row float math, integer-valued doubles
    < 2^53 end to end, so ranking and values are bit-reproducible and
    the DuckDB oracle replays the identical codebook/encode/ADC chain.

    Scale shape: encoding is one shuffle-free vectorized pandas UDF;
    the codebook (16 rows) and the query (1 row) are the only driver
    collects (ANN metadata, same contract as IVF centroids); ADC ends
    in TakeOrderedAndProject. The compressed code column is what a
    RAM-resident cluster-wide ANN index stores — 8 bytes/vector vs
    256."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").take(1)
    if not qrow:  # empty corpus -> empty result, same schema
        return spark.createDataFrame([], "vec_id bigint, adc_dist double")
    C = S.pq_codebooks(emb, id_col="vec_id", vec_col="embedding", m=8, k=16)
    enc = S.pq_encode(emb.where(F.col("vec_id") != 0), C)
    return S.pq_adc_topk(enc, C, qrow[0][0], k=10)


@query(
    "sim_ivfpq_topk",
    oracle=f"""
    WITH {_Q_SQL},
    cent AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < 8),
    corpus AS (SELECT vec_id, v FROM q WHERE vec_id >= 16),
    qq AS (SELECT v AS qv FROM q WHERE vec_id = 8),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT corpus.vec_id, cent.cid,
               row_number() OVER (PARTITION BY corpus.vec_id
                 ORDER BY list_dot_product(corpus.v, cent.cv)
                          / (sqrt(list_dot_product(corpus.v, corpus.v))
                             * sqrt(list_dot_product(cent.cv, cent.cv)))
                            DESC,
                          cent.cid) AS rk
        FROM corpus CROSS JOIN cent) t
      WHERE rk = 1
    ),
    probe AS (
      SELECT cid, cv FROM cent, qq
      ORDER BY list_dot_product(cv, qv)
               / (sqrt(list_dot_product(cv, cv))
                  * sqrt(list_dot_product(qv, qv))) DESC, cid
      LIMIT 2
    ),
    samp AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, vec_id
      FROM (SELECT vec_id FROM corpus ORDER BY vec_id LIMIT 16) s
    ),
    sres AS (
      SELECT samp.code,
             list_transform(generate_series(1, 64),
                            i -> c.v[i] - ct.cv[i]) AS rv
      FROM samp JOIN corpus c USING (vec_id)
      JOIN assign a ON a.vec_id = samp.vec_id
      JOIN cent ct ON ct.cid = a.cid
    ),
    blocks AS (SELECT unnest(generate_series(0, 7)) AS b),
    cb AS (
      SELECT code, b.b, rv[b.b*8 + 1 : b.b*8 + 8] AS cbv
      FROM sres, blocks b
    ),
    pres AS (
      SELECT c.vec_id, a.cid,
             list_transform(generate_series(1, 64),
                            i -> c.v[i] - ct.cv[i]) AS rv
      FROM corpus c JOIN assign a ON a.vec_id = c.vec_id
      JOIN probe p ON p.cid = a.cid
      JOIN cent ct ON ct.cid = a.cid
    ),
    psub AS (
      SELECT vec_id, cid, b.b, rv[b.b*8 + 1 : b.b*8 + 8] AS sv
      FROM pres, blocks b
    ),
    enc AS (
      SELECT vec_id, cid, b, code FROM (
        SELECT psub.vec_id, psub.cid, psub.b, cb.code,
               row_number() OVER (PARTITION BY psub.vec_id, psub.b
                 ORDER BY list_dot_product(psub.sv, psub.sv)
                          - 2 * list_dot_product(psub.sv, cb.cbv)
                          + list_dot_product(cb.cbv, cb.cbv),
                          cb.code) AS rk
        FROM psub JOIN cb ON psub.b = cb.b) t
      WHERE rk = 1
    ),
    qres AS (
      SELECT p.cid,
             list_transform(generate_series(1, 64),
                            i -> qq.qv[i] - p.cv[i]) AS rv
      FROM probe p, qq
    ),
    tq AS (
      SELECT q2.cid, cb.b, cb.code,
             list_dot_product(q2.rv[cb.b*8+1 : cb.b*8+8],
                              q2.rv[cb.b*8+1 : cb.b*8+8])
             - 2 * list_dot_product(q2.rv[cb.b*8+1 : cb.b*8+8], cb.cbv)
             + list_dot_product(cb.cbv, cb.cbv) AS d2
      FROM qres q2 CROSS JOIN cb
    ),
    score AS (
      SELECT e.vec_id, sum(t.d2) AS s
      FROM enc e
      JOIN tq t ON t.cid = e.cid AND t.b = e.b AND t.code = e.code
      GROUP BY e.vec_id
    )
    SELECT vec_id, CAST(s AS DOUBLE) AS adc_dist
    FROM score ORDER BY adc_dist, vec_id LIMIT 10
    """,
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (Jégou et al., PAMI 2011; the FAISS IVFPQ shape) —
    coarse IVF cells (8 deterministic sampled centroids, vec_id < 8)
    prune the search to the 2 cells nearest the query (vec_id = 8);
    product quantization compresses each corpus RESIDUAL
    (vector − centroid) to 8 codebook indices (codebooks = residuals of
    the 16 smallest-id corpus rows); ranking is asymmetric distance via
    per-cell lookup tables. Everything after the quantization is exact
    int64, so Spark and DuckDB replay the identical
    assign→residual→encode→ADC chain bit-for-bit.

    Scale shape: assignment, residual, encode, and ADC all run fused in
    ONE mapInPandas kernel over a single corpus scan — no shuffle; rows
    in unprobed cells drop inside the kernel; the only driver collects
    are the 8 centroids + 16 codebook rows + 1 query (ANN metadata).
    Steady-state deployments persist the codes with
    ``save_ivf_index``-style cell partitioning so probes read only
    probed directories."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    qrow = emb.where(F.col("vec_id") == 8).select("embedding").take(1)
    if not qrow:  # empty corpus -> empty result, same schema
        return spark.createDataFrame([], "vec_id bigint, adc_dist double")
    cent = emb.where(F.col("vec_id") < 8)
    corpus = emb.where(F.col("vec_id") >= 16)
    return S.ivfpq_adc_topk(
        corpus, cent, qrow[0][0], m=8, codebook_k=16, n_probe=2, k=10
    )


@query(
    "sim_semantic_decontaminate",
    oracle=f"""
    WITH {_Q_SQL},
    ev AS (SELECT vec_id, v FROM q
           WHERE vec_id % 50 = 0 AND vec_id < 10000),
    tr AS (SELECT vec_id, v FROM q
           WHERE NOT (vec_id % 50 = 0 AND vec_id < 10000)),
    cos AS (
      SELECT t.vec_id, e.vec_id AS eid,
             list_dot_product(t.v, e.v)
               / (sqrt(list_dot_product(t.v, t.v))
                  * sqrt(list_dot_product(e.v, e.v))) AS c
      FROM tr t, ev e
    ),
    mx AS (SELECT vec_id, max(c) AS mc FROM cos GROUP BY 1)
    SELECT m.vec_id,
           m.mc AS max_eval_cosine,
           CAST(min(c.eid) AS BIGINT) AS nearest_eval,
           (m.mc >= 0.3) AS contaminated
    FROM mx m JOIN cos c ON c.vec_id = m.vec_id AND c.c = m.mc
    GROUP BY 1, 2, 4
    """,
)
def sim_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: flag training vectors
    whose max cosine against the held-out eval set (vec_id % 50 = 0 —
    the benchmark stand-in) clears 0.3 — catches the REWORDED
    contamination that survives the n-gram gate (`text_decontaminate`);
    production pipelines run both.

    Scale shape: the eval set is bounded by contract (a benchmark
    suite), broadcast once; the corpus is scanned once through a
    row-wise-max GEMM kernel with NO exchange in the plan (one output
    row per corpus vector — contrast the top-k kernels that need the
    k×partitions resolve window). Max-tie resolution is min eval id,
    deterministic on both engines over identical IEEE divisions."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    is_eval = (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 10000)
    return S.semantic_decontaminate(
        emb.where(~is_eval), emb.where(is_eval), threshold=0.3
    )


@query(
    "sim_embedding_drift",
    oracle=f"""
    WITH {_Q_SQL},
    x AS (
      SELECT vec_id % 2 AS grp, i.i + 1 AS dim, v[i.i + 1] AS qv
      FROM q, (SELECT unnest(generate_series(0, 63)) AS i) i
    ),
    sums AS (
      SELECT grp, dim,
             CAST(sum(qv) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
      FROM x GROUP BY 1, 2
    ),
    j AS (
      SELECT a.dim, a.s AS sa, a.n AS na, b.s AS sb, b.n AS nb
      FROM sums a JOIN sums b ON a.dim = b.dim
      WHERE a.grp = 0 AND b.grp = 1
    )
    SELECT min(na) AS n_a, min(nb) AS n_b,
           CAST(sum(CAST(sa AS HUGEINT) * CAST(sb AS HUGEINT)) AS DOUBLE)
             / (sqrt(CAST(sum(CAST(sa AS HUGEINT) * CAST(sa AS HUGEINT))
                          AS DOUBLE))
                * sqrt(CAST(sum(CAST(sb AS HUGEINT) * CAST(sb AS HUGEINT))
                            AS DOUBLE))) AS mean_cosine,
           max(abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb))
             AS max_mean_gap
    FROM j
    """,
)
def sim_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor between two corpus slices
    (vec_id parity as the yesterday/today stand-in): cosine between the
    slices' mean vectors plus the worst per-dimension mean gap — the
    cheap pre-training check that a new data drop hasn't shifted the
    embedding space (a mean-cosine well below 1 or a fat dimension gap
    means the retrieval index / dedup thresholds need requalifying).

    Determinism: per-dim sums are exact BIGINT over the quantized
    grid; cross products go through DECIMAL(38) (HUGEINT in the
    oracle) so the dot/norms are exact integers before ONE double
    conversion each; the mean gap is a difference of two single IEEE
    divisions. Cosine of means needs no count normalization at all —
    the counts cancel.

    Scale shape: one posexplode + map-side-combined (slice, dim)
    aggregate — 128 output rows regardless of corpus size — then a
    64-row join and a 1-row aggregate. This is the fixed-width-state
    monitoring shape: at 100 TB the only corpus-sized work is the one
    scan."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    from polars_gdal_spark.functions.similarity import quantize

    x = emb.select(
        (F.col("vec_id") % 2).alias("grp"),
        F.posexplode(quantize(F.col("embedding"))).alias("dim", "qv"),
    )
    sums = x.groupBy("grp", "dim").agg(
        F.sum("qv").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    a = sums.where(F.col("grp") == 0).select(
        "dim", F.col("s").alias("sa"), F.col("n").alias("na")
    )
    b = sums.where(F.col("grp") == 1).select(
        "dim", F.col("s").alias("sb"), F.col("n").alias("nb")
    )
    j = a.join(b, "dim")
    d38 = "decimal(38,0)"
    return j.agg(
        F.min("na").alias("n_a"),
        F.min("nb").alias("n_b"),
        (
            F.sum(F.col("sa").cast(d38) * F.col("sb").cast(d38))
            .cast("double")
            / (
                F.sqrt(
                    F.sum(
                        F.col("sa").cast(d38) * F.col("sa").cast(d38)
                    ).cast("double")
                )
                * F.sqrt(
                    F.sum(
                        F.col("sb").cast(d38) * F.col("sb").cast(d38)
                    ).cast("double")
                )
            )
        ).alias("mean_cosine"),
        F.max(
            F.abs(
                F.col("sa").cast("double") / F.col("na")
                - F.col("sb").cast("double") / F.col("nb")
            )
        ).alias("max_mean_gap"),
    )
