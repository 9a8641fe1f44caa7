"""Deduplication queries over the ``documents`` table (driver contract).

The raw corpus has no duplicates, so each query runs the operators over a
deterministic **augmented corpus**: every document plus a near-duplicate
mutation (the first 80% of its tokens, doc_id+10000000) and — for the exact
family — a verbatim copy (doc_id+20000000). The augmentation itself is pure
DataFrame algebra, reproduced verbatim in the DuckDB oracle, so hits are
guaranteed and hash-checked end to end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from polars_gdal_spark.functions import dedup as D
from polars_gdal_spark.queries import load_tables, query


def _toks(c):
    return F.filter(F.split(F.lower(c), " "), lambda x: x != F.lit(""))


def _augmented(spark: SparkSession, sf_dir: str, with_copy: bool = False) -> DataFrame:
    """base (normalized) ∪ 80%-prefix mutation (+10000000) [∪ verbatim copy (+20000000)]."""
    docs = load_tables(spark, sf_dir)["documents"]
    tk = _toks(F.col("text"))
    base = docs.select(
        F.col("doc_id").alias("doc"), F.array_join(tk, " ").alias("text")
    )
    k = F.greatest(F.lit(1), F.floor(F.size(tk) * 0.8).cast("int"))
    mut = docs.select(
        (F.col("doc_id") + 10000000).alias("doc"),
        F.array_join(F.slice(tk, F.lit(1), k), " ").alias("text"),
    )
    out = base.unionAll(mut)
    if with_copy:
        out = out.unionAll(
            base.select((F.col("doc") + 20000000).alias("doc"), "text")
        )
    # documents is a single parquet file → 1-2 input splits; spread the
    # shingle/hash work across the cluster before the heavy operators
    return out.repartition(spark.sparkContext.defaultParallelism)


# Shared oracle CTEs mirroring _augmented + shingle generation.
_AUG_SQL = """
  toks AS (
    SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
    FROM documents
  ),
  aug AS (
    SELECT doc_id AS doc, array_to_string(tk, ' ') AS text FROM toks
    UNION ALL
    SELECT doc_id + 10000000 AS doc,
           array_to_string(
             array_slice(tk, 1, greatest(1, CAST(floor(0.8 * len(tk)) AS INT))),
             ' ') AS text
    FROM toks
  )
"""

_SHINGLE_SQL = """
  tk2 AS (
    SELECT doc, list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM aug
  ),
  shing AS (
    SELECT doc, unnest(list_distinct(
      CASE WHEN len(tk) >= 3 THEN
        list_transform(generate_series(1, len(tk) - 2),
                       i -> array_to_string(array_slice(tk, i, i + 2), ' '))
      ELSE []::VARCHAR[] END)) AS shingle
    FROM tk2
  )
"""


@query(
    "dedup_exact",
    oracle=f"""
    WITH {_AUG_SQL},
    aug2 AS (
      SELECT * FROM aug
      UNION ALL
      SELECT doc_id + 20000000 AS doc, array_to_string(tk, ' ') AS text FROM toks
    )
    SELECT md5(lower(trim(text))) AS digest,
           count(*) AS n_dups,
           min(doc) AS representative_id
    FROM aug2
    GROUP BY 1
    HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-digest hash-groupBy: reports duplicate
    groups (digest, size, representative). The verbatim copies guarantee
    one group per source document. Map-side combine keeps the shuffle at
    one row per digest — the O(corpus) exact-dedup at 100 TB."""
    aug = _augmented(spark, sf_dir, with_copy=True)
    return D.exact_dup_groups(aug, "doc", "text")


# MinHash-LSH candidate CTE chain (shared by the pair query and the
# recall harness): 16 hashes, 4 bands x 4 rows, bucket cap 64.
_MINHASH_CAND_SQL = f"""
    WITH {_AUG_SQL},
    {_SHINGLE_SQL},
    mh AS (
      SELECT doc, seed,
             min(xor(CAST(('0x' || substr(md5(shingle), 1, 14)) AS BIGINT), s.c))
               AS mh
      FROM shing, (SELECT * FROM (VALUES (0, 61620540649648908), (1, 29374383483003867), (2, 42114560361087690), (3, 59085761434809420), (4, 46164968885894621), (5, 22365717841552286), (6, 56488808382706310), (7, 58206001367736487), (8, 15930271405568968), (9, 52763672706474767), (10, 41786700642489633), (11, 45891371794529076), (12, 70088452899773101), (13, 28543675751347374), (14, 64770685752751656), (15, 68451890056042756)) v(seed, c)) s
      GROUP BY doc, seed
    ),
    bands AS (
      SELECT doc, seed // 4 AS band,
             md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS band_sig
      FROM mh GROUP BY doc, seed // 4
    ),
    bkt AS (
      SELECT b.* FROM bands b
      JOIN (SELECT band, band_sig FROM bands
            GROUP BY band, band_sig HAVING count(*) BETWEEN 2 AND 64) e
      USING (band, band_sig)
    ),
    cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM bkt a
      JOIN bkt b ON a.band = b.band AND a.band_sig = b.band_sig
                AND a.doc < b.doc
    )
"""


@query(
    "dedup_minhash_lsh",
    oracle=_MINHASH_CAND_SQL + "\n    SELECT doc_a, doc_b FROM cand",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (16 hashes, 4 bands × 4 rows) over
    3-word shingles, bucket-size-capped at 64 (degenerate buckets are
    dropped before membership collection). Pair generation is an
    equi-join on (band, band_sig) — bucket-local, never O(n²); the
    canonical fuzzy-dedup at scale."""
    aug = _augmented(spark, sf_dir)
    return D.minhash_lsh_pairs(
        aug, "doc", "text", n_hashes=16, bands=4, shingle_n=3, max_bucket=64
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_AUG_SQL},
    {_SHINGLE_SQL},
    shc AS (
      SELECT s.* FROM shing s
      JOIN (SELECT shingle FROM shing
            GROUP BY shingle HAVING count(*) <= 1024) k
      USING (shingle)
    ),
    sizes AS (SELECT doc, count(*) AS sz FROM shc GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           inter / (sa.sz + sb.sz - inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard verification pairs (≥0.3), hot-shingle DF cap
    at 1024 (corpus-wide boilerplate shingles are dropped from both the
    join and the sizes — they carry no near-dup signal and would make
    the self-join quadratic). Pair space bounded by the shingle
    equi-join; jaccard is an exact int/int ratio."""
    aug = _augmented(spark, sf_dir)
    return D.ngram_jaccard_pairs(
        aug, "doc", "text", n=3, threshold=0.3, max_shingle_df=1024
    )


_LSH_PAIRS_SQL = """
  mh AS (
    SELECT doc, seed,
           min(xor(CAST(('0x' || substr(md5(shingle), 1, 14)) AS BIGINT), s.c))
             AS mh
    FROM shing, (SELECT * FROM (VALUES (0, 61620540649648908), (1, 29374383483003867), (2, 42114560361087690), (3, 59085761434809420), (4, 46164968885894621), (5, 22365717841552286), (6, 56488808382706310), (7, 58206001367736487), (8, 15930271405568968), (9, 52763672706474767), (10, 41786700642489633), (11, 45891371794529076), (12, 70088452899773101), (13, 28543675751347374), (14, 64770685752751656), (15, 68451890056042756)) v(seed, c)) s
    GROUP BY doc, seed
  ),
  bands AS (
    SELECT doc, seed // 4 AS band,
           md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS band_sig
    FROM mh GROUP BY doc, seed // 4
  ),
  bkt AS (
    SELECT b.* FROM bands b
    JOIN (SELECT band, band_sig FROM bands
          GROUP BY band, band_sig HAVING count(*) BETWEEN 2 AND 64) e
    USING (band, band_sig)
  ),
  pairs AS (
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM bkt a
    JOIN bkt b ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc < b.doc
  )
"""


@query(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_AUG_SQL.strip().lstrip()},
    {_SHINGLE_SQL.strip()},
    {_LSH_PAIRS_SQL.strip()},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(doc, lab) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.lab FROM edges e JOIN reach r ON r.doc = e.b
    )
    SELECT doc, min(lab) AS component FROM reach GROUP BY doc
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fuzzy-dedup pipeline tail: LSH candidate pairs → connected
    components → min-id representative per duplicate cluster. Iterative
    min-label propagation (O(cluster diameter) rounds, shallow for
    near-dup clusters); oracle = recursive-CTE transitive closure."""
    aug = _augmented(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(aug, "doc", "text", 16, 4, 3)
    return D.connected_components(pairs)


@query(
    "dedup_simhash",
    oracle=f"""
    WITH {_AUG_SQL},
    tk2 AS (
      SELECT doc, list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM aug
    ),
    dtoks AS (SELECT doc, unnest(list_distinct(tk)) AS tok FROM tk2),
    pos AS (
      SELECT doc, i,
             CASE WHEN substr(md5(tok), i, 1) IN
                  ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END AS v
      FROM dtoks, (SELECT unnest(generate_series(1, 32)) AS i) r
    ),
    bitv AS (
      SELECT doc, i, CASE WHEN sum(v) > 0 THEN '1' ELSE '0' END AS bit
      FROM pos GROUP BY doc, i
    )
    SELECT doc, string_agg(bit, '' ORDER BY i) AS simhash
    FROM bitv GROUP BY doc
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signature per document (distinct-token ±1 votes per
    bit position). Near-dups land within small hamming distance; the
    signature itself is the hash-checked artifact."""
    aug = _augmented(spark, sf_dir)
    return D.simhash_bits(aug, "doc", "text", bits=32)


@query(
    "dedup_near_resolve",
    oracle=f"""
    WITH RECURSIVE {_AUG_SQL.strip().lstrip()},
    {_SHINGLE_SQL.strip()},
    {_LSH_PAIRS_SQL.strip()},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(doc, lab) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.lab FROM edges e JOIN reach r ON r.doc = e.b
    ),
    comp AS (SELECT doc, min(lab) AS component FROM reach GROUP BY doc)
    SELECT a.doc FROM aug a
    WHERE NOT EXISTS (
      SELECT 1 FROM comp c WHERE c.doc = a.doc AND c.component <> c.doc
    )
    """,
)
def dedup_near_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dedup DROP step — what a training pipeline actually
    ships: LSH pairs → connected components → anti-join every document
    that is not its cluster's min-id representative. Composes the three
    verified operators; the anti join touches only the (small) cluster
    membership relation, never re-shuffling the corpus."""
    aug = _augmented(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(aug, "doc", "text", 16, 4, 3)
    comp = D.connected_components(pairs)
    dropped = comp.where(F.col("component") != F.col("doc")).select("doc")
    return aug.join(dropped, "doc", "left_anti").select("doc")


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH RECURSIVE augv AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 10000000,
             list_concat([CAST(CAST(embedding[1] AS DOUBLE) + 0.1 AS FLOAT)],
                         embedding[2:])
      FROM embeddings
    ),
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      FROM augv
    ),
    params AS (
      SELECT greatest(8, least(24,
               CASE WHEN m <= 1 THEN 0 ELSE length(bin(m - 1)) END)) AS pl
      FROM (SELECT (count(*) + 63) // 64 AS m FROM q)
    ),
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
    qb AS (SELECT q.vec_id, q.v, bkt.bkt FROM q JOIN bkt USING (vec_id)),
    pairs AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM qb a JOIN qb b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= 0.95
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(doc, lab) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.lab FROM edges e JOIN reach r ON r.doc = e.b
    ),
    comp AS (SELECT doc, min(lab) AS component FROM reach GROUP BY doc)
    SELECT vec_id FROM augv a
    WHERE NOT EXISTS (
      SELECT 1 FROM comp c WHERE c.doc = a.vec_id AND c.component <> c.doc
    )
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dedup resolve (the SemDeDup shape, Abbas
    et al. 2023, with LSH buckets standing in for the k-means blocking
    — same block-pairwise-resolve structure, but the bucket count grows
    with n via adaptive planes where SemDeDup fixes k) — the
    semantic-dedup step of a training pipeline: SRP-LSH buckets (8 hyperplanes over the exact-int
    quantization) → bucket-local exact cosine ≥ 0.95 → connected
    components → drop every vector that is not its cluster's min-id
    representative. The corpus is augmented with a deterministic
    near-duplicate of every vector (+0.1 on the first coordinate,
    vec_id+10000000 — cosine ≈ 0.995 on unit vectors) so hits are
    guaranteed; all pair generation is bucket-equi-join, never corpus².
    """
    emb = load_tables(spark, sf_dir)["embeddings"]
    mut = emb.select(
        (F.col("vec_id") + 10000000).alias("vec_id"),
        F.concat(
            F.array(
                (F.element_at("embedding", 1).cast("double") + 0.1).cast(
                    "float"
                )
            ),
            F.slice(F.col("embedding"), 2, F.size(F.col("embedding"))),
        ).alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(mut)
    import polars_gdal_spark.functions.similarity as S

    n_aug = 2 * emb.count()
    pairs = S.lsh_bucketed_pairs(
        aug, id_col="vec_id", vec_col="embedding",
        planes=S.adaptive_planes(n_aug), threshold=0.95,
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    comp = D.connected_components(pairs)
    dropped = comp.where(F.col("component") != F.col("doc")).select(
        F.col("doc").alias("vec_id")
    )
    return aug.join(dropped, "vec_id", "left_anti").select("vec_id")


_BENCH_SHINGLE_SQL = """
  bt AS (
    SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
    FROM documents WHERE doc_id % 23 = 0 AND doc_id < 25000
  ),
  bs AS (
    SELECT DISTINCT unnest(list_distinct(
      CASE WHEN len(tk) >= 5 THEN
        list_transform(generate_series(1, len(tk) - 4),
                       i -> array_to_string(array_slice(tk, i, i + 4), ' '))
      ELSE []::VARCHAR[] END)) AS shingle
    FROM bt
  ),
  corp AS (
    SELECT doc, list_filter(string_split(text, ' '), x -> x <> '') AS tk
    FROM aug
  ),
  cs AS (
    SELECT doc, unnest(list_distinct(
      CASE WHEN len(tk) >= 5 THEN
        list_transform(generate_series(1, len(tk) - 4),
                       i -> array_to_string(array_slice(tk, i, i + 4), ' '))
      ELSE []::VARCHAR[] END)) AS shingle
    FROM corp
  )
"""


@query(
    "text_decontaminate",
    oracle=f"""
    WITH {_AUG_SQL},
    {_BENCH_SHINGLE_SQL.strip()},
    sizes AS (SELECT doc, count(*) AS n_shingles FROM cs GROUP BY doc),
    hits AS (
      SELECT cs.doc, count(*) AS n_overlap
      FROM cs JOIN bs USING (shingle) GROUP BY cs.doc
    )
    SELECT s.doc,
           s.n_shingles,
           h.n_overlap,
           h.n_overlap / CAST(s.n_shingles AS DOUBLE) AS contamination
    FROM sizes s JOIN hits h ON s.doc = h.doc
    WHERE h.n_overlap > 0
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3-appendix recipe, 5-grams here so
    the synthetic short docs shingle): flag augmented-corpus documents
    sharing word n-grams with the deterministic "eval set"
    (doc_id % 23 == 0 below id 25000 — a benchmark is a FIXED set, so
    the stand-in is bounded at any corpus scale; an unbounded eval
    predicate would grow the broadcast with the corpus). The eval side
    is broadcast —
    corpus shingles are probed map-side; the only corpus shuffle is the
    per-doc count groupBy."""
    docs = load_tables(spark, sf_dir)["documents"]
    bench = docs.where(
        (F.col("doc_id") % 23 == 0) & (F.col("doc_id") < 25000)
    )
    aug = _augmented(spark, sf_dir)
    return D.benchmark_contamination(
        aug, bench, "doc", "text", "text", n=5
    ).where(F.col("n_overlap") > 0)


_SIMHASH_SQL = """
  tk2s AS (
    SELECT doc, list_filter(string_split(text, ' '), x -> x <> '') AS tk
    FROM aug2
  ),
  dtoks AS (SELECT doc, unnest(list_distinct(tk)) AS tok FROM tk2s),
  pos AS (
    SELECT doc, i,
           CASE WHEN substr(md5(tok), i, 1) IN
                ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END AS v
    FROM dtoks, (SELECT unnest(generate_series(1, 32)) AS i) r
  ),
  bitv AS (
    SELECT doc, i, CASE WHEN sum(v) > 0 THEN '1' ELSE '0' END AS bit
    FROM pos GROUP BY doc, i
  ),
  sh AS (
    SELECT doc, string_agg(bit, '' ORDER BY i) AS simhash
    FROM bitv GROUP BY doc
  )
"""


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH {_AUG_SQL},
    aug2 AS (
      SELECT * FROM aug
      UNION ALL
      SELECT doc_id + 20000000 AS doc, array_to_string(tk, ' ') AS text FROM toks
    ),
    {_SIMHASH_SQL.strip()},
    banded AS (
      SELECT doc, simhash, b.band,
             substr(simhash, b.band * 8 + 1, 8) AS bv
      FROM sh, (SELECT unnest(generate_series(0, 3)) AS band) b
    ),
    eligible AS (
      SELECT band, bv FROM banded
      GROUP BY band, bv HAVING count(*) BETWEEN 2 AND 64
    ),
    cand AS (SELECT banded.* FROM banded JOIN eligible USING (band, bv))
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
           CAST(len(list_filter(generate_series(1, 32),
             i -> substr(a.simhash, i, 1) <> substr(b.simhash, i, 1)))
             AS INT) AS hamming
    FROM cand a JOIN cand b
      ON a.band = b.band AND a.bv = b.bv AND a.doc < b.doc
    WHERE len(list_filter(generate_series(1, 32),
          i -> substr(a.simhash, i, 1) <> substr(b.simhash, i, 1))) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with hamming ≤ 3 via the Manku banding
    construction: 4 bands of 8 bits — a pair within the hamming budget
    must agree exactly on ≥1 band (pigeonhole), so candidates come from
    a band equi-join with the degenerate-bucket cap, then an exact
    hamming refine. Never an all-pairs scan."""
    aug = _augmented(spark, sf_dir, with_copy=True)
    return D.simhash_pairs(
        aug, "doc", "text", max_hamming=3, bits=32, max_bucket=64
    )


@query(
    "dedup_chunk_exact",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
      FROM documents
    ),
    nch AS (
      SELECT doc_id, tk,
             CAST(ceil(len(tk) / 8.0) AS BIGINT) AS nc
      FROM toks
    ),
    chunks AS (
      SELECT doc_id,
             unnest(list_transform(range(0, nc),
                    i -> doc_id * 1000000 + i)) AS pos,
             unnest(list_transform(range(0, nc),
                    i -> md5(array_to_string(tk[i*8+1 : i*8+8], ' ')))) AS h
      FROM nch
    ),
    winners AS (
      SELECT h, min(pos) AS wpos FROM chunks GROUP BY h
    ),
    kept AS (
      SELECT wpos // 1000000 AS doc_id, count(*) AS kept_chunks
      FROM winners GROUP BY 1
    )
    SELECT n.doc_id,
           n.nc AS total_chunks,
           CAST(coalesce(k.kept_chunks, 0) AS BIGINT) AS kept_chunks,
           CAST(n.nc - coalesce(k.kept_chunks, 0) AS BIGINT) AS dropped_chunks
    FROM nch n LEFT JOIN kept k ON n.doc_id = k.doc_id
    """,
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact substring dedup (the scalable stand-in for
    suffix-array dedup): split every document into consecutive 8-token
    chunks, hash each chunk, and keep only the corpus-wide FIRST
    occurrence of each chunk text — first = smallest (doc_id, chunk_idx),
    encoded as the single integer ``doc_id*1e6 + idx`` so min() orders
    pairs exactly on both engines. Reports per-document kept/dropped
    chunk counts.

    Scale shape: chunk generation is a narrow transform fused into the
    scan (higher-order functions, zero Python); the only shuffle is the
    groupBy on the 128-bit chunk hash — uniform keys, map-side combined
    min(). At 100 TB this is exactly the CCNet/RefinedWeb paragraph-hash
    dedup plan: linear scan + one balanced shuffle, no all-pairs stage.
    Reference parity: extends exact dedup (SURVEY §2.L) below document
    granularity.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    tk = _toks(F.col("text"))
    base = docs.select("doc_id", tk.alias("tk"))
    nch = base.select(
        "doc_id",
        "tk",
        F.ceil(F.size("tk") / F.lit(8.0)).cast("bigint").alias("nc"),
    )
    chunks = nch.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(nc as int) - 1),"
                " i -> array_join(slice(tk, i*8 + 1, 8), ' '))"
            )
        ).alias("idx", "chunk"),
    ).select(
        (F.col("doc_id") * 1000000 + F.col("idx")).alias("pos"),
        F.md5(F.col("chunk")).alias("h"),
    )
    winners = chunks.groupBy("h").agg(F.min("pos").alias("wpos"))
    kept = (
        winners.select(
            F.expr("wpos div 1000000").cast("bigint").alias("doc_id")
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("kept_chunks"))
    )
    return (
        nch.select("doc_id", F.col("nc").alias("total_chunks"))
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "total_chunks",
            F.coalesce(F.col("kept_chunks"), F.lit(0))
            .cast("bigint")
            .alias("kept_chunks"),
            (
                F.col("total_chunks")
                - F.coalesce(F.col("kept_chunks"), F.lit(0))
            )
            .cast("bigint")
            .alias("dropped_chunks"),
        )
    )


@query(
    "dedup_minhash_estimate",
    oracle=f"""
    WITH {_AUG_SQL},
    {_SHINGLE_SQL},
    {_LSH_PAIRS_SQL},
    agree AS (
      SELECT p.doc_a, p.doc_b,
             sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS n_agree
      FROM pairs p
      JOIN mh a ON a.doc = p.doc_a
      JOIN mh b ON b.doc = p.doc_b AND b.seed = a.seed
      GROUP BY 1, 2
    ),
    shc AS (
      SELECT s.* FROM shing s
      JOIN (SELECT shingle FROM shing
            GROUP BY shingle HAVING count(*) <= 1024) k
      USING (shingle)
    ),
    sizes AS (SELECT doc, count(*) AS sz FROM shc GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS i
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT g.doc_a, g.doc_b,
           CAST(g.n_agree AS BIGINT) AS n_agree,
           g.n_agree / 16 AS est_sig,
           COALESCE(i.i / (sa.sz + sb.sz - i.i), 0.0) AS jaccard
    FROM agree g
    LEFT JOIN inter i ON i.doc_a = g.doc_a AND i.doc_b = g.doc_b
    LEFT JOIN sizes sa ON sa.doc = g.doc_a
    LEFT JOIN sizes sb ON sb.doc = g.doc_b
    """,
)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy harness for MinHash (the fuzzy-dedup analogue of
    ``sim_ann_recall``): for every LSH candidate pair, the
    signature-agreement Jaccard estimate (agreeing positions / 16) next
    to the exact n-gram Jaccard over the DF-capped shingle universe —
    the measurement that justifies trusting the sketch at corpus scale.
    Signatures join per-pair (candidate-sized relation, never corpus²);
    the exact side reuses the capped Jaccard plan. All ratios are exact
    int/int divisions — bit-identical across engines."""
    from pyspark import StorageLevel

    aug = _augmented(spark, sf_dir)
    # ONE signature lineage feeds both the LSH bucketing and the
    # per-pair agreement count (round 6 — the harness previously
    # computed the full shingle->min pass twice)
    sigs = D.minhash_signatures(aug, "doc", "text", 16, 3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # pairs feeds TWO lineages — the agreement join below and the
    # only_docs semi-prune inside the docarr build — so candidate
    # generation (band explode + bucket self-join over the PERSISTED
    # sigs) executes twice per run. Round-10 ADVICE suggested
    # materializing the candidate relation; MEASURED at sf10 and
    # REJECTED both ways: persist(MEMORY_AND_DISK) 19.7 -> 23.5 s
    # (cached-plan stats demote the downstream join choices — the
    # same failure mode the triangle-edge A/B documented) and
    # localCheckpoint(eager) 19.7 -> 37.3 s (the eager cut serializes
    # sig-build + pair-gen + block-manager writes ahead of a DAG that
    # otherwise pipelines them, and the checkpointed partitioning is
    # kept where AQE would have coalesced it). The second generation
    # pass reads the persisted sigs, so the recompute costs one
    # band-explode + bucket-join — cheaper than either
    # materialization at every measured scale.
    pairs = D.minhash_lsh_pairs(
        aug, "doc", "text", n_hashes=16, bands=4, shingle_n=3,
        max_bucket=64, sigs=sigs,
    )
    sa = sigs.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"))
    n_agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda b: b
        )
    ).cast("bigint")
    est = pairs.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a", "doc_b", n_agree.alias("n_agree")
    )
    # Exact Jaccard ONLY for the candidate pairs: intersect the two
    # DF-capped per-doc shingle arrays per candidate. The previous form
    # ran ngram_jaccard_pairs at threshold=0.0 — ALL shingle-sharing
    # pairs verified (millions) to left-join back a few thousand
    # candidates; work is now O(candidates), the quantity the harness
    # actually reports.
    # with_prefix=False: candidates come from LSH, never from a prefix
    # join, and array_intersect is order-free — skip the df re-join
    # and the rare-first struct sort (19.4 -> 8.5 s at sf10).
    # only_docs (round 10): arrays are built ONLY for docs that appear
    # in a candidate pair (~5x fewer than the corpus at sf10) — the DF
    # counts stay corpus-global, so sz and the capped universe are
    # unchanged; docs absent from the candidate set were never read
    # from docarr in the first place (est left-joins on pair docs).
    cand_docs = pairs.select(F.col("doc_a").alias("doc")).unionAll(
        pairs.select(F.col("doc_b").alias("doc"))
    )
    docarr, _ = D._shingle_docarr(
        aug, "doc", "text", 3, 0.0, 1024,
        with_prefix=False, only_docs=cand_docs,
    )
    verified = (
        est.join(
            docarr.select(
                F.col("doc").alias("doc_a"),
                F.col("sz").alias("sz_a"),
                F.col("shs").alias("_sa"),
            ),
            "doc_a",
            "left",
        )
        .join(
            docarr.select(
                F.col("doc").alias("doc_b"),
                F.col("sz").alias("sz_b"),
                F.col("shs").alias("_sb"),
            ),
            "doc_b",
            "left",
        )
        .withColumn(
            "_inter",
            F.when(
                F.col("_sa").isNotNull() & F.col("_sb").isNotNull(),
                F.size(F.array_intersect("_sa", "_sb")),
            ).otherwise(F.lit(0)),
        )
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "n_agree",
        (F.col("n_agree") / F.lit(16)).alias("est_sig"),
        # pairs with no shared retained shingle report 0.0 (the oracle's
        # COALESCE over the absent inter row) — also covers docs whose
        # shingles were all DF-capped away
        F.when(
            F.col("_inter") >= 1,
            F.col("_inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("_inter")),
        )
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )


@query(
    "dedup_line_corpus",
    oracle=f"""
    WITH {_AUG_SQL},
    atoks AS (
      SELECT doc, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM aug
    ),
    base AS (
      SELECT doc, tk, CAST(ceil(len(tk) / 10.0) AS BIGINT) AS nl FROM atoks
    ),
    lines AS (
      SELECT doc,
             unnest(list_transform(range(0, nl),
                    i -> md5(array_to_string(tk[i*10+1 : i*10+10], ' ')))) AS h
      FROM base
    ),
    shared AS (
      SELECT h FROM lines GROUP BY h HAVING count(DISTINCT doc) >= 2
    ),
    dup AS (
      SELECT doc, count(*) AS dup_lines
      FROM lines JOIN shared USING (h) GROUP BY doc
    )
    SELECT b.doc,
           b.nl AS total_lines,
           CAST(coalesce(d.dup_lines, 0) AS BIGINT) AS dup_lines
    FROM base b LEFT JOIN dup d ON b.doc = d.doc
    """,
)
def dedup_line_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus duplicated-line removal stats (RefinedWeb/CCNet
    line-wise dedup): split every document into consecutive 10-token
    "lines", then flag each line whose exact text occurs in >= 2
    DISTINCT documents; report per document the total and duplicated
    line counts. Differs from dedup_chunk_exact in semantics — that op
    keeps the corpus-wide first occurrence of a chunk, this one flags
    ALL occurrences of any line shared across documents (the signal
    RefinedWeb uses to strip boilerplate navigation/footer lines).

    Scale shape: line generation is a narrow transform (higher-order
    functions, zero Python); one groupBy on the 128-bit line hash with
    a map-side-combined distinct-doc count produces the shared-line
    set, and one hash equi-join on the same key attributes duplicates
    back to documents — two balanced shuffles on uniform keys, no
    all-pairs stage. At 100 TB this is the CCNet line-dedup plan
    verbatim. Runs over the augmented corpus (base ∪ 80%-prefix
    mutation) so genuinely shared lines exist at every SF.
    """
    aug = _augmented(spark, sf_dir)
    tk = _toks(F.col("text"))
    base = aug.select("doc", tk.alias("tk")).select(
        "doc",
        "tk",
        F.ceil(F.size("tk") / F.lit(10.0)).cast("bigint").alias("nl"),
    )
    lines = base.select(
        "doc",
        F.explode(
            F.expr(
                "transform(sequence(0, cast(nl as int) - 1),"
                " i -> array_join(slice(tk, i*10 + 1, 10), ' '))"
            )
        ).alias("line"),
    ).select("doc", F.md5(F.col("line")).alias("h"))
    shared = (
        lines.groupBy("h")
        .agg(F.count_distinct("doc").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    dup = (
        lines.join(shared, "h")
        .groupBy("doc")
        .agg(F.count("*").alias("dup_lines"))
    )
    return (
        base.select("doc", F.col("nl").alias("total_lines"))
        .join(dup, "doc", "left")
        .select(
            "doc",
            "total_lines",
            F.coalesce(F.col("dup_lines"), F.lit(0))
            .cast("bigint")
            .alias("dup_lines"),
        )
    )


_INCREMENTAL_ORACLE = f"""
    WITH {_AUG_SQL},
    aug2 AS (
      SELECT * FROM aug
      UNION ALL
      SELECT doc_id + 20000000 AS doc, array_to_string(tk, ' ') AS text
      FROM toks
    ),
    tk2 AS (
      SELECT doc, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM aug2
    ),
    shing AS (
      SELECT doc, unnest(list_distinct(
        CASE WHEN len(tk) >= 3 THEN
          list_transform(generate_series(1, len(tk) - 2),
                         i -> array_to_string(array_slice(tk, i, i + 2), ' '))
        ELSE []::VARCHAR[] END)) AS shingle
      FROM tk2
    ),
    mh AS (
      SELECT doc, seed,
             min(xor(CAST(('0x' || substr(md5(shingle), 1, 14)) AS BIGINT), s.c))
               AS mh
      FROM shing, (SELECT * FROM (VALUES (0, 61620540649648908), (1, 29374383483003867), (2, 42114560361087690), (3, 59085761434809420), (4, 46164968885894621), (5, 22365717841552286), (6, 56488808382706310), (7, 58206001367736487), (8, 15930271405568968), (9, 52763672706474767), (10, 41786700642489633), (11, 45891371794529076), (12, 70088452899773101), (13, 28543675751347374), (14, 64770685752751656), (15, 68451890056042756)) v(seed, c)) s
      GROUP BY doc, seed
    ),
    bands AS (
      SELECT doc, seed // 4 AS band,
             md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS band_sig
      FROM mh GROUP BY doc, seed // 4
    ),
    old_digests AS (
      SELECT DISTINCT md5(text) AS dg FROM aug2 WHERE doc < 10000000
    ),
    new_docs AS (SELECT doc, text FROM aug2 WHERE doc >= 10000000),
    exact AS (
      SELECT doc FROM new_docs
      WHERE md5(text) IN (SELECT dg FROM old_digests)
    ),
    old_bands AS (
      SELECT DISTINCT band, band_sig FROM bands WHERE doc < 10000000
    ),
    near AS (
      SELECT DISTINCT b.doc FROM bands b
      JOIN old_bands USING (band, band_sig)
      WHERE b.doc >= 10000000
    )
    SELECT n.doc,
           CAST(CASE WHEN e.doc IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_exact_dup,
           CAST(CASE WHEN r.doc IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_near_dup
    FROM new_docs n
    LEFT JOIN exact e ON e.doc = n.doc
    LEFT JOIN near r ON r.doc = n.doc
    """


@query("dedup_incremental", oracle=_INCREMENTAL_ORACLE)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: flag each document of a NEW batch
    (the 80%-prefix mutants and verbatim copies, doc >= 10000000) against
    the EXISTING corpus (doc < 10000000) — exact via content digest, near
    via shared MinHash-LSH band signatures. This is the shape a rolling
    crawl pipeline runs on every increment: the existing corpus
    contributes only its digest and band-signature KEY SETS (persisted
    index in production — the old text is never reprocessed), and both
    probes are left-semi joins, which cannot explode whatever a hot
    band bucket holds. Copies flag exact+near; mutants flag near only.
    """
    aug = _augmented(spark, sf_dir, with_copy=True)
    existing = aug.where(F.col("doc") < 10000000)
    new = aug.where(F.col("doc") >= 10000000)
    return D.incremental_dedup_flags(new, existing, "doc", "text")


@query("dedup_index_probe", oracle=_INCREMENTAL_ORACLE)
def dedup_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index twin of ``dedup_incremental``: the existing
    corpus's digest + band-signature key sets are WRITTEN to a parquet
    dedup index (``functions.dedup.save_dedup_index``) and the new batch
    is flagged by ``probe_dedup_index`` against the stored keys alone —
    the probe plan scans only index parquet, never corpus text (pinned
    by ``tests/test_llm_ops.py::test_persisted_dedup_index_rolling_
    increments``, which deletes the corpus before probing). Same output,
    same oracle, as the recompute-every-time variant — this row is the
    driver-checked evidence for the rolling-crawl index path.

    The index build is cached per (session, sf_dir): production probes a
    PRE-BUILT index on every increment, so re-measuring the one-time
    build on each execution would misstate the steady-state cost (the
    first call still exercises save_dedup_index end-to-end)."""
    import os
    import tempfile

    aug = _augmented(spark, sf_dir, with_copy=True)
    existing = aug.where(F.col("doc") < 10000000)
    new = aug.where(F.col("doc") >= 10000000)
    path = _DEDUP_INDEX_CACHE.get(sf_dir)
    if path is None or not os.path.isdir(os.path.join(path, "params")):
        path = os.path.join(tempfile.mkdtemp(), "dedup_index")
        D.save_dedup_index(existing, path, id_col="doc", text_col="text")
        _DEDUP_INDEX_CACHE[sf_dir] = path
    return D.probe_dedup_index(new, path, id_col="doc", text_col="text")


_DEDUP_INDEX_CACHE: dict[str, str] = {}


_INDEX_BUILD_ORACLE = f"""
    WITH {_AUG_SQL},
    aug2 AS (
      SELECT * FROM aug
      UNION ALL
      SELECT doc_id + 20000000 AS doc, array_to_string(tk, ' ') AS text
      FROM toks
    ),
    tk2 AS (
      SELECT doc, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM aug2 WHERE doc < 10000000
    ),
    shing AS (
      SELECT doc, unnest(list_distinct(
        CASE WHEN len(tk) >= 3 THEN
          list_transform(generate_series(1, len(tk) - 2),
                         i -> array_to_string(array_slice(tk, i, i + 2), ' '))
        ELSE []::VARCHAR[] END)) AS shingle
      FROM tk2
    ),
    mh AS (
      SELECT doc, seed,
             min(xor(CAST(('0x' || substr(md5(shingle), 1, 14)) AS BIGINT), s.c))
               AS mh
      FROM shing, (SELECT * FROM (VALUES (0, 61620540649648908), (1, 29374383483003867), (2, 42114560361087690), (3, 59085761434809420), (4, 46164968885894621), (5, 22365717841552286), (6, 56488808382706310), (7, 58206001367736487), (8, 15930271405568968), (9, 52763672706474767), (10, 41786700642489633), (11, 45891371794529076), (12, 70088452899773101), (13, 28543675751347374), (14, 64770685752751656), (15, 68451890056042756)) v(seed, c)) s
      GROUP BY doc, seed
    ),
    bands AS (
      SELECT doc, seed // 4 AS band,
             md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS band_sig
      FROM mh GROUP BY doc, seed // 4
    ),
    old_digests AS (
      SELECT DISTINCT md5(text) AS dg FROM aug2 WHERE doc < 10000000
    ),
    old_bands AS (SELECT DISTINCT band, band_sig FROM bands)
    SELECT 'digest' AS key_type, count(*) AS n_keys FROM old_digests
    UNION ALL
    SELECT 'band' AS key_type, count(*) AS n_keys FROM old_bands
    """


@query("dedup_index_build", oracle=_INDEX_BUILD_ORACLE)
def dedup_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-time (per corpus) dedup-index BUILD, split out of
    ``dedup_index_probe`` so the bench reports build and steady-state
    probe separately — the round-4 sf3 artifact conflated them and
    booked the build's corpus scan against the probe (7.5× apparent
    growth; the probe alone measures ~1.2× at 3× data). Every execution
    builds a FRESH index into a new temp dir (honest build timing) and
    refreshes ``_DEDUP_INDEX_CACHE`` so the probe query always measures
    the production shape: flagging an increment against a pre-built
    index. Returns the index's key-set sizes (distinct content digests,
    distinct (band, band_sig) MinHash-LSH signatures) read back from the
    written parquet — so the driver check covers the on-disk artifact,
    not a recomputation."""
    import os
    import shutil
    import tempfile

    aug = _augmented(spark, sf_dir, with_copy=True)
    existing = aug.where(F.col("doc") < 10000000)
    # reclaim the previous build before replacing it (the _BUCKETED_DIRS
    # idiom) — bench warmup+runs would otherwise leak a full index copy
    # per execution
    old = _DEDUP_INDEX_CACHE.pop(sf_dir, None)
    if old:
        shutil.rmtree(os.path.dirname(old), ignore_errors=True)
    path = os.path.join(tempfile.mkdtemp(), "dedup_index")
    D.save_dedup_index(existing, path, id_col="doc", text_col="text")
    _DEDUP_INDEX_CACHE[sf_dir] = path
    dg = (
        spark.read.parquet(path + "/digests")
        .agg(F.count("*").alias("n_keys"))
        .select(F.lit("digest").alias("key_type"), "n_keys")
    )
    bd = (
        spark.read.parquet(path + "/bands")
        .agg(F.count("*").alias("n_keys"))
        .select(F.lit("band").alias("key_type"), "n_keys")
    )
    return dg.unionAll(bd)


@query(
    "dedup_substring_windows",
    oracle=f"""
    WITH {_AUG_SQL},
    tkw AS (
      SELECT doc, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM aug
    ),
    w AS (
      SELECT doc, md5(array_to_string(tk[i.i : i.i + 19], ' ')) AS h
      FROM tkw,
           LATERAL (SELECT unnest(generate_series(1, len(tk) - 19)) AS i) i
      WHERE len(tk) >= 20
    ),
    shared AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc) >= 2),
    dup AS (SELECT doc, count(*) AS dw FROM w JOIN shared USING (h)
            GROUP BY doc)
    SELECT t.doc,
           CAST(greatest(0, len(t.tk) - 19) AS BIGINT) AS n_windows,
           CAST(coalesce(d.dw, 0) AS BIGINT) AS dup_windows,
           CASE WHEN len(t.tk) >= 20
                THEN CAST(coalesce(d.dw, 0) AS DOUBLE) / (len(t.tk) - 19)
                ELSE 0.0 END AS dup_ratio
    FROM tkw t LEFT JOIN dup d USING (doc)
    """,
)
def dedup_substring_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication signal — the OVERLAPPING rolling
    20-token-window variant of line dedup (the span-level signal
    'Deduplicating Training Data Makes Language Models Better', Lee et
    al. 2022, removes; the reference engine has no dedup at all, so
    this extends the engine the way its users' training pipelines do):
    per document, how many of its k-token windows occur verbatim in
    >= 2 DISTINCT documents, as count + ratio. Unlike disjoint lines
    (``dedup_line_corpus``), overlapping windows catch shared spans at
    ANY alignment — a copied paragraph flags every window it covers,
    not just the lines that happen to align to the 10-token grid.

    Scale shape (round 10: md5-over-window-string → zip-slice
    ``xxhash64`` over the k token slots, the exact change that took
    ``pipeline_split_leakage`` 20.4→5.7 s at sf1): windows are hashed
    to 64-bit longs DIRECTLY — k bulk ``slice`` copies zipped
    positionally, one ``xxhash64`` per row in whole-stage codegen, no
    window string or md5 hex ever materialized — so both shuffles
    carry 8-byte keys instead of 32-char hex. Identity by hash is the
    ngram_jaccard substrate's documented ~2⁻⁶⁴ argument: only
    membership COUNTS reach the output, so the DuckDB oracle's
    md5-keyed grouping is count-identical and stays unchanged. The
    shared-window set comes from one map-side-combined count-distinct
    groupBy on the window hash; attribution is one equi-join on the
    same uniform key; per-doc totals are a projection (size − k + 1).
    Two balanced shuffles, no all-pairs stage, no window function —
    the CCNet/line-dedup plan with a k× denser (but still linear)
    stream. Runs over the augmented corpus (base ∪ 80%-prefix
    mutants) so genuinely shared spans exist at every SF."""
    from polars_gdal_spark.functions.dedup import _shingle_rows_with_dups

    k = 20
    aug = _augmented(spark, sf_dir)
    tk = _toks(F.col("text"))
    base = aug.select("doc", tk.alias("tk"))
    # aug text is already lowercase-normalized, so the builder's
    # lower() is an identity and the windows match _toks' tokens
    w = _shingle_rows_with_dups(
        aug, "doc", "text", k, id_alias="doc", out_col="h", hashed=True
    )
    shared = (
        w.groupBy("h")
        .agg(F.count_distinct("doc").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    dup = w.join(shared, "h").groupBy("doc").agg(
        F.count("*").alias("dw")
    )
    totals = base.select(
        "doc",
        F.greatest(F.lit(0), F.size("tk") - (k - 1))
        .cast("bigint")
        .alias("n_windows"),
    )
    return totals.join(dup, "doc", "left").select(
        "doc",
        "n_windows",
        F.coalesce("dw", F.lit(0)).cast("bigint").alias("dup_windows"),
        F.when(
            F.col("n_windows") > 0,
            F.coalesce("dw", F.lit(0)).cast("double") / F.col("n_windows"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ratio"),
    )


@query(
    "dedup_containment_pairs",
    oracle=f"""
    WITH {_AUG_SQL},
    tkc AS (
      SELECT doc, list_filter(string_split(lower(text), ' '),
                              x -> x <> '') AS tk
      FROM aug
    ),
    shingc AS (
      SELECT doc, unnest(list_distinct(
        CASE WHEN len(tk) >= 3 THEN
          list_transform(generate_series(1, len(tk) - 2),
                         i -> array_to_string(array_slice(tk, i, i + 2), ' '))
        ELSE []::VARCHAR[] END)) AS shingle
      FROM tkc
    ),
    shc AS (
      SELECT s.* FROM shingc s
      JOIN (SELECT shingle FROM shingc
            GROUP BY shingle HAVING count(*) <= 1024) k
      USING (shingle)
    ),
    sizes AS (SELECT doc, count(*) AS sz FROM shc GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS ix
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ix / sa.sz AS cont_a_in_b,
           ix / sb.sz AS cont_b_in_a
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE ix / sa.sz >= 0.8 OR ix / sb.sz >= 0.8
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup — the ASYMMETRIC cousin of Jaccard that
    symmetric similarity misses: a short excerpt quoted inside a much
    longer document has |A∩B|/|A| ≈ 1 but tiny Jaccard (the union is
    dominated by B). Flags pairs where either direction's containment
    ≥ 0.8 — the quote/excerpt/boilerplate-wrapper case a training
    pipeline must catch separately from near-dup pairs. The corpus's
    planted 80%-prefix mutants are exactly this shape.

    Scale notes: candidates come from the PPJoin-adapted
    PREFIX(probe) × FULL(index) equi-join with the standard hot-shingle
    DF cap (≤1024); there is deliberately NO length filter —
    short-in-long is the signal here, unlike Jaccard where min ≥ t·max
    prunes provably-dissimilar pairs. Containment is one exact int/int
    IEEE division per direction — bit-identical across engines. The
    naive co-occurrence formulation measured 79.7 s at sf3 (the single
    most expensive headline row); the prefix-filtered form replaced it
    the same session."""
    aug = _augmented(spark, sf_dir)
    return D.ngram_containment_pairs(
        aug, "doc", "text", n=3, threshold=0.8, max_shingle_df=1024
    )


@query(
    "dedup_lsh_recall",
    oracle=_MINHASH_CAND_SQL
    + """,
    truth AS (
      SELECT doc_id AS doc_a, doc_id + 10000000 AS doc_b FROM toks
    ),
    hit AS (
      SELECT count(*) AS n FROM truth t
      JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
    )
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT n FROM hit) AS BIGINT) AS n_hit,
           (SELECT n FROM hit)
             / CAST((SELECT count(*) FROM truth) AS DOUBLE) AS recall
    """,
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-RECALL harness for the MinHash-LSH dedup path — the
    dedup twin of ``sim_ann_recall``: the augmented corpus plants one
    known near-duplicate per base document (the 80%-prefix mutant,
    id + 1e7), so the planted pairs are exact ground truth; this
    measures what fraction the 16-hash/4-band candidate generator
    recovers, next to the candidate count (the verification-cost side
    of the recall/cost trade). Tuning bands/rows/shingle size at 100 TB
    is exactly this measurement — an operator, not a notebook.

    Scale shape: candidates come from the same bucket-capped equi-join
    as ``dedup_minhash_lsh``; the truth set is id arithmetic on the
    corpus scan; the hit check is one equi-join on the pair key; output
    is one row (three counts + one division)."""
    from polars_gdal_spark.queries import load_tables

    aug = _augmented(spark, sf_dir)
    cand = D.minhash_lsh_pairs(
        aug, "doc", "text", n_hashes=16, bands=4, shingle_n=3, max_bucket=64
    ).select("doc_a", "doc_b")
    truth = (
        load_tables(spark, sf_dir)["documents"]
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 10000000).alias("doc_b"),
        )
    )
    n_truth = truth.agg(F.count("*").cast("bigint").alias("n_truth"))
    n_cand = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    n_hit = (
        truth.join(cand, ["doc_a", "doc_b"])
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    return (
        n_truth.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_truth",
            "n_candidates",
            "n_hit",
            (F.col("n_hit") / F.col("n_truth").cast("double")).alias(
                "recall"
            ),
        )
    )


@query(
    "dedup_winnowing",
    oracle=f"""
    WITH {_AUG_SQL},
    tk2 AS (
      SELECT doc, list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS tk
      FROM aug
    ),
    hs AS (
      SELECT doc,
             list_transform(generate_series(1, len(tk) - 2),
               i -> substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]),
                           1, 15)) AS h
      FROM tk2
    ),
    fps AS (
      SELECT doc, unnest(
        CASE WHEN len(h) >= 8 THEN
          list_distinct(list_transform(generate_series(1, len(h) - 7),
            j -> list_aggregate(array_slice(h, j, j + 7), 'min')))
        WHEN len(h) >= 1 THEN [list_aggregate(h, 'min')]
        ELSE []::VARCHAR[] END) AS fp
      FROM hs
    ),
    kept AS (
      SELECT f.* FROM fps f
      JOIN (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 64) c
      USING (fp)
    )
    SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS shared
    FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc < b.doc
    GROUP BY 1, 2
    HAVING count(*) >= 3
    """,
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing match report over the augmented corpus: pairs
    sharing >= 3 selected fingerprints (token 3-grams, window 8 — any
    shared run of >= 10 tokens is guaranteed to contribute a shared
    fingerprint). The substring-localized third member of the near-dup
    family next to bag-of-shingles Jaccard and MinHash sketches; the
    fingerprint index is ~2/(w+1) the size of the full shingle set.
    Round 7 retuned w 4 -> 8 (the verdict's sanctioned knob for the
    heaviest absolute registry row): density 0.4 -> 0.22 of the gram
    set, halving the fp equi-join's pair volume for a guarantee trade
    (6 -> 10 token runs) that is still far below the ~50-token
    thresholds substring dedup uses in practice, and winnowing_pairs
    now shuffles fingerprints ONCE (repartition+persist reused by the
    df-count, the hot cut and the group arrays) and ships each
    candidate pair as ONE packed BIGINT through the dominant shuffle
    (in-plan id-range assert).

    Round 8 lowers the boilerplate document-frequency cap 1024 -> 64
    (SEMANTICS PIN, like the w=8 trade): the measured sf10 df
    distribution put 64% of ALL pair volume (134M of 209M rows) in
    just 1,156 fingerprints with df 257-1024 and another 24% in the
    65-256 band — a fingerprint shared by hundreds of documents is
    template noise carrying no pairwise match signal (MOSS itself
    drops any fingerprint above a small percentage of submissions);
    real near-dup pairs are counted by their many LOW-df shared
    fingerprints. Cap 64 cuts the dominant pair shuffle 209M -> 25M
    rows. Oracle mirrors the cap."""
    aug = _augmented(spark, sf_dir)
    return D.winnowing_pairs(
        aug, "doc", "text", k=3, w=8, min_shared=3, max_fp_df=64
    )


@query(
    "dedup_quality_resolve",
    oracle=f"""
    WITH RECURSIVE {_AUG_SQL.strip().lstrip()},
    {_SHINGLE_SQL.strip()},
    {_LSH_PAIRS_SQL.strip()},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(doc, lab) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.lab FROM edges e JOIN reach r ON r.doc = e.b
    ),
    comp AS (SELECT doc, min(lab) AS component FROM reach GROUP BY doc),
    qual AS (
      SELECT doc,
             len(list_filter(string_split(text, ' '),
                 x -> list_contains(
                   ['the','a','of','and','to','in','is','it'], x)))
             / len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS q
      FROM aug
    ),
    rep AS (
      SELECT c.doc,
             row_number() OVER (
               PARTITION BY c.component ORDER BY q.q DESC, c.doc
             ) AS rk
      FROM comp c JOIN qual q ON q.doc = c.doc
    )
    SELECT a.doc FROM aug a
    LEFT JOIN rep r ON r.doc = a.doc
    WHERE r.doc IS NULL OR r.rk = 1
    """,
)
def dedup_quality_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dedup resolve — the production variant of
    ``dedup_near_resolve``: instead of keeping each duplicate cluster's
    min-id member (arbitrary), keep its highest-QUALITY member
    (stopword-ratio score, doc-id tiebreak) — the rule RefinedWeb /
    FineWeb-class pipelines apply so deduplication never discards the
    best copy of a document. Same verified substrate (LSH pairs →
    connected components); the selection differs only in the
    representative rule.

    Scale shape: the quality score joins onto the cluster MEMBERSHIP
    relation keyed by doc (the components loop already leaves it
    hash-partitioned on doc, so only the pruned (doc, q) projection
    shuffles); the representative pick is an AGGREGATION, not a window
    — each component needs only its argmax member, so
    ``max(struct(q, -doc))`` combines map-side to one row per
    component per partition instead of sort-shuffling every member
    (round 9: this replaced a rank window); the rep relation joins
    back onto the CHECKPOINTED membership (not the scored relation, so
    the quality scan runs once) to name the non-representatives — AQE
    picks broadcast vs shuffle there, since rep is O(components) and
    only small at low duplicate rates — and the final survivor filter
    is a left-anti join of the corpus against that set. Quality is an
    int/int IEEE division and the argmax tiebreak (max q, then min
    doc) is integer-exact, so the kept set is engine-identical."""
    from polars_gdal_spark.functions import text as T

    aug = _augmented(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(aug, "doc", "text", 16, 4, 3)
    comp = D.connected_components(pairs)
    c = F.col("text")
    qual = aug.select(
        "doc", (T.stopword_count(c) / T.token_count(c)).alias("q")
    )
    scored = comp.join(qual, "doc")
    # argmax by (q DESC, doc ASC): max over struct(q, -doc) — doubles
    # compare on q first, the negated id breaks ties toward min doc
    rep = scored.groupBy("component").agg(
        (-F.max(F.struct(F.col("q"), (-F.col("doc")).alias("nd")))["nd"])
        .alias("rep_doc")
    )
    nonrep = (
        comp.join(rep, "component")
        .where(F.col("doc") != F.col("rep_doc"))
        .select("doc")
    )
    return aug.join(nonrep, "doc", "left_anti").select("doc")
