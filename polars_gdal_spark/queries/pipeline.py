"""Composed training-data preparation pipeline (north-star showcase).

One oracle-checked query chaining the LLM-pipeline operators end to end
the way a real 100 TB corpus prep does:

    augment → language-ID gate → quality gate → exact dedup → token budget

Every stage is the same operator the standalone queries exercise
(functions/text.py, functions/dedup.py); the DuckDB oracle replays the
identical computation, so the composition — not just each piece — is
hash-verified. The whole pipeline is one Spark job: two narrow
filter/project stages fused into the scan, then a single shuffle for the
digest groupBy (map-side combined), then per-group token accounting on
the deduped (small) relation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from polars_gdal_spark.functions import text as T
from polars_gdal_spark.queries import query
from polars_gdal_spark.queries.dedup import _AUG_SQL, _augmented
from polars_gdal_spark.queries.text import _H, _NTOK, _PUNCT

_BPE = (
    "len(list_filter(string_split_regex("
    "regexp_replace(text, '([0-9]+|[^\\w\\s])', ' \\1 ', 'g'), '\\s+'),"
    " x -> x <> ''))"
)

_PIPELINE_ORACLE = f"""
    WITH {_AUG_SQL},
    aug2 AS (
      SELECT * FROM aug
      UNION ALL
      SELECT doc_id + 20000 AS doc, array_to_string(tk, ' ') AS text FROM toks
    ),
    hits AS (
      SELECT doc, text,
             {_H['de']} AS h_de, {_H['en']} AS h_en,
             {_H['es']} AS h_es, {_H['fr']} AS h_fr,
             {_NTOK.format(c='text')} AS ntok,
             {_PUNCT.format(c='text')} AS npunct,
             length(text) AS nchars
      FROM aug2
    ),
    kept AS (
      SELECT doc, text FROM hits
      WHERE (CASE WHEN h_de > 0 AND h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                  WHEN h_en > 0 AND h_en >= h_es AND h_en >= h_fr THEN 'en'
                  WHEN h_es > 0 AND h_es >= h_fr THEN 'es'
                  WHEN h_fr > 0 THEN 'fr'
                  ELSE 'und' END) = 'en'
        AND ntok >= 5
        AND 5 * npunct < nchars
    ),
    groups AS (
      SELECT md5(text) AS digest, min(doc) AS rep_doc,
             count(*) AS n_dups, min(text) AS text
      FROM kept GROUP BY 1
    )
    SELECT rep_doc, n_dups,
           CAST({_NTOK.format(c='text')} AS BIGINT) AS ws_tokens,
           CAST({_BPE} AS BIGINT) AS bpe_tokens
    FROM groups
"""


@query("pipeline_training_prep", oracle=_PIPELINE_ORACLE)
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus prep over the augmented documents table (base ∪
    80%-prefix mutants ∪ verbatim copies, so dedup provably fires):

    1. keep docs language-identified as English (``lang_guess``);
    2. keep docs passing the quality gate (≥5 tokens, punct ratio < 0.2 —
       expressed as ``5*punct < chars`` so the comparison is pure
       integer math on both engines);
    3. exact-dedup by content digest, keeping min(doc) per group;
    4. report each surviving document's whitespace + BPE-ish token
       counts (the training-budget accounting).

    Gates 1-2 are JVM-side column expressions that Catalyst fuses into
    the scan stage — the corpus is filtered *before* the only shuffle
    (the digest groupBy), which is the ordering that matters at 100 TB.
    """
    aug = _augmented(spark, sf_dir, with_copy=True)
    c = F.col("text")
    kept = aug.where(
        (T.lang_guess(c) == "en")
        & (T.token_count(c) >= 5)
        & (F.lit(5) * T.punct_count(c) < F.length(c).cast("bigint"))
    )
    groups = kept.groupBy(F.md5(c).alias("digest")).agg(
        F.min("doc").alias("rep_doc"),
        F.count("*").alias("n_dups"),
        F.min("text").alias("text"),
    )
    return groups.select(
        "rep_doc",
        "n_dups",
        T.token_count(F.col("text")).alias("ws_tokens"),
        T.bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    )


@query(
    "pipeline_hash_sample",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 16)
          < '3333333333333333'
    """,
)
def pipeline_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% Bernoulli thinning of the corpus by md5 rank —
    a pure pushed-down filter (zero shuffle, reproducible under any
    partitioning). 0x3333333333333333 / 16^16 = 0.2."""
    from polars_gdal_spark.functions.sampling import hash_sample
    from polars_gdal_spark.queries import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    return hash_sample(docs, "doc_id", 0.2, seed="s").select(
        "doc_id", "lang", "source"
    )


@query(
    "pipeline_domain_mix",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, lang, source FROM ranked WHERE rk <= 15
    """,
)
def pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated data recipe: exactly 15 of the 25 documents per source domain,
    selected by deterministic md5 rank (one shuffle on the stratum key;
    WindowGroupLimit pre-truncates per input partition)."""
    from polars_gdal_spark.functions.sampling import stratified_sample_exact
    from polars_gdal_spark.queries import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    return stratified_sample_exact(
        docs, "source", "doc_id", 15, seed="mix"
    ).select("doc_id", "lang", "source")


@query(
    "pipeline_quality_percentile",
    oracle="""
    WITH thr AS (
      SELECT quantile_disc(n_chars, 0.25) AS q25 FROM documents
    )
    SELECT d.doc_id, d.n_chars, thr.q25
    FROM documents d CROSS JOIN thr
    WHERE d.n_chars >= thr.q25
    """,
)
def pipeline_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quantile quality gate: drop the shortest quartile of the
    corpus. percentile_disc picks an actual data value (no
    interpolation), so the threshold — and therefore the kept set — is
    engine-exact. The threshold is a one-row aggregate broadcast into a
    scan-fused filter; one pass over the corpus plus one tiny agg."""
    from polars_gdal_spark.queries import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    thr = docs.agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars)")
        .cast("bigint")
        .alias("q25")
    )
    return (
        docs.crossJoin(F.broadcast(thr))
        .where(F.col("n_chars") >= F.col("q25"))
        .select("doc_id", "n_chars", "q25")
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_V2_ORACLE = f"""
    WITH {_AUG_SQL},
    aug2 AS (
      SELECT * FROM aug
      UNION ALL
      SELECT doc_id + 20000 AS doc, array_to_string(tk, ' ') AS text FROM toks
    ),
    hits AS (
      SELECT doc, text,
             {_H['de']} AS h_de, {_H['en']} AS h_en,
             {_H['es']} AS h_es, {_H['fr']} AS h_fr,
             {_NTOK.format(c='text')} AS ntok,
             {_PUNCT.format(c='text')} AS npunct,
             length(text) AS nchars
      FROM aug2
    ),
    kept AS (
      SELECT doc, text FROM hits
      WHERE (CASE WHEN h_de > 0 AND h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                  WHEN h_en > 0 AND h_en >= h_es AND h_en >= h_fr THEN 'en'
                  WHEN h_es > 0 AND h_es >= h_fr THEN 'es'
                  WHEN h_fr > 0 THEN 'fr'
                  ELSE 'und' END) = 'en'
        AND ntok >= 5
        AND 5 * npunct < nchars
    ),
    inj AS (
      SELECT doc,
             text || ' contact user' || substr(md5(text), 1, 8)
                  || '@example.com' AS text
      FROM kept
    ),
    scr AS (
      SELECT doc,
             regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g') AS text
      FROM inj
    ),
    groups AS (
      SELECT md5(text) AS digest, min(doc) AS rep_doc,
             count(*) AS n_dups, min(text) AS text
      FROM scr GROUP BY 1
    ),
    bt AS (
      SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
      FROM documents WHERE doc_id % 23 = 0
    ),
    bs AS (
      SELECT DISTINCT unnest(list_distinct(
        CASE WHEN len(tk) >= 5 THEN
          list_transform(generate_series(1, len(tk) - 4),
                         i -> array_to_string(array_slice(tk, i, i + 4), ' '))
        ELSE []::VARCHAR[] END)) AS shingle
      FROM bt
    ),
    gtk AS (
      SELECT rep_doc, n_dups, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM groups
    ),
    cs AS (
      SELECT rep_doc, unnest(list_distinct(
        CASE WHEN len(tk) >= 5 THEN
          list_transform(generate_series(1, len(tk) - 4),
                         i -> array_to_string(array_slice(tk, i, i + 4), ' '))
        ELSE []::VARCHAR[] END)) AS shingle
      FROM gtk
    ),
    sizes AS (SELECT rep_doc, count(*) AS n_shingles FROM cs GROUP BY rep_doc),
    ov AS (
      SELECT cs.rep_doc, count(*) AS n_overlap
      FROM cs JOIN bs USING (shingle) GROUP BY cs.rep_doc
    )
    SELECT g.rep_doc, g.n_dups,
           CAST({_NTOK.format(c='g.text')} AS BIGINT) AS ws_tokens,
           coalesce(s.n_shingles, 0) AS n_shingles,
           coalesce(o.n_overlap, 0) AS n_overlap
    FROM gtk g
    LEFT JOIN sizes s USING (rep_doc)
    LEFT JOIN ov o USING (rep_doc)
    WHERE coalesce(o.n_overlap, 0) < 0.8 * coalesce(s.n_shingles, 0)
      AND substr(md5('v2:' || CAST(g.rep_doc AS VARCHAR)), 1, 16)
          < '8000000000000000'
"""


@query("pipeline_training_prep_v2", oracle=_V2_ORACLE)
def pipeline_training_prep_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-width corpus-prep composition, chaining every hygiene
    operator the engine ships (each independently oracle-verified):

    1. language-ID + quality gates (scan-fused JVM expressions);
    2. deterministic PII injection keyed on CONTENT (verbatim copies
       inject identically, so dedup still fires) + ``pii_scrub``;
    3. exact dedup by scrubbed-content digest (the one corpus shuffle);
    4. benchmark decontamination of the surviving representatives
       (broadcast eval-set shingles, drop docs ≥0.8 overlap);
    5. deterministic 50% hash-Bernoulli thinning (pure filter);
    6. token accounting on the final kept set.

    Stage order is the 100 TB ordering: all row-local gates run before
    the shuffle; decontamination probes only the deduped survivors; the
    sampler is a free WHERE clause.
    """
    from polars_gdal_spark.functions.dedup import benchmark_contamination
    from polars_gdal_spark.functions.sampling import hash_sample
    from polars_gdal_spark.functions.text import pii_scrub
    from polars_gdal_spark.queries import load_tables
    from polars_gdal_spark.queries.dedup import _augmented

    aug = _augmented(spark, sf_dir, with_copy=True)
    c = F.col("text")
    kept = aug.where(
        (T.lang_guess(c) == "en")
        & (T.token_count(c) >= 5)
        & (F.lit(5) * T.punct_count(c) < F.length(c).cast("bigint"))
    )
    injected = kept.withColumn(
        "text",
        F.concat(
            c,
            F.lit(" contact user"),
            F.substring(F.md5(c), 1, 8),
            F.lit("@example.com"),
        ),
    )
    scrubbed = pii_scrub(injected, "text").select(
        "doc", F.col("text_scrubbed").alias("text")
    )
    groups = scrubbed.groupBy(F.md5("text").alias("digest")).agg(
        F.min("doc").alias("rep_doc"),
        F.count("*").alias("n_dups"),
        F.min("text").alias("text"),
    )
    # Four consumers below (shingle sizes, overlap hits, the doc frame,
    # the join back) would each re-run the gates+scrub+dedup lineage;
    # checkpoint the (deduped, corpus-sized-but-small) survivors once.
    groups = groups.localCheckpoint(eager=True)
    bench = load_tables(spark, sf_dir)["documents"].where(
        F.col("doc_id") % 23 == 0
    )
    # n_dups/text ride the contamination spine (carry_cols) — no
    # join-back against groups, one fewer join at any scale.
    scored = benchmark_contamination(
        groups.select("rep_doc", "n_dups", "text"),
        bench,
        "rep_doc",
        "text",
        "text",
        n=5,
        carry_cols=("n_dups", "text"),
    ).withColumnRenamed("doc", "rep_doc")
    survivors = scored.where(
        F.col("n_overlap") < 0.8 * F.col("n_shingles")
    )
    return hash_sample(survivors, "rep_doc", 0.5, seed="v2").select(
        F.col("rep_doc"),
        "n_dups",
        T.token_count(F.col("text")).alias("ws_tokens"),
        "n_shingles",
        "n_overlap",
    )


@query(
    "pipeline_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS ntok
      FROM documents
    ),
    c AS (
      SELECT source, ntok,
             sum(ntok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS cum
      FROM t
    )
    SELECT source,
           CAST((cum - ntok) // 128 AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS pack_tokens
    FROM c GROUP BY 1, 2
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: concatenate each source shard's
    documents in deterministic (doc_id) order and cut the token stream
    into 128-token context windows; each document is assigned to the
    pack where its first token lands (offset-based packing accounting).
    Output: per-pack document count and started-token mass.

    Scale shape: packing is per-shard (``partitionBy source``) — the
    window sort never needs a global order, so 1000 executors each pack
    their own shards in parallel; one shuffle on the shard key, running
    sum computed within partitions. This is exactly how GPT-style data
    loaders pack at 100 TB: shard-local greedy fill, no cross-shard
    coordination. Pure integer math (token counts, integer division)
    keeps the result hash-identical to the oracle.
    """
    from pyspark.sql.window import Window

    from polars_gdal_spark.queries import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    t = docs.select(
        "source",
        "doc_id",
        T.token_count(F.col("text")).alias("ntok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.select(
        "source", "ntok", F.sum("ntok").over(w).alias("cum")
    )
    return c.groupBy(
        "source",
        F.expr("(cum - ntok) div 128").cast("bigint").alias("pack_id"),
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("ntok").cast("bigint").alias("pack_tokens"),
    )


@query(
    "pipeline_shuffle_order",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             md5('shuf:' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    )
    SELECT doc_id,
           CAST(CAST('0x' || substr(hx, 1, 2) AS INT) % 16 AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY CAST(CAST('0x' || substr(hx, 1, 2) AS INT) % 16
                               AS INT)
             ORDER BY hx, doc_id
           ) AS BIGINT) AS pos
    FROM h
    """,
)
def pipeline_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets a
    (shard, position) from the md5 of its id — the reproducible
    random-order write-out a data loader consumes (same permutation on
    any cluster, any partitioning, any rerun; seed changes the
    permutation). Sharding by the hash's first byte keeps each window
    sort shard-local — 16 independent sorts here, thousands at 100 TB —
    so no global ordering step exists; writing shard-partitioned output
    preserves the order within files.
    """
    from polars_gdal_spark.queries import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    from pyspark.sql.window import Window

    hx = F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    h = docs.select("doc_id", hx.alias("hx"))
    shard = (F.conv(F.substring("hx", 1, 2), 16, 10).cast("int") % 16).cast(
        "int"
    )
    w = Window.partitionBy("shard").orderBy("hx", "doc_id")
    return (
        h.select("doc_id", "hx", shard.alias("shard"))
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
    )
