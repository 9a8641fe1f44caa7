"""Text-analysis queries over the ``documents`` table (driver contract).

Each query pairs the Spark operator (polars_gdal_spark.functions.text)
with a DuckDB oracle that replicates the computation token-for-token.
All ratios are int/int double divisions → bit-identical across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from polars_gdal_spark.functions import text as T
from polars_gdal_spark.queries import load_tables, query

# DuckDB fragments mirroring functions/text.py definitions.
_TOKS = "list_filter(string_split({c}, ' '), x -> x <> '')"
_NTOK = f"len({_TOKS})"
_PUNCT = (
    "length({c}) - length(regexp_replace({c}, '[.,;:!?''\"()\\[\\]-]', '', 'g'))"
)
_STOPS = (
    "len(list_filter(" + _TOKS + ", x -> list_contains("
    "['the','a','of','and','to','in','is','it'], x)))"
)


@query(
    "text_quality_features",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS chars_len,
           CAST({_NTOK.format(c='text')} AS BIGINT) AS n_tokens,
           CAST({_PUNCT.format(c='text')} AS BIGINT) AS n_punct,
           CAST({_STOPS.format(c='text')} AS BIGINT) AS n_stopwords,
           (length(text) - ({_NTOK.format(c='text')} - 1))
             / {_NTOK.format(c='text')} AS avg_token_len,
           ({_PUNCT.format(c='text')}) / length(text) AS punct_ratio,
           ({_STOPS.format(c='text')}) / {_NTOK.format(c='text')} AS stopword_ratio
    FROM documents
    """,
)
def text_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring pass: char/token/punct/stopword counts + ratios.
    Pure JVM expressions — one scan, no shuffle, linear at any scale."""
    t = load_tables(spark, sf_dir)
    c = F.col("text")
    return t["documents"].select(
        "doc_id",
        F.length(c).cast("bigint").alias("chars_len"),
        T.token_count(c).alias("n_tokens"),
        T.punct_count(c).alias("n_punct"),
        T.stopword_count(c).alias("n_stopwords"),
        (
            (F.length(c).cast("bigint") - (T.token_count(c) - 1))
            / T.token_count(c)
        ).alias("avg_token_len"),
        (T.punct_count(c) / F.length(c).cast("bigint")).alias("punct_ratio"),
        (T.stopword_count(c) / T.token_count(c)).alias("stopword_ratio"),
    )


def _char_diversity_oracle() -> str:
    """SQL mirror of functions/text.char_diversity, generated from the
    same CHAR_ALPHABET so the bucket set can never drift."""
    cnts = [
        f"CAST((length(text) - length(replace(text, '{ch}', '')))"
        f" AS BIGINT) AS c{i}"
        for i, ch in enumerate(T.CHAR_ALPHABET)
    ]
    ids = [f"c{i}" for i in range(len(T.CHAR_ALPHABET))]
    other = f"(n - ({' + '.join(ids)}))"
    all_ids = ids + [other]
    distinct = " + ".join(
        f"(CASE WHEN {c} > 0 THEN 1 ELSE 0 END)" for c in all_ids
    )
    sq = " + ".join(f"({c} * {c})" for c in all_ids)
    return f"""
    WITH cc AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n, {", ".join(cnts)}
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, n AS chars_n,
           CAST({distinct} AS BIGINT) AS distinct_chars,
           ({sq}) / (n * n) AS char_simpson
    FROM cc
    """


@query("text_char_diversity", oracle=_char_diversity_oracle())
def text_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution quality features (Simpson concentration +
    distinct-bucket count) — the gibberish/repetition gate. Pure JVM
    expressions over a fixed bucket alphabet: one scan, zero shuffle,
    exact integers until the final division (no transcendentals, so the
    doubles are bit-identical across engines)."""
    t = load_tables(spark, sf_dir)
    c = F.col("text")
    d = T.char_diversity(c)
    return (
        t["documents"]
        .where(F.length(c) > 0)
        .select(
            "doc_id",
            d["chars_n"].alias("chars_n"),
            d["distinct_chars"].alias("distinct_chars"),
            d["char_simpson"].alias("char_simpson"),
        )
    )


def _hits_sql(markers: tuple[str, ...]) -> str:
    lst = ",".join(f"'{m}'" for m in markers)
    return (
        f"len(list_filter({_TOKS.format(c='text')},"
        f" x -> list_contains([{lst}], x)))"
    )


_H = {lg: _hits_sql(m) for lg, m in sorted(T.LANG_MARKERS.items())}

@query(
    "text_langid",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang,
             {_H['de']} AS h_de, {_H['en']} AS h_en,
             {_H['es']} AS h_es, {_H['fr']} AS h_fr
      FROM documents
    )
    SELECT doc_id, lang AS lang_actual,
           CASE WHEN h_de > 0 AND h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en > 0 AND h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es > 0 AND h_es >= h_fr THEN 'es'
                WHEN h_fr > 0 THEN 'fr'
                ELSE 'und' END AS lang_pred
    FROM h
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword-marker scoring (n-gram heuristic family)."""
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        T.lang_guess(F.col("text")).alias("lang_pred"),
    )


@query(
    "text_token_counts",
    oracle=f"""
    SELECT source,
           CAST(sum({_NTOK.format(c='text')}) AS BIGINT) AS ws_tokens,
           CAST(sum(len(list_filter(
             string_split_regex(
               regexp_replace(text, '([0-9]+|[^\\w\\s])', ' \\1 ', 'g'),
               '\\s+'),
             x -> x <> ''))) AS BIGINT) AS bpe_tokens,
           count(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (whitespace + BPE-ish regex), aggregated
    per source — the budget accounting pass of a training-data pipeline."""
    t = load_tables(spark, sf_dir)
    c = F.col("text")
    return (
        t["documents"]
        .select(
            "source",
            T.token_count(c).alias("wt"),
            T.bpe_ish_token_count(c).alias("bt"),
        )
        .groupBy("source")
        .agg(
            F.sum("wt").cast("bigint").alias("ws_tokens"),
            F.sum("bt").cast("bigint").alias("bpe_tokens"),
            F.count("*").alias("n_docs"),
        )
    )


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(
             array_slice({_TOKS.format(c='lower(text)')}, 1, 8), ' '))
             AS fingerprint
    FROM documents
    WHERE doc_id < 200
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix fingerprint (md5 of first 8 normalized tokens) — the
    boilerplate-header near-dup key."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .where(F.col("doc_id") < 200)
        .select("doc_id", T.fingerprint(F.col("text"), 8).alias("fingerprint"))
    )


@query(
    "multimodal_payload_meta",
    oracle="""
    SELECT source,
           count(*) AS n_payloads,
           CAST(sum(length(text)) AS BIGINT) AS total_bytes,
           min(sha256(text)) AS min_sha256
    FROM documents
    GROUP BY source
    """,
)
def multimodal_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column convention: documents' text bytes stand in for an
    opaque binary payload; metadata (size, sha256) computed JVM-side and
    aggregated per source. ASCII text ⇒ utf-8 byte length == char length,
    so the oracle can use length(text)."""
    from polars_gdal_spark.functions.multimodal import attach_payload_meta

    t = load_tables(spark, sf_dir)
    payloads = t["documents"].select(
        "doc_id", "source", F.encode("text", "utf-8").alias("payload")
    )
    with_meta = attach_payload_meta(payloads, "payload", "text")
    return with_meta.groupBy("source").agg(
        F.count("*").alias("n_payloads"),
        F.sum(F.col("payload_meta.n_bytes")).cast("bigint").alias("total_bytes"),
        F.min(F.col("payload_meta.sha256")).alias("min_sha256"),
    )


@query(
    "text_tfidf_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS doc,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS term
      FROM documents
    ),
    tf AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY doc, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    ranked AS (
      SELECT tf.doc, tf.term, tf.tf, dfreq.df,
             tf.tf / CAST(dfreq.df AS DOUBLE) AS score,
             row_number() OVER (
               PARTITION BY tf.doc
               ORDER BY tf.tf / CAST(dfreq.df AS DOUBLE) DESC, tf.term
             ) AS rk
      FROM tf JOIN dfreq USING (term)
    )
    SELECT doc, term, tf, df, score FROM ranked WHERE rk <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by exact tf/df ratio
    (integer counts, IEEE-exact division — no log smoothing, so the
    hash matches the oracle bit-for-bit). WindowGroupLimit bounds the
    per-doc rank; the df join shuffles on the near-uniform term key."""
    from polars_gdal_spark.functions.text import tfidf_topk

    docs = load_tables(spark, sf_dir)["documents"]
    return tfidf_topk(docs, "doc_id", "text", k=3)


@query(
    "text_pii_scrub",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' reach me at user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.7 tel +1 555 000 '
                  || CAST(1000 + doc_id % 9000 AS VARCHAR) AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
           len(regexp_extract_all(text,
             '\+[0-9][0-9 -]{7,}[0-9]')) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IPV4>', 'g'),
             '\+[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g')) AS scrub_digest
    FROM aug
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus with deterministic injected PII (the raw
    synthetic docs contain none): every doc gains an email, an IPv4 and
    a phone; the scrub must count and redact them all. Counts are ints;
    the redacted text is hash-compared, so replacement order and
    placeholder text are verified byte-exactly. Pure JVM regex — fuses
    into the scan, zero shuffle."""
    from polars_gdal_spark.functions.text import pii_scrub

    docs = load_tables(spark, sf_dir)["documents"]
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach me at user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 tel +1 555 000 "),
            (1000 + F.col("doc_id") % 9000).cast("string"),
        ).alias("text"),
    )
    s = pii_scrub(aug, "text")
    return s.select(
        "doc_id",
        F.col("n_email").cast("bigint").alias("n_email"),
        F.col("n_ipv4").cast("bigint").alias("n_ipv4"),
        F.col("n_phone").cast("bigint").alias("n_phone"),
        F.md5("text_scrubbed").alias("scrub_digest"),
    )


@query(
    "text_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS v
      FROM documents
    ),
    total AS (SELECT count(*) AS n FROM toks)
    SELECT t.v AS token, count(*) AS n
    FROM toks t
    GROUP BY t.v
    HAVING count(*) * 200 > (SELECT n FROM total)
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1/200-heavy-hitter tokens via the sketch-then-verify
    pattern: per-partition Misra-Gries candidates (bounded memory,
    mapInPandas over Arrow batches) + one exact counting pass over the
    broadcast candidate set. The sketch is approximate; the output is
    exact — hash-checked against a plain GROUP BY oracle."""
    from polars_gdal_spark.functions.sketch import heavy_hitters
    from polars_gdal_spark.functions.text import tokens

    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("token")
    )
    return heavy_hitters(toks, "token", phi_denom=200)


@query(
    "text_typicality",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS term
      FROM documents
    ),
    dfreq AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           CAST(sum(d.df) AS BIGINT) AS df_mass,
           sum(d.df) / CAST(count(*) AS DOUBLE) AS typicality
    FROM toks t JOIN dfreq d USING (term)
    GROUP BY t.doc_id
    """,
)
def text_typicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-typicality quality score: mean document frequency of a
    doc's tokens (exact integer mass / token count — no log smoothing,
    so it hashes identically cross-engine). Low scores flag documents
    made of corpus-rare tokens — the OCR-garbage / wrong-language signal
    a cheap unigram LM gives without float perplexity. Term-key shuffles
    only; the df table joins on the near-uniform term key."""
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), " "),
                lambda x: x != F.lit(""),
            )
        ).alias("term"),
    )
    dfreq = toks.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    return (
        toks.join(dfreq, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("df").alias("df_mass"),
            (F.sum("df") / F.count("*").cast("double")).alias("typicality"),
        )
    )


@query(
    "text_repetition_signals",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)),
                    i -> tk[i] || ' ' || tk[i+1])) AS bigram
      FROM toks
    ),
    cnt AS (
      SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2
    ),
    top AS (
      SELECT doc_id, max(c) AS top_bigram_count, sum(c) AS n_bigrams
      FROM cnt GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(tk)) AS BIGINT) AS n_unique,
           CAST(coalesce(top.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(top.top_bigram_count, 0) AS BIGINT)
             AS top_bigram_count,
           CAST(CASE WHEN coalesce(top.n_bigrams, 0) > 0
                      AND 5 * coalesce(top.top_bigram_count, 0)
                          >= top.n_bigrams
                     THEN 1 ELSE 0 END AS INT) AS repetitive
    FROM toks t LEFT JOIN top ON t.doc_id = top.doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals, computed entirely
    row-locally (zero shuffle): per document, the unique-token count and
    the frequency of its most common bigram. Docs whose top bigram covers
    ≥20% of all bigrams are flagged ``repetitive`` — the classic
    boilerplate/spam gate (Rae et al. 2021 §A1.1), in pure integer math.

    The max-bigram count is found without exploding rows: sort the
    in-row bigram array, then one ``aggregate`` pass finds the longest
    equal-run. All higher-order JVM expressions fused into the scan —
    the 100 TB plan is a single narrow map stage, nothing to shuffle or
    skew. (The DuckDB oracle computes the same counts by explode+groupBy,
    proving plan-shape independence of the values.)
    """
    docs = load_tables(spark, sf_dir)["documents"]
    tk = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
    )
    base = docs.select("doc_id", tk.alias("tk"))
    # sequence(1, 0) yields a DESCENDING [1, 0] in Spark, so the
    # single-token case must short-circuit to an empty array explicitly.
    bg = F.expr(
        "CASE WHEN size(tk) < 2 THEN array()"
        " ELSE array_sort(transform(sequence(1, size(tk) - 1),"
        " i -> concat(tk[i-1], ' ', tk[i]))) END"
    )
    top = F.expr(
        "aggregate(bg,"
        " named_struct('best', 0, 'run', 0, 'prev', ''),"
        " (acc, x) -> named_struct("
        "   'best', greatest(acc.best,"
        "           CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1 END),"
        "   'run', CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1 END,"
        "   'prev', x),"
        " acc -> acc.best)"
    )
    sig = base.select(
        "doc_id",
        F.size("tk").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("tk")).cast("bigint").alias("n_unique"),
        F.expr("greatest(size(tk) - 1, 0)").cast("bigint").alias("n_bigrams"),
        bg.alias("bg"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_unique",
        "n_bigrams",
        top.cast("bigint").alias("top_bigram_count"),
    )
    return sig.select(
        "doc_id",
        "n_tokens",
        "n_unique",
        "n_bigrams",
        "top_bigram_count",
        F.when(
            (F.col("n_bigrams") > 0)
            & (5 * F.col("top_bigram_count") >= F.col("n_bigrams")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("repetitive"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH nums AS (
      SELECT doc_id, text,
             list_filter(
               range(0, CAST(ceil(length(text) / 64.0) AS BIGINT)),
               i -> i % 4 = 0) AS idx
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             unnest(idx) AS frame_no,
             unnest(list_transform(idx,
                    i -> md5(substring(text, CAST(i*64 + 1 AS INT), 64))))
               AS frame_md5
      FROM nums
    )
    SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no, frame_md5 FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling over the multimodal payload convention:
    chunk each binary payload into 64-byte pseudo-frames, keep every
    4th, and emit per-frame digests — the explode-to-frames shape a real
    video pipeline uses before per-frame feature extraction. ASCII text
    bytes stand in for the opaque payload (the decode itself is the
    documented stub), so the oracle reproduces the frames with plain
    substring arithmetic, which is exactly the point: the Spark-side
    plumbing (chunking, sampling stride, one-row-per-frame explode) is
    hash-verified even though the codec is fake. Narrow per-row
    transform, no shuffle at any corpus size."""
    from polars_gdal_spark.functions.multimodal import frame_sample

    docs = load_tables(spark, sf_dir)["documents"]
    payloads = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    sampled = frame_sample(payloads, "doc_id", "payload", every_n=4)
    return sampled.select(
        "doc_id",
        F.col("frame_no").cast("bigint").alias("frame_no"),
        F.md5("frame").alias("frame_md5"),
    )


# BM25 with k1=1.2, b=0.75 folded into exact integer arithmetic (see
# text_bm25_rank docstring): score_t = 22*tf*T*(2N-2df+1)
#                                      / ((2df+1)*(10*tf*T + 3*T + 9*dl*N))
_BM25_TERMS = ("spark", "join", "window", "filter")


@query(
    "text_bm25_rank",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             {_NTOK.format(c='text')} AS dl,
             {','.join(
                 "len(list_filter(" + _TOKS.format(c='text')
                 + f", x -> x = '{t}')) AS tf{i}"
                 for i, t in enumerate(_BM25_TERMS)
             )}
      FROM documents
    ),
    stats AS (
      SELECT count(*) AS n, sum(dl) AS t,
             {','.join(
                 f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}"
                 for i in range(len(_BM25_TERMS))
             )}
      FROM base
    ),
    scored AS (
      SELECT doc_id, dl,
             {' + '.join(
                 f"(CAST(22*tf{i}*t*(2*n - 2*df{i} + 1) AS DOUBLE)"
                 f" / CAST((2*df{i} + 1)"
                 f" * (10*tf{i}*t + 3*t + 9*dl*n) AS DOUBLE))"
                 for i in range(len(_BM25_TERMS))
             )} AS score
      FROM base, stats
    )
    SELECT doc_id, CAST(dl AS BIGINT) AS dl, score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 15
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (k1=1.2, b=0.75) of the corpus against a
    fixed query-term set, top-15 documents.

    Determinism contract: the classic formula's ``ln`` idf is replaced
    by the raw Robertson idf ratio (N-df+0.5)/(df+0.5) — log-free, so
    every quantity is an exact bigint until ONE double division per
    term (correctly rounded, bit-identical across engines), and the
    per-document total adds the fixed term columns left-to-right in
    both engines. With k1=6/5 and b=3/4 the per-term score folds to
    22*tf*T*(2N-2df+1) / ((2df+1)*(10*tf*T + 3*T + 9*dl*N)) with
    T = corpus token count, dl = doc length. (At 100 TB the bigint
    products need decimal/log headroom — the plan shape is what
    transfers, and a production scorer swaps in F.log idf.)

    Scale shape: per-term tf comes from JVM higher-order functions over
    ONE tokenization per row (no explode, no per-term corpus scan); the
    (N, T, df_1..df_k) statistics are a single 1-row aggregate that
    broadcasts back; ranking is TakeOrderedAndProject. Two narrow scans
    of the corpus, zero wide shuffles, nothing quadratic.

    Reference parity: the reference's OGR SQL surface has no text
    ranking at all (SURVEY §2.J); engine-side added value.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    tk = T.tokens(F.col("text"))

    def tf_col(i: int, term: str):
        return (
            F.size(F.filter(tk, lambda x: x == F.lit(term)))
            .cast("bigint")
            .alias(f"tf{i}")
        )

    base = docs.select(
        "doc_id",
        F.size(tk).cast("bigint").alias("dl"),
        *[tf_col(i, t) for i, t in enumerate(_BM25_TERMS)],
    )
    stats = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("t"),
        *[
            F.count(F.when(F.col(f"tf{i}") > 0, 1)).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    n, t = F.col("n"), F.col("t")

    def term_score(i: int):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        num = F.lit(22) * tf * t * (F.lit(2) * n - F.lit(2) * df + F.lit(1))
        den = (F.lit(2) * df + F.lit(1)) * (
            F.lit(10) * tf * t + F.lit(3) * t + F.lit(9) * F.col("dl") * n
        )
        return num.cast("double") / den.cast("double")

    score = term_score(0)
    for i in range(1, len(_BM25_TERMS)):
        score = score + term_score(i)
    return (
        base.crossJoin(F.broadcast(stats))
        .select("doc_id", "dl", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(15)
    )


@query(
    "text_vocab_coverage",
    oracle="""
    WITH w AS (
      SELECT w, count(*) AS c
      FROM (
        SELECT unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS w
        FROM documents
      )
      GROUP BY w
    ),
    tot AS (SELECT sum(c) AS t FROM w),
    r AS (
      SELECT c,
             row_number() OVER (ORDER BY c DESC, w) AS rn,
             sum(c) OVER (ORDER BY c DESC, w) AS cum
      FROM w
    ),
    p AS (SELECT unnest([50, 90, 99]) AS pct)
    SELECT p.pct,
           CAST(min(r.rn) AS BIGINT) AS vocab_size,
           CAST(min(r.cum) AS BIGINT) AS covered_tokens
    FROM p
    JOIN tot ON TRUE
    JOIN r ON r.cum >= (tot.t * p.pct + 99) // 100
    GROUP BY p.pct
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the smallest frequency-ranked
    vocabulary that covers 50/90/99% of the corpus token mass, and the
    exact token count covered at that cut — the Heaps/Zipf statistic a
    tokenizer-budget decision needs ("how big a vocab until OOV mass is
     1%?").

    Determinism contract: ranks are (freq DESC, word ASC), coverage
    targets are exact integer ceilings (t*pct + 99) // 100, and the
    reported values are pure min-selections — no FP anywhere.

    Scale shape: one explode+groupBy builds the word histogram (the only
    corpus-sized shuffle, map-side combined); the cumulative rank over
    the histogram is computed with functions.stats.ordered_cumsum —
    range-partitioned ranks plus broadcast per-partition offsets, NO
    unpartitioned window, so a 100 TB corpus's multi-hundred-million-row
    vocabulary still ranks in parallel. The threshold probe is a
    broadcast join of a 3-row relation against the ranked histogram.
    """
    from polars_gdal_spark.functions.stats import ordered_cumsum

    docs = load_tables(spark, sf_dir)["documents"]
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    hist = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    ranked = ordered_cumsum(hist, [F.col("c").desc(), F.col("w").asc()], "c")
    total = sum(
        r["s"] or 0
        for r in ranked.groupBy().agg(F.max("_cum").alias("s")).collect()
    )
    thresholds = spark.createDataFrame(
        [(p, (total * p + 99) // 100) for p in (50, 90, 99)],
        "pct int, needed bigint",
    )
    return (
        ranked.join(
            F.broadcast(thresholds), F.col("_cum") >= F.col("needed")
        )
        .groupBy("pct")
        .agg(
            F.min("_rn").alias("vocab_size"),
            F.min("_cum").alias("covered_tokens"),
        )
    )


@query(
    "text_quality_logit",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS nchars,
             CAST({_NTOK.format(c='text')} AS BIGINT) AS ntok,
             CAST({_PUNCT.format(c='text')} AS BIGINT) AS npunct,
             CAST({_STOPS.format(c='text')} AS BIGINT) AS nstop
      FROM documents
    )
    SELECT doc_id,
           CAST(40 * nstop * nchars - 25 * npunct * nchars
                + 2 * ntok * nchars - 60 * nchars AS BIGINT)
             AS logit_num,
           nchars AS logit_den,
           CAST(CASE WHEN 40 * nstop - 25 * npunct + 2 * ntok >= 60
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM feats
    """,
)
def text_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering, linear-scorer surrogate (the
    DCLM/FineWeb recipe trains a fasttext-style classifier and keeps
    docs above a score threshold; with no model runtime in scope, the
    engine-relevant part is the SCORING PASS): a fixed-weight linear
    logit over the quality features — stopword rate (+40), punctuation
    rate (−25), token count (+2) — against a threshold of 60.

    Determinism contract: the logit is carried as an exact integer
    rational (numerator, denominator=nchars) and the keep decision is a
    pure integer comparison — no sigmoid, no floats, bit-identical
    across engines. A real model swaps the weight vector in; the plan
    does not change.

    Scale shape: pure JVM expressions fused into the scan — one pass,
    zero shuffle, zero Python; exactly the shape a classifier-scored
    100 TB filter pass needs (the model inference itself would ride a
    Pandas UDF in the same projection).
    """
    docs = load_tables(spark, sf_dir)["documents"]
    c = F.col("text")
    nchars = F.length(c).cast("bigint")
    ntok = T.token_count(c)
    npunct = T.punct_count(c)
    nstop = T.stopword_count(c)
    logit_num = (
        F.lit(40) * nstop * nchars
        - F.lit(25) * npunct * nchars
        + F.lit(2) * ntok * nchars
        - F.lit(60) * nchars
    )
    keep = (
        F.lit(40) * nstop - F.lit(25) * npunct + F.lit(2) * ntok >= F.lit(60)
    )
    return docs.select(
        "doc_id",
        logit_num.cast("bigint").alias("logit_num"),
        nchars.alias("logit_den"),
        keep.cast("bigint").alias("keep"),
    )


@query(
    "multimodal_png_roundtrip",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             substr(repeat(text,
                           CAST(ceil(240.0 / length(text)) AS INT)),
                    1, 240) AS s
      FROM documents WHERE doc_id < 200
    ),
    ch AS (
      SELECT doc_id, ascii(substr(s, i, 1)) // 32 AS bin
      FROM px, (SELECT unnest(generate_series(1, 240)) AS i) g
    )
    SELECT doc_id AS doc, CAST(bin AS INT) AS bin, count(*) AS cnt
    FROM ch GROUP BY 1, 2
    """,
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-codec pipeline, end-to-end oracle-checked: each
    document's text bytes become an 8×10 RGB pixel buffer (repeat +
    truncate to 240 bytes — ASCII corpus, so bytes == codepoints),
    PNG-ENCODED into an opaque binary payload column, DECODED back
    through the public ``decode_image(codec='png')`` mapInPandas path
    (vendored pure-stdlib codec — functions/png.py), then reduced to a
    per-bin byte histogram of the DECODED pixels. The DuckDB oracle
    recomputes the histogram arithmetically from the text, so a
    cell-exact match proves the encode→decode round-trip is lossless on
    real compressed image bytes — the multimodal hot path (Arrow
    batches in, Arrow batches out, zero driver collect) exercised with
    a real codec, not the stub."""
    from collections.abc import Iterator

    import pandas as pd

    from polars_gdal_spark.functions.multimodal import decode_image
    from polars_gdal_spark.functions.png import encode_png

    t = load_tables(spark, sf_dir)
    pixels = (
        t["documents"]
        .where(F.col("doc_id") < 200)
        .select(
            F.col("doc_id").alias("doc"),
            F.expr(
                "substring(repeat(text, cast(ceil(240.0 / length(text)) "
                "as int)), 1, 240)"
            ).alias("s"),
        )
    )

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"],
                    "payload": [
                        encode_png(8, 10, s.encode("utf-8"))
                        for s in pdf["s"]
                    ],
                }
            )

    payloads = pixels.mapInPandas(enc, "doc bigint, payload binary")
    decoded = decode_image(payloads, id_col="doc", codec="png")

    def hist(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows: dict = {"doc": [], "bin": [], "cnt": []}
            for d, px in zip(pdf["doc_id"], pdf["pixels"]):
                arr = np.frombuffer(bytes(px), np.uint8)
                counts = np.bincount(arr // 32, minlength=8)
                for b in range(8):
                    if counts[b]:
                        rows["doc"].append(d)
                        rows["bin"].append(b)
                        rows["cnt"].append(int(counts[b]))
            yield pd.DataFrame(rows)

    return decoded.mapInPandas(hist, "doc bigint, bin int, cnt bigint")


@query(
    "text_rare_bigram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             tk[i] || ' ' || tk[i + 1] AS bigram
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i)
      WHERE len(tk) >= 2
    ),
    cnt AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram)
    SELECT bg.doc_id AS doc,
           count(*) AS n_bigrams,
           CAST(sum(CASE WHEN cnt.c <= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rare,
           CAST(sum(CASE WHEN cnt.c <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS rare_ratio
    FROM bg JOIN cnt USING (bigram)
    GROUP BY bg.doc_id
    """,
)
def text_rare_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model-free novelty scoring: the fraction of a document's
    word bigrams that are corpus-RARE (≤2 occurrences corpus-wide) — a
    cheap surrogate for 'this text is unlike the rest of the corpus'
    (high ratio → novel/noisy; near-zero → templated/boilerplate). Kept
    transcendental-free on purpose (counts + one exact-rounded division)
    so the value is bit-identical across engines — a log-prob LM score
    would drift in the last ulp between libm implementations.

    Scale shape (reworked in round 5 — the round-4 form re-evaluated an
    INTERPRETED ``F.transform`` bigram lambda for two consumers and
    joined the full positional stream back to the rare key set, which
    measured 27.5× wall at 3× data):

    * bigrams come from codegen-able ``arrays_zip(slice, slice)`` —
      no higher-order-function lambda anywhere (Catalyst interprets HOF
      lambdas; measured 3–24× slower elsewhere in this repo);
    * the positional stream is consumed ONCE, map-side combined to
      (bigram, doc, c_doc) — nothing is persisted and nothing is
      computed twice;
    * there is NO join back to the stream at all: a corpus-RARE bigram
      (count ≤ 2) touches at most TWO documents, so one more aggregate
      per bigram (sum, n_docs, min(doc), max(doc)) fully determines the
      per-doc rare contributions — explode ≤2 tiny structs per rare
      bigram and re-aggregate by doc. Skew-free by construction and
      join-free by construction;
    * per-doc totals stay a projection (size(tokens)−1), left-joined to
      the ≤|docs|-row rare counts on the uniform doc key."""
    t = load_tables(spark, sf_dir)
    toks = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
    )
    base = (
        t["documents"]
        .select(F.col("doc_id").alias("doc"), toks.alias("tk"))
        .where(F.size("tk") >= 2)
    )
    totals = base.select(
        "doc", (F.size("tk") - 1).cast("bigint").alias("n_bigrams")
    )
    bg = base.select(
        "doc",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("a"),
                F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("b"),
            )
        ).alias("z"),
    ).select("doc", F.concat_ws(" ", F.col("z.a"), F.col("z.b")).alias("bigram"))
    per_doc = bg.groupBy("bigram", "doc").agg(F.count("*").alias("c_doc"))
    per_bigram = per_doc.groupBy("bigram").agg(
        F.sum("c_doc").alias("c"),
        F.count("*").alias("nd"),
        F.min("doc").alias("d1"),
        F.max("doc").alias("d2"),
    )
    # c <= 2 leaves exactly two shapes: one doc holding c occurrences,
    # or two docs holding one each — reconstructible without a join.
    contribs = per_bigram.where(F.col("c") <= 2).select(
        F.explode(
            F.when(
                F.col("nd") == 1,
                F.array(F.struct(F.col("d1").alias("doc"),
                                 F.col("c").alias("k"))),
            ).otherwise(
                F.array(
                    F.struct(F.col("d1").alias("doc"),
                             F.lit(1).cast("bigint").alias("k")),
                    F.struct(F.col("d2").alias("doc"),
                             F.lit(1).cast("bigint").alias("k")),
                )
            )
        ).alias("z")
    ).select("z.doc", "z.k")
    rare_per_doc = contribs.groupBy("doc").agg(F.sum("k").alias("_nr"))
    return (
        totals.join(rare_per_doc, "doc", "left")
        .select(
            "doc",
            "n_bigrams",
            F.coalesce("_nr", F.lit(0)).cast("bigint").alias("n_rare"),
            (
                F.coalesce("_nr", F.lit(0)).cast("double")
                / F.col("n_bigrams")
            ).alias("rare_ratio"),
        )
    )


@query(
    "multimodal_wav_roundtrip",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             substr(repeat(text, CAST(ceil(200.0 / length(text)) AS INT)),
                    1, 200) AS s
      FROM documents WHERE doc_id < 200
    ),
    ch AS (
      SELECT doc_id, ascii(substr(s, i, 1)) - 128 AS amp
      FROM px, (SELECT unnest(generate_series(1, 200)) AS i) g
    )
    SELECT doc_id AS doc,
           count(*) AS n_samples,
           CAST(sum(amp * amp) AS BIGINT) AS energy
    FROM ch GROUP BY 1
    """,
)
def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-container pipeline, end-to-end oracle-checked — the
    audio twin of ``multimodal_png_roundtrip``: each document's text
    bytes become 200 8-bit PCM samples, WAV-encoded into an opaque
    binary payload (RIFF container via stdlib ``wave``), decoded back
    through the public ``decode_audio`` mapInPandas path, then reduced
    to per-doc signal energy Σ(s−128)² of the DECODED samples — all
    integer-exact, recomputed arithmetically by the DuckDB oracle, so a
    cell-exact match proves the container round-trip is lossless."""
    from collections.abc import Iterator

    import pandas as pd

    from polars_gdal_spark.functions.multimodal import (
        decode_audio,
        encode_wav,
    )

    t = load_tables(spark, sf_dir)
    pcm = (
        t["documents"]
        .where(F.col("doc_id") < 200)
        .select(
            F.col("doc_id").alias("doc"),
            F.expr(
                "substring(repeat(text, cast(ceil(200.0 / length(text)) "
                "as int)), 1, 200)"
            ).alias("s"),
        )
    )

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"],
                    "payload": [
                        encode_wav(s.encode("utf-8")) for s in pdf["s"]
                    ],
                }
            )

    payloads = pcm.mapInPandas(enc, "doc bigint, payload binary")
    decoded = decode_audio(payloads, id_col="doc")

    def energy(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows: dict = {"doc": [], "n_samples": [], "energy": []}
            for d, raw in zip(pdf["doc_id"], pdf["samples"]):
                arr = np.frombuffer(bytes(raw), np.uint8).astype(np.int64)
                rows["doc"].append(d)
                rows["n_samples"].append(len(arr))
                rows["energy"].append(int(((arr - 128) ** 2).sum()))
            yield pd.DataFrame(rows)

    return decoded.mapInPandas(
        energy, "doc bigint, n_samples bigint, energy bigint"
    )


@query(
    "multimodal_video_pipeline",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             substr(repeat(t, CAST(ceil(720.0 / length(t)) AS INT)),
                    1, 720) AS s
      FROM (SELECT doc_id,
                   regexp_replace(text, '[^' || chr(1) || '-' || chr(127) || ']', '?', 'g') AS t
            FROM documents WHERE doc_id < 150)
    ),
    fr AS (
      SELECT doc_id, f.k AS frame_no, substr(s, f.k * 240 + 1, 240) AS fs
      FROM px, (SELECT unnest([0, 2]) AS k) f
    ),
    ch AS (
      SELECT doc_id, frame_no, ascii(substr(fs, i, 1)) // 32 AS bin
      FROM fr, (SELECT unnest(generate_series(1, 240)) AS i) g
    )
    SELECT doc_id AS doc, CAST(frame_no AS INT) AS frame_no,
           CAST(bin AS INT) AS bin, count(*) AS cnt
    FROM ch GROUP BY 1, 2, 3
    """,
)
def multimodal_video_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video pipeline, end-to-end oracle-checked: each document's
    text becomes THREE 8×10 RGB frames, each PNG-encoded, wrapped into a
    real AVI (RIFF) container, then processed the way a training
    pipeline would — distributed demux keeping every 2nd frame
    (``decode_video_frames``), PNG decode of the sampled frames
    (``decode_image(codec='png')``), byte histogram of the DECODED
    pixels per (doc, frame). The DuckDB oracle recomputes the histogram
    arithmetically from the text, so a cell-exact match proves
    container + image codec lossless through the whole chain. Pure
    narrow MapInPandas stages until the final aggregation."""
    from collections.abc import Iterator

    import pandas as pd

    from polars_gdal_spark.functions.avi import encode_avi
    from polars_gdal_spark.functions.multimodal import (
        decode_image,
        decode_video_frames,
    )
    from polars_gdal_spark.functions.png import encode_png

    t = load_tables(spark, sf_dir)
    src = (
        t["documents"]
        .where(F.col("doc_id") < 150)
        # ASCII-sanitize first: the pixel slicing below is BYTE
        # arithmetic while the oracle's is per-character — identical
        # only when every char is one byte
        .select(
            "doc_id",
            F.regexp_replace(
                F.col("text"), r"[^\x01-\x7f]", "?"
            ).alias("t"),
        )
        .select(
            F.col("doc_id").alias("doc"),
            F.expr(
                "substring(repeat(t, cast(ceil(720.0 / length(t)) "
                "as int)), 1, 720)"
            ).alias("s"),
        )
    )

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for s in pdf["s"]:
                raw = s.encode("utf-8")
                frames = [
                    encode_png(8, 10, raw[k * 240 : (k + 1) * 240])
                    for k in range(3)
                ]
                payloads.append(encode_avi(frames, 8, 10))
            yield pd.DataFrame({"doc": pdf["doc"], "payload": payloads})

    videos = src.mapInPandas(enc, "doc bigint, payload binary")
    sampled = decode_video_frames(videos, id_col="doc", every_n=2)
    # composite id carries (doc, frame_no) through the image decoder
    composite = sampled.select(
        (F.col("doc_id") * 10 + F.col("frame_no")).alias("doc_id"),
        F.col("frame").alias("payload"),
    )
    decoded = decode_image(composite, codec="png")

    def hist(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows: dict = {"doc": [], "frame_no": [], "bin": [], "cnt": []}
            for cid, px in zip(pdf["doc_id"], pdf["pixels"]):
                arr = np.frombuffer(bytes(px), np.uint8)
                counts = np.bincount(arr // 32, minlength=8)
                for b in range(8):
                    if counts[b]:
                        rows["doc"].append(cid // 10)
                        rows["frame_no"].append(int(cid % 10))
                        rows["bin"].append(b)
                        rows["cnt"].append(int(counts[b]))
            yield pd.DataFrame(rows)

    return decoded.mapInPandas(
        hist, "doc bigint, frame_no int, bin int, cnt bigint"
    )


@query(
    "multimodal_image_phash_dedup",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             substr(repeat(text,
                           CAST(ceil(192.0 / length(text)) AS INT)),
                    1, 192) AS s
      FROM documents WHERE doc_id < 400
    ),
    g AS (
      SELECT doc_id, gi.i,
             (ascii(substr(s, 3*gi.i + 1, 1))
              + ascii(substr(s, 3*gi.i + 2, 1))
              + ascii(substr(s, 3*gi.i + 3, 1))) // 3 AS gray
      FROM px, (SELECT unnest(generate_series(0, 63)) AS i) gi
    ),
    tot AS (SELECT doc_id, sum(gray) AS total FROM g GROUP BY doc_id),
    bits AS (
      SELECT g.doc_id, g.i,
             CASE WHEN g.gray * 64 > t.total THEN 1 ELSE 0 END AS b
      FROM g JOIN tot t USING (doc_id)
    ),
    h AS (
      SELECT doc_id,
             sum(CASE WHEN i < 32 THEN b << i ELSE 0 END) AS hash_lo,
             sum(CASE WHEN i >= 32 THEN b << (i - 32) ELSE 0 END) AS hash_hi
      FROM bits GROUP BY doc_id
    )
    SELECT CAST(hash_hi AS BIGINT) AS hash_hi,
           CAST(hash_lo AS BIGINT) AS hash_lo,
           count(*) AS n_images,
           min(doc_id) AS rep_doc
    FROM h GROUP BY hash_hi, hash_lo
    """,
)
def multimodal_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection by perceptual hash, through the REAL
    codec path: each doc's text bytes become an 8×8 RGB buffer,
    PNG-encode → opaque binary payload → ``decode_image(codec='png')``
    → aHash (integer grayscale vs mean, packed into two BIGINTs) →
    groupBy hash = dedup clusters. The oracle replays the grayscale/
    bit arithmetic from the text directly, so a cell-exact match proves
    BOTH the encode→decode round-trip and the hash kernel. Everything
    is exact integers (bit_i uses gray·64 > Σgray, no float mean).

    Scale shape: encode, decode, and hash are three chained mapInPandas
    stages with NO exchange between them (one corpus scan); the only
    shuffle is the final hash groupBy — the same shape as text
    dedup_exact, applied to pixels. Planted corpus duplicates land in
    shared buckets (n_images > 1)."""
    from collections.abc import Iterator

    import pandas as pd

    from polars_gdal_spark.functions.multimodal import (
        decode_image,
        image_ahash,
    )
    from polars_gdal_spark.functions.png import encode_png

    t = load_tables(spark, sf_dir)
    pixels = (
        t["documents"]
        .where(F.col("doc_id") < 400)
        .select(
            "doc_id",
            F.expr(
                "substring(repeat(text, cast(ceil(192.0 / length(text)) "
                "as int)), 1, 192)"
            ).alias("s"),
        )
    )

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_png(8, 8, s.encode("utf-8"))
                        for s in pdf["s"]
                    ],
                }
            )

    payloads = pixels.mapInPandas(enc, "doc_id bigint, payload binary")
    decoded = decode_image(payloads, codec="png")
    hashed = image_ahash(decoded)
    return hashed.groupBy("hash_hi", "hash_lo").agg(
        F.count("*").alias("n_images"),
        F.min("doc_id").alias("rep_doc"),
    )


@query(
    "text_bpe_pair_counts",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    t2 AS (SELECT tok FROM tok WHERE length(tok) >= 2),
    pos AS (
      SELECT tok, unnest(generate_series(1, length(tok) - 1)) AS i
      FROM t2
    ),
    p AS (SELECT substr(tok, i, 2) AS pair FROM pos)
    SELECT pair, count(*) AS cnt
    FROM p GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 30
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE vocabulary induction (Sennrich et al.,
    ACL 2016): count adjacent character pairs inside tokens across the
    corpus and rank the top merge candidates — what a tokenizer-training
    pipeline runs over 100 TB before anything else.

    Scale shape: explode(split) → explode(sequence) → substring are all
    codegen'd generators (NO interpreted higher-order lambdas — the
    MinHash lesson: HOFs cost 3-24×); the pair count is a map-side-
    combined aggregate and the top-30 collapses to
    TakeOrderedAndProject. One scan, one shuffle of (pair, partial
    count) rows."""
    t = load_tables(spark, sf_dir)
    tok = (
        t["documents"]
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .where((F.col("tok") != "") & (F.length("tok") >= 2))
    )
    pairs = tok.select(
        "tok",
        F.explode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("i"),
    ).select(F.col("tok").substr(F.col("i"), F.lit(2)).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(30)
    )


@query(
    "text_pmi_collocations",
    oracle="""
    WITH tk AS (
      SELECT list_filter(string_split(lower(text), ' '),
                         x -> x <> '') AS tk
      FROM documents
    ),
    uni AS (SELECT unnest(tk) AS tok FROM tk),
    ua AS (SELECT tok, count(*) AS n FROM uni GROUP BY tok),
    tot AS (SELECT count(*) AS N FROM uni),
    pos AS (
      SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
      FROM tk WHERE len(tk) >= 2
    ),
    nb AS (
      SELECT tk[i] AS a, tk[i + 1] AS b, count(*) AS n_ab
      FROM pos GROUP BY a, b
    )
    SELECT nb.a, nb.b, nb.n_ab,
           CAST(nb.n_ab * tot.N AS DOUBLE)
             / CAST(x.n * y.n AS DOUBLE) AS pmi_score
    FROM nb JOIN ua x ON nb.a = x.tok
    JOIN ua y ON nb.b = y.tok, tot
    WHERE nb.n_ab >= 5
    ORDER BY pmi_score DESC, nb.a, nb.b LIMIT 30
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information — which word
    pairs co-occur far more than chance (the corpus-linguistics tool
    behind phrase vocabularies and tokenizer merges). Scored as the
    PMI RATIO n_ab·N / (n_a·n_b) rather than its log: the ranking is
    identical (log is monotone) and the value stays one exact-integer
    product per side and a single IEEE division — bit-identical across
    engines, no libm anywhere.

    Scale shape: unigram and bigram counts are map-side-combined
    aggregates over codegen'd explode chains (arrays_zip/slice, no
    interpreted HOF lambdas); marginals join back on the token key
    (AQE broadcasts the vocab side when it fits); the n_ab ≥ 5 support
    filter runs before the joins, and top-30 collapses to
    TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir)
    toks = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
    )
    base = t["documents"].select(toks.alias("tk"))
    uni = base.select(F.explode("tk").alias("tok"))
    ua = uni.groupBy("tok").agg(F.count("*").alias("n"))
    tot = uni.agg(F.count("*").alias("N"))
    bg = (
        base.where(F.size("tk") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("a"),
                    F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("b"),
                )
            ).alias("z")
        )
        .select(F.col("z.a").alias("a"), F.col("z.b").alias("b"))
    )
    nb = (
        bg.groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    scored = (
        nb.join(ua.select(F.col("tok").alias("a"), F.col("n").alias("n_a")), "a")
        .join(ua.select(F.col("tok").alias("b"), F.col("n").alias("n_b")), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n_ab",
            (
                (F.col("n_ab") * F.col("N")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("pmi_score"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_score"), F.asc("a"), F.asc("b")
    ).limit(30)


@query(
    "multimodal_audio_fingerprint_dedup",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             substr(repeat(text, CAST(ceil(200.0 / length(text)) AS INT)),
                    1, 200) AS s
      FROM documents WHERE doc_id < 400
    ),
    ch AS (
      SELECT doc_id, (g.i - 1) // 25 AS frame,
             ascii(substr(s, g.i, 1)) - 128 AS amp
      FROM px, (SELECT unnest(generate_series(1, 200)) AS i) g
    ),
    fe AS (
      SELECT doc_id, frame, sum(amp * amp) AS e
      FROM ch GROUP BY doc_id, frame
    ),
    tot AS (SELECT doc_id, sum(e) AS te FROM fe GROUP BY doc_id),
    fp AS (
      SELECT fe.doc_id,
             sum(CASE WHEN fe.e * 8 > t.te THEN 1 << fe.frame
                      ELSE 0 END) AS fingerprint
      FROM fe JOIN tot t USING (doc_id)
      GROUP BY fe.doc_id
    )
    SELECT CAST(fingerprint AS BIGINT) AS fingerprint,
           count(*) AS n_clips,
           min(doc_id) AS rep_doc
    FROM fp GROUP BY fingerprint
    """,
)
def multimodal_audio_fingerprint_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audio near-dup detection by energy fingerprint, through the REAL
    container path — the audio twin of the image perceptual hash: each
    doc's text bytes become 200 8-bit PCM samples, WAV-encode →
    ``decode_audio`` → 8 frames of 25 samples, bit_f = 1 iff frame
    energy·8 > total energy (exact-integer "above mean", the aHash
    trick applied to the time-energy envelope), bits pack into one
    BIGINT fingerprint, groupBy = dedup clusters. The oracle replays
    the frame-energy arithmetic from text, proving container round-trip
    AND fingerprint kernel cell-exactly.

    Scale shape: encode, decode, and fingerprint are chained
    mapInPandas stages with no exchange; the fingerprint groupBy is the
    only shuffle — dedup_exact's shape, applied to audio."""
    from collections.abc import Iterator

    import pandas as pd

    from polars_gdal_spark.functions.multimodal import (
        decode_audio,
        encode_wav,
    )

    t = load_tables(spark, sf_dir)
    pcm = (
        t["documents"]
        .where(F.col("doc_id") < 400)
        .select(
            F.col("doc_id").alias("doc"),
            F.expr(
                "substring(repeat(text, cast(ceil(200.0 / length(text)) "
                "as int)), 1, 200)"
            ).alias("s"),
        )
    )

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"],
                    "payload": [
                        encode_wav(s.encode("utf-8")) for s in pdf["s"]
                    ],
                }
            )

    payloads = pcm.mapInPandas(enc, "doc bigint, payload binary")
    decoded = decode_audio(payloads, id_col="doc")

    def fingerprint(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict = {"doc": [], "fingerprint": []}
            for d, raw in zip(pdf["doc_id"], pdf["samples"]):
                arr = (
                    np.frombuffer(bytes(raw), np.uint8).astype(np.int64)
                    - 128
                )
                e = (arr * arr).reshape(8, 25).sum(axis=1)
                bits = (e * 8 > e.sum()).astype(np.int64)
                out["doc"].append(d)
                out["fingerprint"].append(
                    int((bits << np.arange(8)).sum())
                )
            yield pd.DataFrame(out)

    fp = decoded.mapInPandas(fingerprint, "doc bigint, fingerprint bigint")
    return fp.groupBy("fingerprint").agg(
        F.count("*").alias("n_clips"),
        F.min("doc").alias("rep_doc"),
    )


@query(
    "text_phrase_search",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(list_filter(generate_series(1, greatest(len(tk) - 2, 0)),
               i -> tk[i] = 'big' AND tk[i+1] = 'order' AND tk[i+2] = 'scan'
             )) AS n_matches
      FROM toks
    )
    SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches
    FROM m WHERE n_matches > 0
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("big order scan") through a positional
    posting list — the inverted-index retrieval shape (search over the
    corpus is a first-class training-data-pipeline need: find every
    document containing a exact contamination string, a quoted source,
    a tracked boilerplate phrase).

    Scale shape (functions/text.py:phrase_match_counts): postings for
    non-query terms die in the scan stage, so the shuffle carries only
    the three query terms' posting lists; occurrences are counted by
    grouping postings on their normalized anchor position and requiring
    all k distinct terms per anchor — two map-side-combinable
    aggregates, no self-join, no regex scan, no Python. The DuckDB
    oracle slides a window over the token array instead — structurally
    different evaluation, same exact counts."""
    docs = load_tables(spark, sf_dir)["documents"]
    return T.phrase_match_counts(
        docs, "doc_id", "text", ["big", "order", "scan"]
    )


# ----------------------------------------------------------------------
# Iterative BPE merge training (Sennrich et al., ACL 2016) — the full
# trainer, not just the first pair count (text_bpe_pair_counts). Words
# are held as individually-wrapped token blocks '(h)(e)(l)(l)(o)' so a
# merge is ONE plain string replace of '(a)(b)' with '(ab)': matches can
# never share characters (each consumes both wrapped tokens), so every
# occurrence merges in one pass with textbook BPE semantics and
# engine-identical results — no regex lookarounds, no interpreted HOF
# folds, no overlap ambiguity between Spark's and DuckDB's replace.

_BPE_MERGE_ROUNDS = 6


def _bpe_cte(rounds: int = _BPE_MERGE_ROUNDS) -> str:
    """The shared WITH-chain: wf0 and per-round p/m/wf CTEs."""
    parts = [
        r"""
    WITH wf0 AS (
      SELECT regexp_replace(word, '(.)', '(\1)', 'g') AS w,
             CAST(count(*) AS BIGINT) AS f
      FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text),
                                                     '[^a-z]+'),
                      x -> x <> '')) AS word
        FROM documents
      )
      GROUP BY 1
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            rf""",
    p{r} AS (
      SELECT t[i.i] || ' ' || t[i.i + 1] AS pr, sum(f) AS n
      FROM (SELECT regexp_extract_all(w, '\(([a-z]+)\)', 1) AS t, f
            FROM wf{r - 1}) x,
           LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
      WHERE len(t) >= 2
      GROUP BY 1
    ),
    m{r} AS (SELECT pr, n FROM p{r} ORDER BY n DESC, pr LIMIT 1),
    wf{r} AS (
      SELECT replace(w, '(' || replace(m.pr, ' ', ')(') || ')',
                        '(' || replace(m.pr, ' ', '') || ')') AS w, f
      FROM wf{r - 1}, m{r} m
    )"""
        )
    return "".join(parts)


def _bpe_train_oracle(rounds: int = _BPE_MERGE_ROUNDS) -> str:
    sel = "\n    UNION ALL\n".join(
        f"""    SELECT {r} AS merge_round, pr AS pair,
           replace(pr, ' ', '') AS merged, CAST(n AS BIGINT) AS cnt
    FROM m{r}"""
        for r in range(1, rounds + 1)
    )
    return _bpe_cte(rounds) + "\n" + sel


@query("text_bpe_train_merges", oracle=_bpe_train_oracle())
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first 6 BPE merges over the corpus — the ITERATIVE
    tokenizer-training loop (each round's pair statistics depend on the
    previous round's merges), reported as the learned merge table
    (round, pair, merged token, corpus count).

    Scale shape: the corpus is scanned ONCE, collapsing to the
    (distinct word, frequency) table — the classic BPE trainer state,
    bounded by VOCABULARY (sub-linear in corpus size; Heaps' law), not
    rows. Each round is then: codegen `arrays_zip(slice, slice)` pair
    explode over the vocab (no interpreted HOF lambdas), one
    map-side-combined count, a 1-row TakeOrdered for the argmax pair
    (tie-break: count desc, pair asc), and one broadcast-1-row string
    replace to apply the merge. Lineage is cut with an eager
    localCheckpoint per round (graph_pagerank's iterative shape), so
    the plan never snowballs across rounds. At 100 TB the vocab table
    is a few million rows — every round is seconds regardless of corpus
    size."""
    ms = _bpe_merges(spark, sf_dir)
    out = None
    for r, m in enumerate(ms, 1):
        row = m.select(
            F.lit(r).cast("int").alias("merge_round"),
            F.col("pr").alias("pair"),
            F.replace(F.col("pr"), F.lit(" "), F.lit("")).alias("merged"),
            F.col("n").cast("bigint").alias("cnt"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def _bpe_pair_pattern(pr):
    """'(a)(b)' search string for a 'a b' pair column."""
    return F.concat(
        F.lit("("),
        F.replace(pr, F.lit(" "), F.lit(")(")),
        F.lit(")"),
    )


def _bpe_pair_replacement(pr):
    """'(ab)' replacement string for a 'a b' pair column."""
    return F.concat(
        F.lit("("),
        F.replace(pr, F.lit(" "), F.lit("")),
        F.lit(")"),
    )


def _bpe_merges(
    spark: SparkSession, sf_dir: str, rounds: int = _BPE_MERGE_ROUNDS
) -> list[DataFrame]:
    """Run the BPE training loop; return one checkpointed 1-row
    DataFrame (pr, n) per learned merge, in merge order. Shared by the
    trainer query (reports the merge table) and the encoder query
    (applies the merges corpus-wide)."""
    t = load_tables(spark, sf_dir)
    words = (
        t["documents"]
        .select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word")
        )
        .where(F.col("word") != "")
    )
    wf = (
        words.groupBy(
            F.regexp_replace("word", r"(.)", r"($1)").alias("w")
        )
        .agg(F.count("*").cast("bigint").alias("f"))
        .localCheckpoint(eager=True)
    )
    ms: list[DataFrame] = []
    for r in range(1, rounds + 1):
        base = wf.select(
            F.regexp_extract_all("w", F.lit(r"\(([a-z]+)\)"), 1).alias(
                "t"
            ),
            "f",
        ).where(F.size("t") >= 2)
        pairs = base.select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, F.size("t") - 1).alias("a"),
                    F.slice("t", 2, F.size("t") - 1).alias("b"),
                )
            ).alias("z"),
            "f",
        ).select(F.concat_ws(" ", "z.a", "z.b").alias("pr"), "f")
        m = (
            pairs.groupBy("pr")
            .agg(F.sum("f").alias("n"))
            .orderBy(F.desc("n"), F.asc("pr"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        ms.append(m)
        if r < rounds:
            wf = (
                wf.crossJoin(F.broadcast(m))
                .select(
                    F.replace(
                        F.col("w"),
                        _bpe_pair_pattern(F.col("pr")),
                        _bpe_pair_replacement(F.col("pr")),
                    ).alias("w"),
                    "f",
                )
                .localCheckpoint(eager=True)
            )
    return ms


def _bpe_encode_oracle(rounds: int = _BPE_MERGE_ROUNDS) -> str:
    parts = [_bpe_cte(rounds)]
    parts.append(
        r""",
    d0 AS (
      SELECT doc_id,
             regexp_replace(lower(text), '([a-z])', '(\1)', 'g') AS w,
             CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                  AS BIGINT) AS n_chars
      FROM documents
    )"""
    )
    for r in range(1, rounds + 1):
        # LEFT JOIN ON TRUE, not a cross join: if the vocabulary
        # exhausts mergeable pairs before round r, m{r} is empty and a
        # cross join would annihilate the corpus — documents must pass
        # through unchanged instead
        parts.append(
            f""",
    d{r} AS (
      SELECT doc_id,
             CASE WHEN m.pr IS NULL THEN w
                  ELSE replace(w, '(' || replace(m.pr, ' ', ')(') || ')',
                                  '(' || replace(m.pr, ' ', '') || ')')
             END AS w,
             n_chars
      FROM d{r - 1} LEFT JOIN m{r} m ON TRUE
    )"""
        )
    parts.append(
        rf"""
    SELECT doc_id, n_chars,
           CAST(len(regexp_extract_all(w, '\(([a-z]+)\)', 1)) AS BIGINT)
             AS n_bpe_tokens
    FROM d{rounds}"""
    )
    return "".join(parts)


@query("text_bpe_encode", oracle=_bpe_encode_oracle())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the learned BPE merges corpus-wide — the encode half of the
    tokenizer story (``text_bpe_train_merges`` is the train half): every
    document's letter runs are segmented with the 6 merges learned from
    this same corpus, and the per-document BPE token count is reported
    next to the raw letter count (the compression the vocabulary buys).

    Scale shape: training cost is vocab-bounded (see the trainer); the
    encode pass is 6 sequential plain string replaces over the wrapped
    form — each merge arrives as a broadcast 1-row join (never a
    collect), the replaces are codegen string ops (no regex in the
    per-document hot path beyond the initial wrap), and the whole
    encode is embarrassingly parallel per document. At 100 TB this is
    the shape of the production tokenizer-apply job: broadcast the
    merge table, map the corpus once."""
    docs = load_tables(spark, sf_dir)["documents"]
    ms = _bpe_merges(spark, sf_dir)
    enc = docs.select(
        "doc_id",
        F.regexp_replace(F.lower("text"), r"([a-z])", r"($1)").alias("w"),
        F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))
        .cast("bigint")
        .alias("n_chars"),
    )
    for r, m in enumerate(ms, 1):
        mr = m.select(F.col("pr").alias(f"_pr{r}"))
        # left join on TRUE (not crossJoin): an exhausted-vocabulary
        # round has an EMPTY merge row, which must pass documents
        # through unchanged rather than annihilate the corpus
        enc = (
            enc.join(F.broadcast(mr), F.lit(True), "left")
            .withColumn(
                "w",
                F.when(F.col(f"_pr{r}").isNull(), F.col("w")).otherwise(
                    F.replace(
                        F.col("w"),
                        _bpe_pair_pattern(F.col(f"_pr{r}")),
                        _bpe_pair_replacement(F.col(f"_pr{r}")),
                    )
                ),
            )
            .drop(f"_pr{r}")
        )
    return enc.select(
        "doc_id",
        "n_chars",
        F.size(F.regexp_extract_all("w", F.lit(r"\(([a-z]+)\)"), 1))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )


@query(
    "multimodal_scene_cuts",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             substr(repeat(t, CAST(ceil(720.0 / length(t)) AS INT)),
                    1, 720) AS s
      FROM (SELECT doc_id,
                   regexp_replace(text, '[^' || chr(1) || '-' || chr(127) || ']', '?', 'g') AS t
            FROM documents WHERE doc_id < 150)
    ),
    fr AS (
      SELECT doc_id, f.k AS frame_no, substr(s, f.k * 240 + 1, 240) AS fs
      FROM px, (SELECT unnest([0, 1, 2]) AS k) f
    ),
    ch AS (
      SELECT doc_id, frame_no,
             CASE WHEN frame_no = 2
                  THEN ((ascii(substr(fs, i, 1)) + 64) % 256) // 32
                  ELSE ascii(substr(fs, i, 1)) // 32 END AS bin
      FROM fr, (SELECT unnest(generate_series(1, 240)) AS i) g
    ),
    hist AS (
      SELECT f.doc_id, f.frame_no, b.bin,
             CAST(count(ch.bin) AS BIGINT) AS cnt
      FROM (SELECT DISTINCT doc_id, frame_no FROM fr) f
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bin) b
      LEFT JOIN ch ON ch.doc_id = f.doc_id AND ch.frame_no = f.frame_no
                  AND ch.bin = b.bin
      GROUP BY 1, 2, 3
    )
    SELECT a.doc_id AS doc, CAST(a.frame_no AS INT) AS frame_no,
           CAST(sum(abs(a.cnt - p.cnt)) AS BIGINT) AS l1_delta,
           (sum(abs(a.cnt - p.cnt)) >= 80) AS is_cut
    FROM hist a
    JOIN hist p ON p.doc_id = a.doc_id AND p.bin = a.bin
               AND p.frame_no = a.frame_no - 1
    GROUP BY 1, 2
    """,
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change (shot-cut) detection through the REAL media stack:
    every document becomes a 3-frame AVI (same deterministic
    text-to-pixels fixture as ``multimodal_video_pipeline``), the video
    is demuxed and PNG-decoded distributedly, and consecutive frames
    are compared by the L1 distance of their 8-bin luminance
    histograms — the classic hard-cut detector video curation
    pipelines run before frame sampling (sampling across a cut wastes
    the clip). The DuckDB oracle recomputes the histogram deltas
    arithmetically from the generating text, so a cell-exact match
    proves container + codec + histogram + delta end to end.

    Scale shape: demux/decode/histogram are narrow fused MapInPandas
    stages (one pass over the payload bytes, all-8-bins fixed-width
    output per frame); the only shuffle is the (doc, bin)-keyed
    consecutive-frame join, whose input is 8 rows per frame — the
    detector costs O(frames), never O(pixels), after the single decode
    pass."""
    from collections.abc import Iterator

    import pandas as pd

    from polars_gdal_spark.functions.avi import encode_avi
    from polars_gdal_spark.functions.multimodal import (
        decode_image,
        decode_video_frames,
    )
    from polars_gdal_spark.functions.png import encode_png

    t = load_tables(spark, sf_dir)
    src = (
        t["documents"]
        .where(F.col("doc_id") < 150)
        # ASCII-sanitize first: the pixel slicing below is BYTE
        # arithmetic while the oracle's is per-character — identical
        # only when every char is one byte
        .select(
            "doc_id",
            F.regexp_replace(
                F.col("text"), r"[^\x01-\x7f]", "?"
            ).alias("t"),
        )
        .select(
            F.col("doc_id").alias("doc"),
            F.expr(
                "substring(repeat(t, cast(ceil(720.0 / length(t)) "
                "as int)), 1, 720)"
            ).alias("s"),
        )
    )

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for s in pdf["s"]:
                raw = s.encode("utf-8")
                slices = [raw[k * 240 : (k + 1) * 240] for k in range(3)]
                # frame 2 is a planted scene change: every byte shifted
                # +64 (mod 256) — a genuinely different histogram
                slices[2] = bytes((b + 64) % 256 for b in slices[2])
                frames = [encode_png(8, 10, sl) for sl in slices]
                payloads.append(encode_avi(frames, 8, 10))
            yield pd.DataFrame({"doc": pdf["doc"], "payload": payloads})

    videos = src.mapInPandas(enc, "doc bigint, payload binary")
    sampled = decode_video_frames(videos, id_col="doc", every_n=1)
    composite = sampled.select(
        (F.col("doc_id") * 10 + F.col("frame_no")).alias("doc_id"),
        F.col("frame").alias("payload"),
    )
    decoded = decode_image(composite, codec="png")

    def hist(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows: dict = {"doc": [], "frame_no": [], "bin": [], "cnt": []}
            for cid, px in zip(pdf["doc_id"], pdf["pixels"]):
                arr = np.frombuffer(bytes(px), np.uint8)
                counts = np.bincount(arr // 32, minlength=8)
                for b in range(8):
                    rows["doc"].append(cid // 10)
                    rows["frame_no"].append(cid % 10)
                    rows["bin"].append(b)
                    rows["cnt"].append(int(counts[b]))
            yield pd.DataFrame(rows)

    h = decoded.mapInPandas(
        hist, "doc bigint, frame_no int, bin int, cnt bigint"
    )
    prev = h.select(
        F.col("doc").alias("p_doc"),
        (F.col("frame_no") + 1).alias("p_next"),
        F.col("bin").alias("p_bin"),
        F.col("cnt").alias("p_cnt"),
    )
    return (
        h.join(
            prev,
            (F.col("doc") == F.col("p_doc"))
            & (F.col("frame_no") == F.col("p_next"))
            & (F.col("bin") == F.col("p_bin")),
        )
        .groupBy("doc", "frame_no")
        .agg(
            F.sum(F.abs(F.col("cnt") - F.col("p_cnt")))
            .cast("bigint")
            .alias("l1_delta")
        )
        .select(
            "doc",
            F.col("frame_no").cast("int").alias("frame_no"),
            "l1_delta",
            (F.col("l1_delta") >= 80).alias("is_cut"),
        )
    )


@query(
    "text_bigram_lm_score",
    oracle="""
    WITH tkt AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
      FROM documents
    ),
    idx AS (
      SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
      FROM tkt WHERE len(tk) >= 2
    ),
    big AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM idx),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
    c2t AS (
      SELECT w1, w2, c2, sum(c2) OVER (PARTITION BY w1) AS c1 FROM c2
    ),
    v AS (
      SELECT count(DISTINCT x) AS v
      FROM (SELECT unnest(tk) AS x FROM tkt)
    ),
    terms AS (
      SELECT b.doc_id,
             CAST(round(ln((c2 + 1) / CAST(c1 + v AS DOUBLE)), 9)
                  AS DECIMAL(20,9)) AS term
      FROM big b JOIN c2t USING (w1, w2), v
    ),
    per AS (
      SELECT doc_id, count(*) AS n_bigrams, sum(term) AS s
      FROM terms GROUP BY 1
    )
    SELECT doc_id, n_bigrams,
           round(-CAST(s AS DOUBLE) / n_bigrams, 6) AS ce
    FROM per ORDER BY ce DESC, doc_id LIMIT 100
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM cross-entropy quality scoring — the CCNet/fastText-era
    perplexity filter (Wenzek et al. 2020 score documents against an LM
    and drop the worst): train add-1-smoothed bigram statistics on the
    corpus itself, score every document's mean negative log-likelihood,
    return the 100 worst (highest cross-entropy) documents.

    Engine-determinism: each bigram term is ln((c2+1)/(c1+V)) — one
    exact double division and one ln, rounded to 9 dp and summed as
    DECIMAL so the per-doc total is order-independent; the final ce is
    a single double division rounded to 6 dp. Both engines execute the
    identical op sequence, so values hash-match.

    Scale shape (round 8): the corpus-sized bigram OCCURRENCE stream is
    tokenized and shuffled exactly ONCE — into the per-document
    bigram-TYPE relation (doc_id, w1, w2, cnt). Everything downstream
    rides that persisted relation: the global count table c2 is its
    re-aggregation (map-side combinable, type-level input), c1 attaches
    via a window over the (small) bigram-TYPE table — sum(c2) partition
    by w1 — and the scoring join hits pdc, not the occurrence stream
    (per-occurrence term sums fold exactly to cnt·term: the term is an
    exact DECIMAL, integer multiples are exact). The previous shape
    tokenized the corpus twice and shuffled the occurrence stream twice
    (once for c2, once for the join) — measured as the dominant term of
    the 31.8 s sf10 wall. The vocabulary size is the one driver scalar
    (a documented 1-row collect, like the IVF centroid count)."""
    from pyspark import StorageLevel

    from polars_gdal_spark.functions import spread_scan

    docs = spread_scan(
        load_tables(spark, sf_dir)["documents"], "doc_id"
    )
    tk = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
    )
    dt = docs.select("doc_id", tk.alias("tk"))
    # Single-token docs ride the SAME explode as a (token, NULL)
    # sentinel row (round 11): they contribute no bigram, but their
    # token belongs to the VOCABULARY, and carrying it here lets the
    # vocab count below read the persisted bigram-type relation instead
    # of re-tokenizing the corpus a second time (the old shape's
    # separate explode+distinct over the full 24M-token occurrence
    # stream — measured 2.7–4.7 s of the 11.4 s sf10 wall). Sentinels
    # are invisible to scoring: c2 filters them out (so c1 marginals
    # are untouched) and the inner terms join on (w1, w2) can never
    # match a NULL w2, so per-doc sums see exactly the rows they always
    # did.
    big = dt.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(tk) >= 2 THEN "
                "transform(sequence(1, size(tk) - 1), "
                "i -> struct(element_at(tk, i) AS w1, "
                "element_at(tk, i + 1) AS w2)) "
                "WHEN size(tk) = 1 THEN "
                "array(struct(element_at(tk, 1) AS w1, "
                "CAST(NULL AS STRING) AS w2)) "
                "ELSE array() END"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    pdc = (
        big.groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # global bigram-type counts, persisted: it feeds BOTH the vocab
    # count and the c1-marginal window, and it is vocabulary²-bounded
    # (small) where pdc is corpus-sized
    c2 = (
        pdc.where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("c2"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    from pyspark.sql import Window

    c2t = c2.withColumn(
        "c1", F.sum("c2").over(Window.partitionBy("w1"))
    )
    # vocabulary = every token that appears anywhere: tokens of docs
    # with >= 2 tokens all occur as some bigram's w1 or w2; tokens of
    # 1-token docs are exactly the NULL-w2 sentinels. This action also
    # materializes pdc and c2, which the final job reuses.
    vocab = int(
        c2.select("w1")
        .unionAll(c2.select(F.col("w2").alias("w1")))
        .unionAll(pdc.where(F.col("w2").isNull()).select("w1"))
        .agg(F.count_distinct("w1"))
        .first()[0]
    )
    terms = pdc.join(c2t, ["w1", "w2"]).select(
        "doc_id",
        "cnt",
        (
            # cnt as DECIMAL(10,0): a bigint operand would push the
            # product past DECIMAL(38) and Spark silently drops the
            # scale to 6 — cnt is bounded by a doc's token count, so
            # 10 digits keeps precision 31 and the 9-dp scale exact
            F.col("cnt").cast("decimal(10,0)")
            * F.expr(
                f"CAST(round(ln((c2 + 1) / CAST(c1 + {vocab} AS DOUBLE)), "
                "9) AS DECIMAL(20,9))"
            )
        ).alias("term"),
    )
    per = terms.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"), F.sum("term").alias("s")
    )
    out = (
        per.select(
            "doc_id",
            "n_bigrams",
            F.round(
                -F.col("s").cast("double") / F.col("n_bigrams"), 6
            ).alias("ce"),
        )
        .orderBy(F.desc("ce"), F.asc("doc_id"))
        .limit(100)
    )
    from polars_gdal_spark.functions import attach_unpersist

    return attach_unpersist(out, pdc, c2)


@query(
    "text_gopher_rules",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS ntok,
             length(text) AS ch,
             len(list_filter(string_split(lower(text), ' '),
                 x -> x <> '' AND regexp_matches(x, '[a-z]'))) AS alpha_tok,
             (length(text) - length(replace(text, '#', '')))
               + (length(text) - length(replace(text, '...', ''))) // 3
               AS sym,
             len(list_filter(string_split(lower(text), ' '),
                 x -> list_contains(
                   ['the','a','of','and','to','in','is','it'], x)))
               AS stops
      FROM documents
    )
    SELECT doc_id, ntok,
           ntok BETWEEN 25 AND 80 AS r_words,
           (ch - (ntok - 1)) / ntok >= 3
             AND (ch - (ntok - 1)) / ntok <= 4.5 AS r_word_len,
           alpha_tok / ntok >= 0.8 AS r_alpha,
           sym / ntok <= 0.1 AS r_symbol,
           stops >= 2 AS r_stopwords,
           (ntok BETWEEN 25 AND 80)
             AND (ch - (ntok - 1)) / ntok >= 3
             AND (ch - (ntok - 1)) / ntok <= 4.5
             AND alpha_tok / ntok >= 0.8
             AND sym / ntok <= 0.1
             AND stops >= 2 AS keep
    FROM f
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style hard quality rules (Rae et al. 2021, Appendix A —
    the rule-based pre-filter every modern crawl pipeline runs before
    any learned scorer): token-count window, mean-word-length window,
    minimum alphabetic-token fraction, maximum symbol(#/ellipsis)-to-
    word ratio, minimum stopword hits. Thresholds are adapted to the
    fixture corpus (token window 25-80, mean-word-length window
    3-4.5) so each rule splits it non-trivially; the rule SET and the
    expression shapes are Gopher's. Output: one row per document with
    each rule verdict and the conjunction ``keep``.

    Engine determinism: every ratio is an int/int IEEE double division
    compared against an exactly representable threshold; rule verdicts
    are booleans computed identically in both engines. One scan, zero
    shuffles — the filter fuses into the parquet scan at any scale."""
    t = load_tables(spark, sf_dir)
    c = F.col("text")
    ntok = T.token_count(c)
    lower_toks = T.tokens(F.lower(c))
    alpha = F.size(
        F.filter(lower_toks, lambda x: x.rlike("[a-z]"))
    ).cast("bigint")
    sym = (
        F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
        + F.floor(
            (
                F.length(c)
                - F.length(F.replace(c, F.lit("..."), F.lit("")))
            )
            / 3
        )
    ).cast("bigint")
    mwl = (F.length(c).cast("bigint") - (ntok - 1)) / ntok
    # Gopher counts stopword hits case-insensitively (the alpha-token
    # rule above already lowers); the oracle mirrors with lower(text).
    stops = T.stopword_count(F.lower(c))
    r_words = (ntok >= 25) & (ntok <= 80)
    r_word_len = (mwl >= 3) & (mwl <= 4.5)
    r_alpha = alpha / ntok >= 0.8
    r_symbol = sym / ntok <= 0.1
    r_stopwords = stops >= 2
    return t["documents"].select(
        "doc_id",
        ntok.alias("ntok"),
        r_words.alias("r_words"),
        r_word_len.alias("r_word_len"),
        r_alpha.alias("r_alpha"),
        r_symbol.alias("r_symbol"),
        r_stopwords.alias("r_stopwords"),
        (r_words & r_word_len & r_alpha & r_symbol & r_stopwords).alias(
            "keep"
        ),
    )


@query(
    "text_repetition_rules",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk,
             length(text) AS ch
      FROM documents
    ),
    g2 AS (
      SELECT doc_id, ch, tk[i] || ' ' || tk[i+1] AS g
      FROM toks, unnest(generate_series(1, len(tk) - 1)) AS t(i)
      WHERE len(tk) >= 2
    ),
    c2 AS (
      SELECT doc_id, g, any_value(ch) AS ch, count(*) AS c
      FROM g2 GROUP BY 1, 2
    ),
    a2 AS (
      SELECT doc_id,
             max(c * length(g)) / any_value(ch) AS top2f,
             sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END)
               / any_value(ch) AS dup2f
      FROM c2 GROUP BY 1
    ),
    g3 AS (
      SELECT doc_id, ch, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g
      FROM toks, unnest(generate_series(1, len(tk) - 2)) AS t(i)
      WHERE len(tk) >= 3
    ),
    c3 AS (
      SELECT doc_id, g, any_value(ch) AS ch, count(*) AS c
      FROM g3 GROUP BY 1, 2
    ),
    a3 AS (
      SELECT doc_id, max(c * length(g)) / any_value(ch) AS top3f
      FROM c3 GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(a2.top2f, 0.0) AS top2f,
           COALESCE(a2.dup2f, 0.0) AS dup2f,
           COALESCE(a3.top3f, 0.0) AS top3f,
           COALESCE(a2.top2f, 0.0) <= 0.10 AS r_top2,
           COALESCE(a2.dup2f, 0.0) <= 0.15 AS r_dup2,
           COALESCE(a3.top3f, 0.0) <= 0.12 AS r_top3,
           COALESCE(a2.top2f, 0.0) <= 0.10
             AND COALESCE(a2.dup2f, 0.0) <= 0.15
             AND COALESCE(a3.top3f, 0.0) <= 0.12 AS keep
    FROM documents d
    LEFT JOIN a2 ON a2.doc_id = d.doc_id
    LEFT JOIN a3 ON a3.doc_id = d.doc_id
    """,
)
def text_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style REPETITION rules (Rae et al. 2021, Table A1 lower
    half — the within-document repetition half of the quality table
    that ``text_gopher_rules``' hard thresholds leave uncovered):
    fraction of characters covered by the most frequent word 2-gram
    (``top2f``) and 3-gram (``top3f``), and by all duplicated 2-grams
    (``dup2f``); a document is kept only under all three caps. The
    fixture corpus has no newlines, so the paper's duplicate-LINE
    family is degenerate here and the n-gram family is the operative
    one; thresholds (0.10/0.15/0.12) are adapted to split the fixture
    non-trivially, like text_gopher_rules' windows — the RULE SET and
    the char-fraction definitions are Gopher's. Overlapping n-gram
    occurrences count their characters once per occurrence
    (freq x length(gram) / length(doc)), mirrored exactly in the
    oracle.

    Scale shape: per-document n-gram counting is two map-side-
    combinable aggregations per n (groupBy(doc, gram) count, then a
    per-doc max/sum) plus two doc-keyed joins — everything linear,
    partial-aggregated, and partitioned by doc or (doc, gram); no
    global state, no windows, no arrays shipped between stages. The
    n-gram rows are built with the zip-slice construction (bulk
    slices + arrays_zip + one concat_ws per row after the explode, all
    whole-stage codegen) rather than a per-position interpreted
    lambda, the same 8x-measured pattern minhash_signatures uses.

    All fractions are int/int IEEE divisions compared against shared
    literals, so verdicts are engine-identical."""
    from polars_gdal_spark.functions.dedup import _shingle_rows_with_dups

    docs = load_tables(spark, sf_dir)["documents"]
    base = docs.select(
        "doc_id", F.length("text").cast("bigint").alias("ch"), "text"
    )

    def grams(n: int) -> DataFrame:
        # the shared zip-slice construction (one codegen concat_ws per
        # row after the explode — see functions.dedup), carrying the
        # per-doc char count through for the fraction denominators
        return _shingle_rows_with_dups(
            base,
            "doc_id",
            "text",
            n,
            extra_cols=("ch",),
            id_alias="doc_id",
            out_col="g",
        )

    chars = F.col("c") * F.length("g")
    c2 = grams(2).groupBy("doc_id", "g").agg(
        F.first("ch").alias("ch"), F.count("*").alias("c")
    )
    a2 = c2.groupBy("doc_id").agg(
        (F.max(chars) / F.first("ch")).alias("top2f"),
        (
            F.sum(F.when(F.col("c") >= 2, chars).otherwise(F.lit(0)))
            / F.first("ch")
        ).alias("dup2f"),
    )
    c3 = grams(3).groupBy("doc_id", "g").agg(
        F.first("ch").alias("ch"), F.count("*").alias("c")
    )
    a3 = c3.groupBy("doc_id").agg(
        (F.max(chars) / F.first("ch")).alias("top3f")
    )
    top2f = F.coalesce("top2f", F.lit(0.0))
    dup2f = F.coalesce("dup2f", F.lit(0.0))
    top3f = F.coalesce("top3f", F.lit(0.0))
    r_top2 = top2f <= 0.10
    r_dup2 = dup2f <= 0.15
    r_top3 = top3f <= 0.12
    return (
        docs.select("doc_id")
        .join(a2, "doc_id", "left")
        .join(a3, "doc_id", "left")
        .select(
            "doc_id",
            top2f.alias("top2f"),
            dup2f.alias("dup2f"),
            top3f.alias("top3f"),
            r_top2.alias("r_top2"),
            r_dup2.alias("r_dup2"),
            r_top3.alias("r_top3"),
            (r_top2 & r_dup2 & r_top3).alias("keep"),
        )
    )
