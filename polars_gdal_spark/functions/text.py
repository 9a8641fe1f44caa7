"""Text-analysis operators for LLM training-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions`` — no
Python UDFs in the hot path — so the expressions stay inside whole-stage
codegen and scale linearly with input splits on a 100 TB corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Tiny per-language stopword marker sets for the n-gram/stopword language
# heuristic. Deliberately small: language ID at corpus scale is a scoring
# pass over a scan, not a model inference.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "nicht"),
    "fr": ("le", "la", "les", "des", "est"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col) -> Column:
    """Whitespace tokenization with empty-token removal."""
    return F.filter(F.split(col, " "), lambda x: x != F.lit(""))


def token_count(col) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_token_count(col) -> Column:
    """BPE-ish token estimate: word-piece regex splitting words from
    digits/punctuation, ~the granularity a byte-pair tokenizer sees."""
    arr = F.filter(
        F.split(F.regexp_replace(col, r"([0-9]+|[^\w\s])", r" $1 "), r"\s+"),
        lambda x: x != F.lit(""),
    )
    return F.size(arr).cast("bigint")


def punct_count(col) -> Column:
    """Number of punctuation characters."""
    return (
        F.length(col) - F.length(F.regexp_replace(col, r"[.,;:!?'\"()\[\]-]", ""))
    ).cast("bigint")


#: Fixed bucket alphabet for character-distribution features. Any
#: character outside it lands in one "other" bucket, so the counts are
#: total and exact for arbitrary input.
CHAR_ALPHABET = "abcdefghijklmnopqrstuvwxyz "


def char_bucket_counts(col) -> list[Column]:
    """Per-character counts over :data:`CHAR_ALPHABET` as pure JVM
    expressions — ``length(s) - length(replace(s, ch))`` per bucket.
    No explode, no shuffle: the whole character histogram stays inside
    whole-stage codegen, unlike the explode→groupBy shape that turns a
    100 TB corpus into one shuffled row per character."""
    return [
        (F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit(""))))
        .cast("bigint")
        for ch in CHAR_ALPHABET
    ]


def char_diversity(col) -> dict[str, Column]:
    """Character-distribution quality features, all exact integers until
    the final division (engine-reproducible, no transcendentals):

    - ``distinct_chars``: buckets with a non-zero count (incl. other)
    - ``char_simpson``: Simpson concentration sum(c_i^2)/n^2 — the
      collision probability of two random character draws. High values
      flag gibberish/repetition (aaaaa... → 1.0); the rational twin of
      character entropy, chosen because log() is not bit-reproducible
      across engines."""
    n = F.length(col).cast("bigint")
    counts = char_bucket_counts(col)
    other = n - sum(counts)
    all_counts = counts + [other]
    distinct = sum(
        F.when(c > 0, F.lit(1)).otherwise(F.lit(0)) for c in all_counts
    ).cast("bigint")
    simpson_num = sum(c * c for c in all_counts).cast("bigint")
    return {
        "chars_n": n,
        "distinct_chars": distinct,
        "char_simpson": simpson_num / (n * n),
    }


def stopword_count(col) -> Column:
    """Count of tokens that are common English stopwords."""
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(
        F.filter(tokens(col), lambda x: F.array_contains(stop, x))
    ).cast("bigint")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-signal columns: counts are exact integers so every
    derived ratio is a deterministic double (int/int division)."""
    c = F.col(text_col)
    return (
        df.withColumn("n_chars_q", F.length(c).cast("bigint"))
        .withColumn("n_tokens", token_count(c))
        .withColumn("n_punct", punct_count(c))
        .withColumn("n_stopwords", stopword_count(c))
        .withColumn(
            "avg_token_len",
            (F.col("n_chars_q") - (F.col("n_tokens") - 1))
            / F.col("n_tokens"),
        )
        .withColumn("punct_ratio", F.col("n_punct") / F.col("n_chars_q"))
        .withColumn("stopword_ratio", F.col("n_stopwords") / F.col("n_tokens"))
    )


def lang_marker_hits(col, lang: str) -> Column:
    """How many marker tokens of ``lang`` appear in the text."""
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(markers, x)))


def lang_guess(col) -> Column:
    """Stopword-scoring language ID: argmax over marker-hit counts with a
    deterministic alphabetical-priority tiebreak, 'und' when nothing
    matches. Expressed as a CASE cascade so the DuckDB oracle can mirror
    it exactly."""
    langs = sorted(LANG_MARKERS)  # de, en, es, fr
    hits = {lg: lang_marker_hits(col, lg) for lg in langs}
    expr = F.lit("und")
    # Build the cascade back-to-front: each lang wins if it beats all
    # languages after it in alphabetical order (earlier langs already won).
    for i in range(len(langs) - 1, -1, -1):
        lg = langs[i]
        cond = hits[lg] > 0
        for later in langs[i + 1 :]:
            cond = cond & (hits[lg] >= hits[later])
        expr = F.when(cond, F.lit(lg)).otherwise(expr)
    return expr


def fingerprint(col, k: int = 8) -> Column:
    """Document fingerprint: md5 over the first ``k`` normalized tokens —
    a prefix fingerprint that catches boilerplate-headed near-dups."""
    prefix = F.slice(tokens(F.lower(col)), 1, k)
    return F.md5(F.array_join(prefix, " "))


def tfidf_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf/df ratio.

    Classic TF-IDF ranking with engine-reproducible arithmetic: tf and
    df are exact integer counts and the score is a single IEEE-exact
    division (no log smoothing — the ranking is identical and the value
    hashes bit-equal across engines). Ties break on the term string.

    Scale shape: one shuffle builds per-(doc, term) counts; document
    frequency reuses that table grouped by term (map-side combined —
    the wire carries one long per distinct (partition, term)); the
    per-doc top-k is a rank-limited window, so WindowGroupLimit
    pre-truncates to k rows per partition before the final shuffle.
    The df table joins back on the near-uniform term key; no broadcast
    is assumed (web-scale vocabularies don't fit one executor). A
    per-term count WINDOW would avoid the join but put every row of a
    Zipf-head term into one task — the join shape lets AQE split skewed
    keys. The tf relation is persisted (round 8): it feeds both the df
    aggregation and the join probe, and Spark does NOT reuse the
    exchange across those subtrees (verified in the executed plan) —
    without the persist the corpus is tokenized and counted twice
    (20.5 → 17.3 s at sf10). The input scan is spread to full task
    width first (``spread_scan`` — A/B-won at this site at BOTH
    scales: 4.26 → 2.70 s sf1, 6.9 → 4.8 s sf10; the tokenize→
    explode→count stage is the rare one whose per-byte CPU dominates
    the balancing exchange). The returned DataFrame exposes
    ``unpersist_sources()``.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from polars_gdal_spark.functions import spread_scan

    toks = spread_scan(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = (
        toks.groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc").orderBy(
        (F.col("tf") / F.col("df")).desc(), F.col("term")
    )
    out = (
        tf.join(dfreq, "term")
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(
            "doc",
            "term",
            "tf",
            "df",
            (F.col("tf") / F.col("df")).alias("score"),
        )
    )
    from polars_gdal_spark.functions import attach_unpersist

    return attach_unpersist(out, tf)


PII_PATTERNS = {
    # Character-class-only regexes: identical semantics under Java
    # regex (Spark) and RE2 (DuckDB) — no lookaround, no backrefs.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9][0-9 -]{7,}[0-9]",
}


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4 addresses / international-format phone
    numbers, adding per-kind match counts — the pre-training scrub pass.

    Pure JVM expressions (``regexp_count`` + chained ``regexp_replace``),
    so the scrub fuses into the scan with zero shuffle and no Python in
    the hot path. Counts are taken on the ORIGINAL text; replacements
    apply in a fixed order (email → ipv4 → phone) with distinct
    placeholders so downstream token statistics stay stable.
    """
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    scrubbed = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return out.withColumn(f"{text_col}_scrubbed", scrubbed)


def phrase_match_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase: list[str],
) -> DataFrame:
    """Exact phrase search through a positional posting list — the
    inverted-index retrieval shape, not a regex scan over every byte.

    ``posexplode`` emits (doc, position, term) postings; the immediate
    ``isin(phrase)`` filter drops every non-query term IN THE SCAN STAGE,
    so only the phrase terms' postings survive into the shuffle — on a
    100 TB corpus that is the difference between shuffling the corpus
    and shuffling three terms' posting lists. Each surviving posting is
    normalized to its would-be ANCHOR position (``pos - offset_in_
    phrase``); a true occurrence exists exactly where one anchor group
    contains ALL k distinct phrase terms (terms are required distinct —
    asserted — so per-anchor distinct-term count == k is a complete and
    sound test). Two map-side-combinable aggregates, no self-join, no
    per-row Python.

    Returns one row per matching document: (id_col, n_matches).
    """
    if len(set(phrase)) != len(phrase):
        raise ValueError("phrase terms must be distinct for anchor counting")
    toks = tokens(F.lower(F.col(text_col)))
    postings = df.select(
        F.col(id_col), F.posexplode(toks).alias("_pos", "_term")
    ).where(F.col("_term").isin(*phrase))
    offset = F.create_map(
        *[x for i, t in enumerate(phrase) for x in (F.lit(t), F.lit(i))]
    )
    anchors = postings.select(
        id_col, (F.col("_pos") - offset[F.col("_term")]).alias("_anchor"),
        "_term",
    )
    hits = (
        anchors.groupBy(id_col, "_anchor")
        .agg(F.count_distinct("_term").alias("_k"))
        .where(F.col("_k") == len(phrase))
    )
    return hits.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_matches")
    )
