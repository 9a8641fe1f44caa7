"""Deterministic sampling operators for training-data mixing.

A 100 TB training pipeline needs reproducible subsampling: fixed-rate
corpus thinning, and per-domain/language quota mixing ("data recipes").
Spark's ``df.sample`` is seed-stable only per partitioning, so these are
built on content hashes instead — the sample is a pure function of the
row, independent of partitioning, executor count, or input split order,
and exactly reproducible by any other engine (the DuckDB oracles run the
same expressions).

Scale shapes:

- ``hash_sample`` is a WHERE clause — fully partition-parallel, zero
  shuffle, pushed into the scan like any other predicate.
- ``stratified_sample_exact`` is one window (hash-rank per stratum) —
  a single shuffle on the stratum key. A stratum's rows land on one
  task (the usual window skew caveat); for web-scale strata use
  ``hash_sample`` per stratum-rate instead (the two compose: exact
  quotas for curated mixes, rate-based for bulk thinning).
"""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _rank_hex(key_col, seed: str):
    """md5 of seed:key — a uniform, engine-reproducible rank in hex."""
    return F.md5(F.concat(F.lit(f"{seed}:"), key_col.cast("string")))


def hash_sample_threshold(fraction: float | str) -> str:
    """16-hex-char threshold at exactly ``fraction`` of the 64-bit hash
    prefix space, derived with integer arithmetic: ``fraction`` is read
    as its DECIMAL string (0.2 means exactly 1/5, not the nearest binary
    float), so the threshold is ``floor(num * 16^16 / den)`` with no FP
    rounding anywhere. Both the engine filter and the DuckDB oracle
    literal come from this one function — any other engine reproduces
    the sample bit-exactly from the same decimal."""
    frac = Fraction(str(fraction))
    if not 0 <= frac <= 1:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(frac.numerator * 16**16 // frac.denominator, "016x")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "s"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose md5 rank falls in
    the first ``fraction`` of hash space (lexicographic compare on the
    hex digest — md5 is uniform, so the kept share converges to
    ``fraction``). Pure filter: no shuffle, partition-parallel,
    reproducible under any repartitioning. The threshold is exact
    integer arithmetic on the decimal reading of ``fraction`` (see
    :func:`hash_sample_threshold`)."""
    if not 0.0 <= float(fraction) <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if float(fraction) == 1.0:
        return df  # threshold would need 17 hex chars; keep-all is exact
    thr = hash_sample_threshold(fraction)
    return df.where(F.substring(_rank_hex(F.col(key_col), seed), 1, 16) < thr)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float | str = 0.05,
    test_fraction: float | str = 0.05,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash: the
    first ``val_fraction`` of md5 hash space is ``val``, the next
    ``test_fraction`` is ``test``, the rest ``train``. Same contract as
    :func:`hash_sample`: a pure projection (zero shuffle, partition-
    parallel), reproducible by any engine from the same decimals, and
    stable under re-runs — a document can never migrate between splits
    when the corpus grows, which is the property that keeps eval sets
    uncontaminated across training refreshes."""
    fv = Fraction(str(val_fraction))
    ft = Fraction(str(test_fraction))
    if not (0 <= fv and 0 <= ft and fv + ft <= 1):
        raise ValueError(
            f"fractions must be >= 0 and sum <= 1, got {val_fraction}, "
            f"{test_fraction}"
        )
    thr_val = hash_sample_threshold(str(fv))
    thr_vt = hash_sample_threshold(str(fv + ft))
    rank = F.substring(_rank_hex(F.col(key_col), seed), 1, 16)
    return df.withColumn(
        out_col,
        F.when(rank < F.lit(thr_val), F.lit("val"))
        .when(rank < F.lit(thr_vt), F.lit("test"))
        .otherwise(F.lit("train")),
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    quota: int,
    seed: str = "s",
) -> DataFrame:
    """Exactly ``quota`` rows per stratum (all rows when the stratum is
    smaller), chosen by md5 rank — deterministic and engine-reproducible.
    One shuffle on the stratum key; the per-stratum top-``quota`` is
    rank-limited so Spark applies WindowGroupLimit (per-partition
    pre-truncation to ``quota`` rows before the shuffle)."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    w = Window.partitionBy(strata_col).orderBy(
        _rank_hex(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )


def dsir_scores(
    docs: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.,
    NeurIPS 2023): score every document by how much more likely its
    hashed-unigram features are under the TARGET distribution (rows
    matching ``target_pred`` — the trusted high-quality subset) than
    under the raw SOURCE corpus. High scores = "looks like the data I
    want more of"; resampling by score steers a 100 TB crawl toward the
    target domain without a trained classifier.

    Integer-exact formulation so Spark and the SQL oracle agree bit-for-
    bit: tokens hash to ``n_buckets`` buckets via md5-prefix arithmetic
    (cross-engine identical), per-bucket counts get +1 smoothing, and
    log-probabilities quantize to bit_length (``length(bin(c))`` on both
    engines) — score = Σ_tok [bitlen(tgt_b+1) − bitlen(src_b+1)]
    + n_tok·[bitlen(S+1) − bitlen(T+1)] (the normalizer term, also
    exact). No transcendentals anywhere.

    Scale shape: one explode + two map-side-combinable aggregates build
    the (n_buckets)-row stats table, which broadcast-joins back to the
    token stream; totals ride a broadcast 1-row crossJoin. Nothing ever
    collects to the driver."""
    tok = (
        docs.select(
            F.col(id_col),
            target_pred.alias("_is_tgt"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_tok"),
        )
        .where(F.col("_tok") != "")
        .select(
            id_col,
            "_is_tgt",
            (
                F.conv(F.substring(F.md5("_tok"), 1, 6), 16, 10).cast("long")
                % n_buckets
            ).alias("_b"),
        )
    )
    stats = tok.groupBy("_b").agg(
        F.count("*").alias("_sc"),
        F.sum(F.when(F.col("_is_tgt"), 1).otherwise(0)).alias("_tc"),
    )
    totals = tok.agg(
        F.count("*").alias("_S"),
        F.sum(F.when(F.col("_is_tgt"), 1).otherwise(0)).alias("_T"),
    )

    def _bitlen(c):
        return F.length(F.bin(c))

    return (
        tok.join(F.broadcast(stats), "_b")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            (
                F.sum(
                    _bitlen(F.col("_tc") + 1) - _bitlen(F.col("_sc") + 1)
                )
                + F.count("*")
                * F.first(
                    _bitlen(F.col("_S") + 1) - _bitlen(F.col("_T") + 1)
                )
            )
            .cast("bigint")
            .alias("dsir_score")
        )
    )
