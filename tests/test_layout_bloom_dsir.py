"""Value-level tests for the round-5 scale-extension operators:
Z-order layout keys, explicit Bloom-filter join prefilters, DSIR
importance scores, and hard-negative mining."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F


def test_morton_key_known_values(spark):
    from polars_gdal_spark.functions.layout import morton_key

    df = spark.createDataFrame(
        [(0, 0), (3, 5), (1, 0), (0, 1), (65535, 65535)], "a long, b long"
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", morton_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    # interleave(a even bits, b odd bits): 3=0b11->0b0101, 5=0b101->
    # 0b010001<<1=0b100010 -> 0b100111 = 39
    assert got == {
        (0, 0): 0,
        (3, 5): 39,
        (1, 0): 1,
        (0, 1): 2,
        (65535, 65535): 4294967295,
    }


def test_morton_sql_matches_spark(spark):
    """The oracle-side expression generator must agree bit-for-bit with
    the Spark column over a coordinate sweep."""
    from polars_gdal_spark.functions.layout import morton_key, morton_sql

    pts = [(a * 977 % 65536, a * 613 % 65536) for a in range(200)]
    df = spark.createDataFrame(pts, "a long, b long")
    spark_vals = [
        r["z"]
        for r in df.select(morton_key(F.col("a"), F.col("b")).alias("z"))
        .orderBy("z")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pts)
    sql_vals = [
        r[0]
        for r in con.execute(
            f"SELECT {morton_sql('a', 'b')} AS z FROM t ORDER BY z"
        ).fetchall()
    ]
    assert spark_vals == sql_vals


def test_morton_locality_beats_single_sort(spark):
    """The point of Z-order: per-bucket envelopes stay compact in BOTH
    dimensions, where a single-column sort scatters the other one.
    Measured as the mean max-min suppkey spread per equal-size bucket."""
    from polars_gdal_spark.functions.layout import morton_key

    rows = [(i % 256, (i * 7919) % 256) for i in range(4096)]
    df = spark.createDataFrame(rows, "p long, s long")
    z = df.select(
        "p", "s", morton_key(F.col("p"), F.col("s")).alias("z")
    )
    zspread = (
        z.groupBy((F.col("z") / 4096).cast("long").alias("bk"))
        .agg((F.max("s") - F.min("s")).alias("spread"))
        .agg(F.avg("spread"))
        .first()[0]
    )
    pspread = (
        df.groupBy((F.col("p") / 16).cast("long").alias("bk"))
        .agg((F.max("s") - F.min("s")).alias("spread"))
        .agg(F.avg("spread"))
        .first()[0]
    )
    assert zspread < pspread / 2, (zspread, pspread)


def test_bloom_no_false_negatives_and_bounded_fpp(spark):
    from polars_gdal_spark.functions.bloom import (
        bloom_bitmap,
        bloom_might_contain,
    )

    keys = spark.range(0, 500).select((F.col("id") * 3).alias("k"))
    bitmap = bloom_bitmap(keys, "k", m_bits=8192, n_hashes=3)
    probe = spark.range(0, 3000).select(F.col("id").alias("k"))
    hit = probe.where(bloom_might_contain("k", bitmap, 3, key_type="bigint"))
    got = {r["k"] for r in hit.collect()}
    members = {i * 3 for i in range(500)}
    assert members <= got  # Bloom never drops a member
    fp = len(got - members)
    # 8192 bits / 500 keys ~ 16 bits/key, k=3 -> fpp ~ 1.5%; allow 5%
    assert fp <= 0.05 * 2500, fp


def test_bloom_semi_join_is_exact(spark):
    from polars_gdal_spark.functions.bloom import bloom_prefiltered_semi_join

    fact = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("fk"), F.col("id").alias("v")
    )
    dim = spark.range(0, 100).select((F.col("id") * 5).alias("dk"))
    got = bloom_prefiltered_semi_join(fact, dim, "fk", "dk")
    exact = fact.join(
        dim.withColumnRenamed("dk", "fk"), "fk", "left_semi"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_bloom_empty_dim(spark):
    from polars_gdal_spark.functions.bloom import bloom_prefiltered_semi_join

    fact = spark.range(0, 100).select(F.col("id").alias("fk"))
    dim = spark.range(0, 0).select(F.col("id").alias("dk"))
    assert bloom_prefiltered_semi_join(fact, dim, "fk", "dk").count() == 0


def test_dsir_prefers_target_like_docs(spark):
    """Documents made of target-vocabulary tokens must outscore
    documents of off-target tokens (the likelihood-ratio direction)."""
    from polars_gdal_spark.functions.sampling import dsir_scores

    tgt_text = "alpha beta gamma delta epsilon"
    off_text = "zeta eta theta iota kappa"
    rows = []
    for i in range(40):
        # ids 0..9: the trusted target slice (is_tgt below), target text
        # ids 10..24: source docs that LOOK like the target
        # ids 25..39: source docs that don't
        rows.append(
            (i, tgt_text if (i < 25) else off_text)
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scored = dsir_scores(docs, (F.col("doc_id") < 10))
    s = {r["doc_id"]: r["dsir_score"] for r in scored.collect()}
    assert all(s[i] > s[30] for i in range(10, 25)), s


def test_hard_negatives_excludes_same_label(spark):
    from polars_gdal_spark.functions.similarity import hard_negatives

    rows = [
        (i, [float((i % 3) == d) for d in range(4)], i % 3)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negatives(
        df.where("vec_id >= 3"), df.where("vec_id < 3"), k=5
    ).collect()
    labels = {r[0]: r[2] for r in rows}
    assert len(out) == 15
    for r in out:
        assert labels[r["qid"]] != labels[r["vec_id"]]


def test_hard_negatives_empty_queries(spark):
    from polars_gdal_spark.functions.similarity import hard_negatives

    df = spark.createDataFrame(
        [(0, [1.0, 0.0], 1)], "vec_id long, embedding array<float>, label int"
    )
    assert hard_negatives(df, df.where("vec_id < 0"), k=3).count() == 0


def test_image_ahash_identical_images_collide(spark):
    """Byte-identical pixel buffers must hash equal; a buffer with a
    different bright/dark structure must hash different. Exercises the
    real PNG encode->decode->hash chain."""
    from collections.abc import Iterator

    import pandas as pd

    from polars_gdal_spark.functions.multimodal import (
        decode_image,
        image_ahash,
    )
    from polars_gdal_spark.functions.png import encode_png

    a = bytes(range(64)) * 3  # gradient
    b = bytes([0] * 96 + [255] * 96)  # half dark / half bright
    rows = [(0, a), (1, a), (2, b)]

    df = spark.createDataFrame(rows, "doc_id long, raw binary")

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_png(8, 8, bytes(r)) for r in pdf["raw"]
                    ],
                }
            )

    payloads = df.mapInPandas(enc, "doc_id long, payload binary")
    hashed = {
        r["doc_id"]: (r["hash_hi"], r["hash_lo"])
        for r in image_ahash(decode_image(payloads, codec="png")).collect()
    }
    assert hashed[0] == hashed[1]
    assert hashed[0] != hashed[2]
    # half-bright image: exactly the 32 bright pixels are above mean
    hi, lo = hashed[2]
    assert bin(hi).count("1") + bin(lo).count("1") == 32


def test_bloom_mixed_integral_widths(spark):
    """xxhash64 is type-sensitive: an INT-typed probe against a
    BIGINT-built bitmap must still keep every true member (both sides
    hash through a common BIGINT cast). Regression for the silent
    drop-everything failure mode."""
    from polars_gdal_spark.functions.bloom import bloom_prefiltered_semi_join

    fact = spark.range(0, 2000).select(
        (F.col("id") % 300).cast("int").alias("fk")
    )
    dim = spark.range(0, 50).select((F.col("id") * 4).alias("dk"))  # bigint
    got = bloom_prefiltered_semi_join(fact, dim, "fk", "dk")
    exact = fact.join(
        dim.selectExpr("CAST(dk AS INT) AS fk"), "fk", "left_semi"
    )
    assert got.count() == exact.count() > 0


def test_bloom_cross_family_keys_rejected(spark):
    import pytest

    from polars_gdal_spark.functions.bloom import bloom_prefiltered_semi_join

    fact = spark.range(0, 10).selectExpr("CAST(id AS STRING) AS fk")
    dim = spark.range(0, 10).select(F.col("id").alias("dk"))
    with pytest.raises(ValueError, match="same.*type family"):
        bloom_prefiltered_semi_join(fact, dim, "fk", "dk")


def test_bloom_missing_key_column_named(spark):
    """A misspelled key must raise a dedicated column-not-found error
    naming the available columns, not the misleading 'type family
    (None)' mismatch (round-6 ADVICE)."""
    import pytest

    from polars_gdal_spark.functions.bloom import bloom_prefiltered_semi_join

    fact = spark.range(0, 10).select(F.col("id").alias("fk"))
    dim = spark.range(0, 10).select(F.col("id").alias("dk"))
    with pytest.raises(ValueError, match="'fkey' not found.*fk"):
        bloom_prefiltered_semi_join(fact, dim, "fkey", "dk")
    with pytest.raises(ValueError, match="'dkey' not found.*dk"):
        bloom_prefiltered_semi_join(fact, dim, "fk", "dkey")


def test_image_ahash_refuses_oversize_images(spark):
    """>64 pixels cannot pack into two BIGINTs; the %32 shifts would
    wrap and distinct images silently collide — must fail loudly."""
    from collections.abc import Iterator

    import pandas as pd
    import pytest

    from polars_gdal_spark.functions.multimodal import (
        decode_image,
        image_ahash,
    )
    from polars_gdal_spark.functions.png import encode_png

    raw = bytes(range(243))  # 9x9x3

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [encode_png(9, 9, raw) for _ in pdf["doc_id"]],
                }
            )

    df = spark.createDataFrame([(0,)], "doc_id long")
    payloads = df.mapInPandas(enc, "doc_id long, payload binary")
    with pytest.raises(Exception, match="64"):
        image_ahash(decode_image(payloads, codec="png")).collect()
