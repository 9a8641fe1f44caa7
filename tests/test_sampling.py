"""Deterministic sampling operator tests: reproducibility under
repartitioning, exact quotas, rate convergence, and plan shape (pure
filter for hash_sample; WindowGroupLimit for the stratified path)."""

from __future__ import annotations

import pytest

from polars_gdal_spark.functions.sampling import (
    hash_sample,
    stratified_sample_exact,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"src{i % 4}") for i in range(2000)]
    return spark.createDataFrame(rows, "id bigint, src string")


def test_hash_sample_rate_and_determinism(spark, corpus):
    kept = hash_sample(corpus, "id", 0.25, seed="t")
    n = kept.count()
    assert 0.20 * 2000 < n < 0.30 * 2000  # md5 uniformity at n=2000
    # pure function of the row: same ids under any partitioning
    ids = {r["id"] for r in kept.collect()}
    ids_repart = {
        r["id"] for r in hash_sample(corpus.repartition(13), "id", 0.25, seed="t").collect()
    }
    assert ids == ids_repart
    # monotone: a smaller fraction is a subset of a larger one
    smaller = {r["id"] for r in hash_sample(corpus, "id", 0.1, seed="t").collect()}
    assert smaller < ids


def test_hash_sample_edge_fractions(spark, corpus):
    assert hash_sample(corpus, "id", 0.0).count() == 0
    assert hash_sample(corpus, "id", 1.0).count() == 2000
    with pytest.raises(ValueError):
        hash_sample(corpus, "id", 1.5)


def test_hash_sample_is_scan_filter(spark, corpus):
    plan = (
        hash_sample(corpus, "id", 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # zero shuffle: a WHERE, nothing else


def test_stratified_exact_quota(spark, corpus):
    out = stratified_sample_exact(corpus, "src", "id", 100, seed="q")
    sizes = {r["src"]: r["n"] for r in out.groupBy("src").count().withColumnRenamed("count", "n").collect()}
    assert sizes == {f"src{i}": 100 for i in range(4)}
    # deterministic: same selection twice
    a = sorted(r["id"] for r in out.collect())
    b = sorted(
        r["id"]
        for r in stratified_sample_exact(
            corpus.repartition(7), "src", "id", 100, seed="q"
        ).collect()
    )
    assert a == b


def test_stratified_small_stratum_kept_whole(spark):
    df = spark.range(3).selectExpr("id", "'only' AS src")
    assert stratified_sample_exact(df, "src", "id", 10).count() == 3


def test_stratified_plan_group_limit(spark, corpus):
    plan = (
        stratified_sample_exact(corpus, "src", "id", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_train_val_test_split_partition_and_stability(spark, corpus):
    from polars_gdal_spark.functions.sampling import train_val_test_split

    out = train_val_test_split(corpus, "id", 0.1, 0.1, seed="tvt")
    counts = {
        r["split"]: r["count"]
        for r in out.groupBy("split").count().collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000          # total partition
    assert 0.06 * 2000 < counts["val"] < 0.14 * 2000
    assert 0.06 * 2000 < counts["test"] < 0.14 * 2000
    # growing the corpus never migrates an existing row's split
    bigger = spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(4000)], "id bigint, src string"
    )
    small_map = {r["id"]: r["split"] for r in out.collect()}
    big_map = {
        r["id"]: r["split"]
        for r in train_val_test_split(bigger, "id", 0.1, 0.1, seed="tvt").collect()
    }
    assert all(big_map[i] == s for i, s in small_map.items())


def test_train_val_test_split_validation(spark, corpus):
    from polars_gdal_spark.functions.sampling import train_val_test_split

    with pytest.raises(ValueError):
        train_val_test_split(corpus, "id", 0.6, 0.6)
