"""UDTF surface (SURVEY §2.L): PII span extraction via LATERAL join,
reconciled against the JVM-regex scrub counts and plain-Python re."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from polars_gdal_spark.functions.text import PII_PATTERNS, pii_scrub
from polars_gdal_spark.functions.udtf_ops import register_udtfs

ROWS = [
    (1, "mail a@b.com and c.d@e.org end"),
    (2, "server 10.0.0.1 then +1 234-555-8765 call"),
    (3, "clean text, nothing to find here"),
    (4, ""),
    (5, None),
]


def test_pii_spans_lateral(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    df.createOrReplaceTempView("udtf_docs")
    spans = spark.sql(
        "SELECT d.doc_id, s.kind, s.match, s.start, s.end "
        "FROM udtf_docs d, LATERAL pii_spans(d.text) s"
    ).collect()

    expected = []
    for doc_id, text in ROWS:
        for kind, pat in PII_PATTERNS.items():
            for m in re.finditer(pat, text or ""):
                expected.append((doc_id, kind, m.group(0), m.start(), m.end()))
    assert sorted(tuple(r) for r in spans) == sorted(expected)
    # spans slice back to their matches
    by_doc = dict(ROWS)
    for doc_id, _kind, match, start, end in spans:
        assert by_doc[doc_id][start:end] == match


def test_pii_spans_counts_reconcile_with_scrub(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    df.createOrReplaceTempView("udtf_docs2")
    span_counts = {
        (r["kind"],): r["n"]
        for r in spark.sql(
            "SELECT s.kind, count(*) AS n "
            "FROM udtf_docs2 d, LATERAL pii_spans(d.text) s GROUP BY s.kind"
        ).collect()
    }
    scrub = pii_scrub(df, "text")
    for kind in PII_PATTERNS:
        jvm_total = scrub.agg(F.sum(f"n_{kind}")).first()[0] or 0
        assert span_counts.get((kind,), 0) == jvm_total
