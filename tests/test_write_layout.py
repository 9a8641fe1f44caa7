"""Write-side data layout for scan pruning: repartitionByRange + sorted
parquet gives each file/row-group a narrow min-max envelope, so a
time-range filter prunes most of the data at the footer level — the
write-time half of predicate pushdown at 100 TB."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from polars_gdal_spark.queries import load_tables
from tests.conftest import SF_SMOKE


def _ts_envelopes(path_glob: str) -> list[tuple]:
    """(min, max) of the ts column per parquet row group across files."""
    spans = []
    for p in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(p).metadata
        idx = md.schema.names.index("ts")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
    return spans


def test_range_partitioned_write_has_disjoint_envelopes(spark, tmp_path):
    # epoch-micros column: Spark's default INT96 timestamp encoding
    # carries no parquet min/max stats, int64 does
    events = load_tables(spark, SF_SMOKE)["events"].withColumn(
        "ts", F.unix_micros("ts")
    )
    out = str(tmp_path / "clustered")
    (
        events.repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    spans = _ts_envelopes(out + "/*.parquet")
    assert len(spans) >= 4
    spans.sort()
    # clustered layout → row-group envelopes do not overlap
    for (a_min, a_max), (b_min, b_max) in zip(spans, spans[1:]):
        assert a_max <= b_min
    # control: the unclustered original has every row group spanning
    # (almost) the full time range — nothing for zone maps to skip
    out2 = str(tmp_path / "unclustered")
    events.repartition(4).write.mode("overwrite").parquet(out2)
    full_lo = min(s[0] for s in spans)
    full_hi = max(s[1] for s in spans)
    whole = full_hi - full_lo
    wide = [
        (mx - mn) / whole for mn, mx in _ts_envelopes(out2 + "/*.parquet")
    ]
    assert all(w > 0.9 for w in wide)

    # and the filtered read over the clustered layout is still correct
    lo = events.agg(F.min("ts")).collect()[0][0]
    day_us = 86_400_000_000
    read = spark.read.parquet(out).where(F.col("ts") < lo + day_us)
    assert read.count() == events.where(F.col("ts") < lo + day_us).count()
