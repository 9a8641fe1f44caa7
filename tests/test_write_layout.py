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


def test_hilbert_xy_matches_flatgeobuf_scalar(spark):
    """The numpy-vectorized Hilbert must equal the FlatGeobuf writer's
    scalar _hilbert_d cell for cell."""
    import random

    import pandas as pd

    from polars_gdal_spark.functions.geo import _impl_hilbert_xy
    from polars_gdal_spark.sources.formats.flatgeobuf import _hilbert_d

    rng = random.Random(3)
    xs = [rng.randrange(0, 1 << 16) for _ in range(500)] + [0, 65535]
    ys = [rng.randrange(0, 1 << 16) for _ in range(500)] + [65535, 0]
    got = _impl_hilbert_xy(pd.Series(xs), pd.Series(ys)).tolist()
    assert got == [_hilbert_d(x, y, 16) for x, y in zip(xs, ys)]


def _xy_envelopes(path_glob: str) -> list[tuple]:
    """(cx_min, cx_max, cy_min, cy_max) per parquet row group."""
    spans = []
    for p in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(p).metadata
        ix = md.schema.names.index("cx")
        iy = md.schema.names.index("cy")
        for rg in range(md.num_row_groups):
            sx = md.row_group(rg).column(ix).statistics
            sy = md.row_group(rg).column(iy).statistics
            spans.append((sx.min, sx.max, sy.min, sy.max))
    return spans


def test_spatial_cluster_prunes_bbox_reads(spark, tmp_path):
    """Hilbert-clustered geometry writes: each row group covers a small
    spatial neighborhood, so a bbox filter's envelope intersects few row
    groups — the 2-D zone map. Control: the same data written in input
    order has every row group spanning ~the full extent."""
    import random

    from polars_gdal_spark.functions.geo import spatial_cluster
    from polars_gdal_spark.geometry import geojson_to_geom, geom_to_wkb

    rng = random.Random(11)
    rows = [
        (i, bytearray(geom_to_wkb(geojson_to_geom({
            "type": "Point",
            "coordinates": [rng.uniform(0, 100), rng.uniform(0, 100)],
        }))))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id bigint, geometry binary")

    clustered = spatial_cluster(df, "geometry", n_partitions=16)
    out = str(tmp_path / "clustered")
    clustered.write.mode("overwrite").parquet(out)
    spans = _xy_envelopes(out + "/*.parquet")
    assert len(spans) >= 16

    # control: same cx/cy columns, arbitrary (hash) order
    from polars_gdal_spark.functions import geo as G

    ctl = (
        df.withColumn("cx", G.st_x(F.col("geometry")))
        .withColumn("cy", G.st_y(F.col("geometry")))
        .repartition(16, "id")
    )
    out2 = str(tmp_path / "control")
    ctl.write.mode("overwrite").parquet(out2)
    spans_ctl = _xy_envelopes(out2 + "/*.parquet")

    def hits(spans, box):
        qx0, qy0, qx1, qy1 = box
        return sum(
            1
            for (x0, x1, y0, y1) in spans
            if x0 <= qx1 and x1 >= qx0 and y0 <= qy1 and y1 >= qy0
        )

    box = (10.0, 10.0, 20.0, 20.0)  # 1% of the area
    assert hits(spans_ctl, box) == len(spans_ctl)  # control: no pruning
    assert hits(spans, box) <= len(spans) // 2     # clustered: most pruned

    # correctness: the pruned read returns exactly the box's points
    got = (
        spark.read.parquet(out)
        .where("cx >= 10 AND cx <= 20 AND cy >= 10 AND cy <= 20")
        .count()
    )
    want = ctl.where(
        "cx >= 10 AND cx <= 20 AND cy >= 10 AND cy <= 20"
    ).count()
    assert got == want > 0
