"""Structured Streaming tests: gdal file-arrival stream + windowed recipes
(batch/stream equivalence via the availableNow trigger)."""

from __future__ import annotations

import json
import shutil

import pyspark.sql.functions as F
import pytest

from polars_gdal_spark.queries import load_tables
from polars_gdal_spark.streaming import (
    run_available_now,
    windowed_event_counts,
)
from tests.conftest import SF_SMOKE


def _feature(i: int, line: str) -> dict:
    return {
        "type": "Feature",
        "geometry": {"type": "Point", "coordinates": [float(i), float(i) / 2]},
        "properties": {"name": f"f{i}", "line": line},
    }


def _write_batch(dirpath, fname: str, feats: list[dict]) -> None:
    with open(dirpath / fname, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)


def test_gdal_stream_reader(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    _write_batch(src, "a.geojson", [_feature(i, "blue") for i in range(5)])

    stream = spark.readStream.format("gdal").load(str(src))
    q = (
        stream.writeStream.format("memory")
        .queryName("gdal_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("gdal_stream").count() == 5

    # second batch of files → only the new file is processed
    _write_batch(src, "b.geojson", [_feature(i, "red") for i in range(3)])
    q2 = (
        stream.writeStream.format("memory")
        .queryName("gdal_stream2")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    # fresh checkpoint → reads everything present now
    assert spark.table("gdal_stream2").count() == 8


def _events_stream(spark, events_dir):
    """Streaming twin of ``load_tables(...)["events"]``: adapts to either
    ts encoding the driver's generator has used (int64 nanoseconds in
    round 1, parquet timestamp[us] in round 2)."""
    import pyarrow.parquet as pq

    ts_type = str(
        pq.read_schema(str(events_dir / "events.parquet")).field("ts").type
    )
    cols = (
        "event_id bigint, ts {}, user_id bigint, event_type string,"
        " value double, props string"
    )
    if ts_type.startswith("timestamp"):
        return spark.readStream.schema(cols.format("timestamp")).parquet(
            str(events_dir)
        )
    return (
        spark.readStream.schema(cols.format("long"))
        .parquet(str(events_dir))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    # copy events.parquet into its own dir (readStream consumes a dir)
    events_dir = tmp_path / "events_stream"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", events_dir / "events.parquet")

    batch_events = load_tables(spark, SF_SMOKE)["events"]
    expected = windowed_event_counts(batch_events).orderBy(
        "window_start", "event_type"
    )

    stream = _events_stream(spark, events_dir)
    got = run_available_now(
        windowed_event_counts(stream), "win_counts"
    ).orderBy("window_start", "event_type")

    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in expected.collect()
    ]


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    from polars_gdal_spark.queries import QUERIES
    from polars_gdal_spark.streaming.stateful import stateful_sessionize

    events_dir = tmp_path / "events_state"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", events_dir / "events.parquet")

    stream = _events_stream(spark, events_dir)
    q = (
        stateful_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sess_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: r["n_sessions"]
        for r in spark.table("sess_state").collect()
    }
    expected = {
        r["user_id"]: r["n_sessions"]
        for r in QUERIES["events_sessionize"].func(spark, SF_SMOKE).collect()
    }
    assert got == expected


def _drain_append(stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def test_streaming_exact_dedup(spark, tmp_path):
    """Streaming digest dedup keeps exactly one row per distinct text and
    agrees with the batch dropDuplicates on the same digest."""
    from polars_gdal_spark.streaming import streaming_exact_dedup

    events_dir = tmp_path / "ev"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", events_dir / "events.parquet")

    # props is a JSON string column with heavy repetition → natural dups
    batch = load_tables(spark, SF_SMOKE)["events"]
    n_batch = (
        batch.withColumn("digest", F.md5(F.lower(F.trim(F.col("props")))))
        .dropDuplicates(["digest"])
        .count()
    )
    got = _drain_append(
        streaming_exact_dedup(
            _events_stream(spark, events_dir), text_col="props"
        ),
        "stream_dedup",
    )
    assert got.count() == n_batch
    assert got.select("digest").distinct().count() == got.count()


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (click→purchase within
    1 hour) returns the same pairs as the identical batch join."""
    from polars_gdal_spark.streaming import stream_click_purchase_pairs

    events_dir = tmp_path / "ev2"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", events_dir / "events.parquet")

    batch = load_tables(spark, SF_SMOKE)["events"]
    expected = {
        (r["click_id"], r["purchase_id"])
        for r in stream_click_purchase_pairs(batch).collect()
    }
    got = {
        (r["click_id"], r["purchase_id"])
        for r in _drain_append(
            stream_click_purchase_pairs(_events_stream(spark, events_dir)),
            "stream_cp_join",
        ).collect()
    }
    assert len(expected) > 0
    assert got == expected


def test_streaming_decontaminate_matches_batch(spark, tmp_path):
    """Stream-static contamination scoring equals the batch operator on
    the same corpus (stateless broadcast-array probe)."""
    from polars_gdal_spark.functions.dedup import benchmark_contamination
    from polars_gdal_spark.streaming import streaming_decontaminate

    docs_dir = tmp_path / "docs_stream"
    docs_dir.mkdir()
    docs = load_tables(spark, SF_SMOKE)["documents"]
    docs.coalesce(1).write.mode("overwrite").parquet(str(docs_dir))
    bench = docs.where(F.col("doc_id") % 23 == 0)

    expected = {
        r["doc"]: (r["n_shingles"], r["n_overlap"], r["contamination"])
        for r in benchmark_contamination(
            docs, bench, "doc_id", "text", "text", n=5
        ).collect()
    }
    stream = spark.readStream.schema(docs.schema).parquet(str(docs_dir))
    got_df = _drain_append(
        streaming_decontaminate(stream, bench, "text", n=5),
        "stream_decontam",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_overlap"], r["contamination"])
        for r in got_df.collect()
    }
    assert got == expected


def test_stream_reader_rate_limit(spark, tmp_path):
    """maxFilesPerBatch caps each micro-batch; availableNow drains in
    multiple batches and still delivers every row exactly once."""
    src = tmp_path / "rate_in"
    src.mkdir()
    for i in range(5):
        _write_batch(src, f"f{i}.geojson", [_feature(10 * i + j, "x") for j in range(3)])

    stream = (
        spark.readStream.format("gdal")
        .option("maxFilesPerBatch", "2")
        .load(str(src))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("gdal_rate")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # drains the capped batches
    finally:
        q.stop()
    got = spark.table("gdal_rate")
    assert got.count() == 15
    assert got.select("name").distinct().count() == 15
    batches = [
        p for p in q.recentProgress if p["numInputRows"] and p["numInputRows"] > 0
    ]
    assert len(batches) >= 3  # 5 files / 2 per batch
    assert all(p["numInputRows"] <= 6 for p in batches)  # ≤2 files × 3 rows


def _n_rows(reader, parts) -> int:
    """Row count across partitions; read() yields Arrow RecordBatches
    (the scan fast path) or plain tuples (fallback)."""
    n = 0
    for p in parts:
        for item in reader.read(p):
            n += getattr(item, "num_rows", None) or 1
    return n


def test_stream_reader_watermark_offsets(spark, tmp_path):
    """Filename-watermark offsets on the full stream-reader API: a later
    file named after the watermark is picked up; partition ranges replay
    stably; the listing happens driver-side but reads are per-partition."""
    from polars_gdal_spark.streaming import GdalStreamReader

    src = tmp_path / "wm_in"
    src.mkdir()
    _write_batch(src, "a.geojson", [_feature(1, "x")])
    _write_batch(src, "b.geojson", [_feature(2, "x")])
    schema = (
        spark.read.format("gdal").load(str(src / "a.geojson")).schema
    )
    r = GdalStreamReader(schema, {"path": str(src)})
    off0 = r.initialOffset()
    off1 = r.latestOffset()
    assert off1["last"].endswith("b.geojson")
    parts1 = r.partitions(off0, off1)
    assert len(parts1) == 2 and _n_rows(r, parts1) == 2
    # new file after the watermark
    _write_batch(src, "c.geojson", [_feature(3, "x")])
    off2 = r.latestOffset()
    assert off2["last"].endswith("c.geojson")
    parts2 = r.partitions(off1, off2)
    assert len(parts2) == 1 and _n_rows(r, parts2) == 1
    # replay exactly the second batch by offset range
    assert _n_rows(r, r.partitions(off1, off2)) == 1
    # legacy n_files checkpoint offsets still resolve
    assert _n_rows(r, r.partitions({"n_files": 1}, off2)) == 2
    # empty poll keeps the watermark
    off3 = r.latestOffset()
    assert off3 == off2 and r.partitions(off2, off3) == []


def test_stream_reader_restart_resumes_from_replay(spark, tmp_path):
    """A fresh reader instance (restarted worker) re-learns the engine's
    checkpointed position from the replayed partitions() call and never
    re-emits committed files; the cap applies in steady state."""
    from polars_gdal_spark.streaming import GdalStreamReader

    src = tmp_path / "rs_in"
    src.mkdir()
    for name in ("a.geojson", "b.geojson", "c.geojson"):
        _write_batch(src, name, [_feature(1, "x")])
    schema = (
        spark.read.format("gdal").load(str(src / "a.geojson")).schema
    )
    r = GdalStreamReader(schema, {"path": str(src), "maxFilesPerBatch": "1"})
    # engine replays the last uncommitted batch (b, c] from its checkpoint
    replay = r.partitions(
        {"last": str(src / "b.geojson")}, {"last": str(src / "c.geojson")}
    )
    assert len(replay) == 1 and replay[0].path.endswith("c.geojson")
    # subsequent polls resume past the replayed end, one file per batch
    _write_batch(src, "d.geojson", [_feature(2, "x")])
    _write_batch(src, "e.geojson", [_feature(3, "x")])
    assert r.latestOffset()["last"].endswith("d.geojson")
    assert r.latestOffset()["last"].endswith("e.geojson")
    # a brand-new instance with no replay walks forward through empty
    # batches instead of re-reading: partitions clamps to (start, end]
    r2 = GdalStreamReader(schema, {"path": str(src), "maxFilesPerBatch": "1"})
    off = r2.latestOffset()  # advances from "" -> a.geojson
    assert off["last"].endswith("a.geojson")
    ckpt = {"last": str(src / "e.geojson")}  # engine-held committed offset
    assert r2.partitions(ckpt, off) == []  # end < start -> nothing re-read


def test_transform_with_state_user_stats(spark, tmp_path):
    """transformWithStateInPandas running stats equal the batch groupBy
    when the stream drains (update mode → take each user's last row)."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState's state protocol needs protobuf,"
        " absent in this container",
    )
    from polars_gdal_spark.streaming.stateful import stateful_user_stats

    events_dir = tmp_path / "tws_in"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", events_dir / "events.parquet")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            stateful_user_stats(_events_stream(spark, events_dir))
            .writeStream.format("memory")
            .queryName("tws_stats")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got = {
        r["user_id"]: (r["n_events"], r["total_value"], r["n_event_types"])
        for r in spark.table("tws_stats").collect()
    }
    batch = load_tables(spark, SF_SMOKE)["events"]
    expected = {
        r["user_id"]: (r["n"], r["tv"], r["nt"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("tv"),
            F.count_distinct("event_type").alias("nt"),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for u, (n, tv, nt) in expected.items():
        gn, gtv, gnt = got[u]
        assert (gn, gnt) == (n, nt)
        assert gtv == pytest.approx(tv, rel=1e-9)


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Native session_window: the streaming run (watermarked, append)
    emits exactly the batch sessions once the stream drains."""
    from polars_gdal_spark.streaming import session_event_aggs

    events_dir = tmp_path / "events_sw"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", events_dir / "events.parquet")

    q = (
        session_event_aggs(_events_stream(spark, events_dir))
        .writeStream.format("memory")
        .queryName("sw_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def key(rows):
        return sorted(
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], round(r["sum_value"], 6))
            for r in rows
        )

    batch = load_tables(spark, SF_SMOKE)["events"]
    got = key(spark.table("sw_stream").collect())
    want = key(session_event_aggs(batch).collect())
    # Append mode emits only sessions the watermark closed. The final
    # watermark is max(ts) - 1h delay, so sessions ending in the last
    # hour of the stream remain open and unemitted — every emitted
    # session must match batch, and every batch session that ended
    # before the final watermark must have been emitted.
    import datetime

    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - datetime.timedelta(hours=1)
    got_set = set(got)
    assert len(got) > 0 and got_set <= set(want)
    closed = [s for s in want if s[2] < wm]  # s[2] = session_end
    assert all(s in got_set for s in closed)


def test_drain_available_now_capped_backlog(spark, tmp_path):
    """drain_available_now loops availableNow runs against one
    checkpoint until a run admits nothing: a capped backlog (5 files,
    cap 2) fully drains exactly-once, where a single availableNow run
    would stop after one capped batch (the documented engine caveat)."""
    from polars_gdal_spark.streaming import drain_available_now

    src = tmp_path / "drain_in"
    src.mkdir()
    for i in range(5):
        _write_batch(
            src, f"f{i}.geojson", [_feature(10 * i + j, "x") for j in range(3)]
        )
    stream = (
        spark.readStream.format("gdal")
        .option("maxFilesPerBatch", "2")
        .load(str(src))
    )
    got = drain_available_now(
        stream.select("name", "line"),
        str(tmp_path / "drain_out"),
        str(tmp_path / "drain_ckpt"),
    )
    assert got.count() == 15
    assert got.select("name").distinct().count() == 15


def test_streaming_chunk_documents_matches_batch(spark, tmp_path):
    """The RAG chunking transform is a pure narrow map, so it applies
    unchanged to a document stream: chunks of arriving docs equal the
    batch chunking of the same corpus (the streaming ingest shape of an
    embedding pipeline: stream -> chunk -> write)."""
    src = tmp_path / "docs_in"
    src.mkdir()
    rows = [(i, "word%d " % i * (37 * (i + 1))) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(src))

    size, stride = 200, 150

    def chunk(frame):
        c = F.expr(f"substring(text, chunk_id * {stride} + 1, {size})")
        return (
            frame.where(F.length("text") > 0)
            .select(
                "doc_id",
                "text",
                F.explode(
                    F.sequence(
                        F.lit(0).cast("bigint"),
                        F.floor((F.length("text") - 1) / stride).cast(
                            "bigint"
                        ),
                    )
                ).alias("chunk_id"),
            )
            .select(
                "doc_id",
                "chunk_id",
                F.md5(c).alias("chunk_md5"),
            )
        )

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        chunk(stream)
        .writeStream.format("memory")
        .queryName("chunk_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["chunk_id"]): r["chunk_md5"]
        for r in spark.sql("SELECT * FROM chunk_stream").collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"]): r["chunk_md5"]
        for r in chunk(df).collect()
    }
    assert got == want and len(got) > 6


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    """Batch-id-keyed overwrite sink: (a) a full drain equals the batch
    read; (b) replaying a batch (the crash-between-write-and-commit
    case) leaves the sink unchanged instead of duplicating rows."""
    from polars_gdal_spark.streaming import foreach_batch_idempotent_sink

    src = tmp_path / "in"
    src.mkdir()
    batch = load_tables(spark, SF_SMOKE)["events"].select(
        "event_id", "event_type", "value"
    )
    # two source files → two micro-batches under maxFilesPerTrigger=1
    batch.where("event_id % 2 = 0").coalesce(1).write.parquet(
        str(src / "a.parquet")
    )
    batch.where("event_id % 2 = 1").coalesce(1).write.parquet(
        str(src / "b.parquet")
    )
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    foreach_batch_idempotent_sink(stream, str(out), str(ckpt))

    result = spark.read.parquet(str(out))
    assert result.count() == batch.count()
    assert result.select("batch_id").distinct().count() >= 2

    # simulate the replay: re-deliver batch 0's data under its batch id
    # (materialize before overwriting the directory it was read from)
    replayed = (
        spark.read.parquet(str(out))
        .where("batch_id = 0")
        .drop("batch_id")
        .localCheckpoint(eager=True)
    )
    replayed.write.mode("overwrite").parquet(str(out / "batch_id=0"))
    again = spark.read.parquet(str(out))
    assert again.count() == batch.count()  # no duplicates after replay
    assert (
        again.select(F.sum("event_id")).first()[0]
        == batch.select(F.sum("event_id")).first()[0]
    )


def test_streaming_probe_dedup_index_matches_batch(spark, tmp_path):
    """Stream-static probe of the persisted dedup index flags arriving
    docs identically to the batch probe — stateless (projection band
    signatures + stream-static joins), append mode."""
    from polars_gdal_spark.functions import dedup as D
    from polars_gdal_spark.streaming import streaming_probe_dedup_index

    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "spark shuffles hash partitions across the cluster ring"),
            (2, "unrelated text about cooking pasta al dente slowly"),
        ],
        "doc bigint, text string",
    )
    idx = str(tmp_path / "didx")
    D.save_dedup_index(corpus, idx, n_hashes=16, bands=4, shingle_n=3)

    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            (11, "spark shuffles hash partitions across the cluster ring today"),
            (12, "entirely novel content matching nothing at all here"),
            (13, "xy"),  # too short for a shingle -> no near probe
        ],
        "doc bigint, text string",
    )
    expected = {
        r["doc"]: (r["is_exact_dup"], r["is_near_dup"])
        for r in D.probe_dedup_index(batch, idx).collect()
    }

    stream_dir = tmp_path / "batch_stream"
    stream_dir.mkdir()
    batch.coalesce(1).write.mode("overwrite").parquet(str(stream_dir))
    stream = spark.readStream.schema(batch.schema).parquet(str(stream_dir))
    got_df = _drain_append(
        streaming_probe_dedup_index(stream, idx), "stream_didx"
    )
    got = {
        r["doc"]: (r["is_exact_dup"], r["is_near_dup"])
        for r in got_df.collect()
    }
    assert got == expected
    assert got[10] == (1, 1) and got[12] == (0, 0) and got[13] == (0, 0)
    assert got[11][1] == 1  # near dup of corpus doc 1


def test_streaming_bloom_prefilter_equals_batch(spark, tmp_path):
    """The streaming bloom prefilter (stateless codegen filter) keeps a
    superset of the true members and, after the exact stage, agrees with
    the batch semi join on the same key set."""
    from polars_gdal_spark.functions.bloom import bloom_bitmap
    from polars_gdal_spark.streaming import streaming_bloom_prefilter

    events_dir = tmp_path / "evb"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", events_dir / "events.parquet")

    batch = load_tables(spark, SF_SMOKE)["events"]
    dim = batch.select("user_id").distinct().where(F.col("user_id") % 7 == 0)
    bitmap = bloom_bitmap(dim, "user_id", m_bits=4096, n_hashes=3)

    pre = _drain_append(
        streaming_bloom_prefilter(
            _events_stream(spark, events_dir), bitmap, "user_id"
        ),
        "stream_bloom",
    )
    members = {r["user_id"] for r in dim.collect()}
    got_users = {r["user_id"] for r in pre.select("user_id").distinct().collect()}
    assert members <= got_users  # no member row dropped
    # exact stage on survivors == batch semi join on the full input
    exact = pre.join(dim, "user_id", "left_semi").count()
    want = batch.join(dim, "user_id", "left_semi").count()
    assert exact == want


def test_stateful_cusum_drift_matches_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    from polars_gdal_spark.queries import QUERIES, load_tables
    from polars_gdal_spark.streaming.stateful import stateful_cusum_drift

    events_dir = tmp_path / "events_cusum"
    events_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", events_dir / "events.parquet")

    # The batch query derives the drift baseline as the corpus integer
    # mean; hand the same constant to the live monitor.
    ev = load_tables(spark, SF_SMOKE)["events"]
    drift = ev.select(
        F.expr("sum(cast(floor(value * 100) as long)) div count(*)")
    ).collect()[0][0]

    stream = _events_stream(spark, events_dir)
    q = (
        stateful_cusum_drift(stream, int(drift))
        .writeStream.format("memory")
        .queryName("cusum_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], r["peak_cusum"], r["drifted"])
        for r in spark.table("cusum_state").collect()
    }
    expected = {
        r["user_id"]: (r["n_events"], r["peak_cusum"], r["drifted"])
        for r in QUERIES["events_cusum_drift"].func(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_streaming_incremental_agg_matches_batch(spark, tmp_path):
    """Multi-batch streamed snapshot == one-shot batch aggregate, and a
    replayed batch (same id, same data) leaves the snapshot unchanged —
    the exactly-once contract of the versioned merge."""
    from polars_gdal_spark.queries import load_tables
    from polars_gdal_spark.streaming import (
        _user_partials,
        read_agg_snapshot,
        refresh_agg_snapshot,
        streaming_incremental_agg,
    )

    ev = load_tables(spark, SF_SMOKE)["events"]
    events_dir = tmp_path / "ev_split"
    # several input files + maxFilesPerTrigger=1 => several micro-batches
    ev.repartition(4).write.parquet(str(events_dir))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(events_dir))
    )
    snap = str(tmp_path / "snapshot")
    streaming_incremental_agg(stream, snap, str(tmp_path / "ckpt"))

    got = {
        r["user_id"]: (
            r["n_events"],
            r["sum_cents"],
            r["first_ts"],
            r["last_ts"],
        )
        for r in read_agg_snapshot(spark, snap).collect()
    }
    want = {
        r["user_id"]: (
            r["n_events"],
            r["sum_cents"],
            r["first_ts"],
            r["last_ts"],
        )
        for r in _user_partials(ev).collect()
    }
    assert got == want

    # restarting the drained stream against the same checkpoint replays
    # nothing (offsets committed) and must leave the snapshot intact
    stream2 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(events_dir))
    )
    streaming_incremental_agg(stream2, snap, str(tmp_path / "ckpt"))
    after = {
        r["user_id"]: (
            r["n_events"],
            r["sum_cents"],
            r["first_ts"],
            r["last_ts"],
        )
        for r in read_agg_snapshot(spark, snap).collect()
    }
    assert after == got


def test_refresh_agg_snapshot_replay_idempotent(spark, tmp_path):
    """Direct replay of refresh_agg_snapshot with the same (batch_id,
    rows) after a simulated crash-after-write yields identical state."""
    from polars_gdal_spark.queries import load_tables
    from polars_gdal_spark.streaming import (
        read_agg_snapshot,
        refresh_agg_snapshot,
    )

    ev = load_tables(spark, SF_SMOKE)["events"]
    b0 = ev.where("event_id % 2 = 0")
    b1 = ev.where("event_id % 2 = 1")
    snap = str(tmp_path / "snap")
    refresh_agg_snapshot(spark, b0, 0, snap)
    refresh_agg_snapshot(spark, b1, 1, snap)
    want = {tuple(r) for r in read_agg_snapshot(spark, snap).collect()}
    # crash between sink write and offset commit => batch 1 replays
    refresh_agg_snapshot(spark, b1, 1, snap)
    got = {tuple(r) for r in read_agg_snapshot(spark, snap).collect()}
    assert got == want


def test_streaming_ann_probe_matches_indexed_search(spark, tmp_path):
    """Streamed query vectors probed per micro-batch against the
    persisted IVF index return, per query, exactly what the batch
    ``ivf_search_indexed`` returns for that query — and a checkpointed
    re-drain replays nothing and leaves the results intact."""
    import pyspark.sql.functions as F

    from polars_gdal_spark.functions.similarity import (
        ivf_search_indexed,
        save_ivf_index,
    )
    from polars_gdal_spark.queries import load_tables
    from polars_gdal_spark.streaming import streaming_ann_probe

    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    centroids = emb.where(F.col("vec_id") < 8)
    idx = str(tmp_path / "ivf")
    save_ivf_index(emb, centroids, idx)

    queries = emb.where(F.col("vec_id").isin([100, 200, 300]))
    qdir = tmp_path / "qstream"
    queries.repartition(3).write.parquet(str(qdir))
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qdir))
    )
    out = str(tmp_path / "hits")
    streaming_ann_probe(
        stream, idx, out, str(tmp_path / "ckpt"), k=5, n_probe=2
    )
    got = {
        (r["qid"], r["vec_id"]): r["cosine"]
        for r in spark.read.parquet(out).collect()
    }
    want = {}
    for qid in (100, 200, 300):
        qv = emb.where(F.col("vec_id") == qid)
        for r in ivf_search_indexed(spark, idx, qv, k=5, n_probe=2).collect():
            want[(qid, r["vec_id"])] = r["cosine"]
    assert got == want

    # re-drain with the same checkpoint: nothing replays, results intact
    stream2 = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qdir))
    )
    streaming_ann_probe(
        stream2, idx, out, str(tmp_path / "ckpt"), k=5, n_probe=2
    )
    again = {
        (r["qid"], r["vec_id"]): r["cosine"]
        for r in spark.read.parquet(out).collect()
    }
    assert again == got


def test_stateful_token_budget_matches_batch(spark, tmp_path):
    """Two-batch streamed admission == the batch prefix-cumsum selection
    in doc_id order: the per-source spent counter carries across
    micro-batches (the second file's docs are admitted against quota
    already consumed by the first), and rejected documents still charge
    the quota — prefix semantics, exactly the batch filter's."""
    import time

    from pyspark.sql import Window

    from polars_gdal_spark.functions import text as T
    from polars_gdal_spark.streaming.stateful import stateful_token_budget

    docs = load_tables(spark, SF_SMOKE)["documents"]
    cut = 250
    src = tmp_path / "docs_budget"
    src.mkdir()
    # two files with ascending doc_id ranges, written in order, so
    # maxFilesPerTrigger=1 delivers them as two in-order micro-batches
    docs.where(F.col("doc_id") < cut).coalesce(1).write.parquet(
        str(src / "b0")
    )
    time.sleep(1.1)
    docs.where(F.col("doc_id") >= cut).coalesce(1).write.parquet(
        str(src / "b1")
    )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        stateful_token_budget(stream, budget=600)
        .writeStream.format("memory")
        .queryName("budget_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["source"], r["ntok"], r["cum_tok"])
        for r in spark.table("budget_stream").collect()
    }

    ntok = T.token_count(F.col("text"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["doc_id"]: (r["source"], r["ntok"], r["cum_tok"])
        for r in docs.select(
            "doc_id", "source", ntok.alias("ntok")
        )
        .withColumn("cum_tok", F.sum("ntok").over(w))
        .where(F.col("cum_tok") <= 600)
        .collect()
    }
    assert got == want
    # the cross-batch carry must actually be exercised: there must be a
    # batch-1 doc that a fresh (spent=0) batch-1-only replay WOULD
    # admit, but the real stream rejected — i.e. rejected specifically
    # because of quota carried from batch 0, not by batch-1's own
    # spend or its own size
    rows = sorted(
        (r["doc_id"], r["source"], r["ntok"])
        for r in docs.select(
            "doc_id", "source", ntok.alias("ntok")
        ).collect()
    )
    spent_b0 = {}
    for d, s, nt in rows:
        if d < cut:
            spent_b0[s] = spent_b0.get(s, 0) + nt
    carried = set()
    b1_only = {}
    for d, s, nt in rows:
        if d < cut:
            continue
        b1_only[s] = b1_only.get(s, 0) + nt
        if b1_only[s] <= 600 and d not in want:
            # admissible on batch-1 spend alone, rejected by the
            # stream — only carried batch-0 spend explains it
            assert spent_b0.get(s, 0) + b1_only[s] > 600
            carried.add(s)
    assert carried, (
        "no batch-1 doc was rejected solely due to quota carried "
        "from batch 0 — cross-batch carry untested"
    )
