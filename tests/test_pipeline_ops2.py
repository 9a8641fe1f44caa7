"""Semantic unit tests for the round-2 corpus-hygiene operators
(chunk-level substring dedup, repetition signals, sequence packing) over
a controlled documents table — the oracle gate covers testdata-scale
behavior; these pin the operator semantics on hand-computable inputs.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from polars_gdal_spark.queries import QUERIES, _TABLE_CACHE

SF_SMOKE = "/root/testdata/sf0.001"

DOCS = [
    # (doc_id, text, lang, source)
    (1, "a b c d e f g h a b c d e f g h", "en", "srcA"),  # 2 chunks, self-dup
    (2, "a b c d e f g h x y", "en", "srcA"),  # chunk1 dups doc1, chunk2 new
    (3, "spam spam spam spam spam spam", "en", "srcA"),  # pure repetition
    (4, "all tokens here are different words entirely", "en", "srcA"),
    (5, "one", "en", "srcA"),
    (6, " ".join(f"t{i}" for i in range(130)), "en", "srcB"),  # spans a pack
    (7, "tail doc after the long one", "en", "srcB"),
]


@pytest.fixture(scope="module")
def mini_sf(tmp_path_factory):
    """An sf-dir whose documents table is the controlled corpus above;
    the other nine tables are the (unused) sf0.001 files."""
    d = tmp_path_factory.mktemp("mini_sf")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events embeddings".split()
    ):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in DOCS], pa.int64()),
            "text": pa.array([r[1] for r in DOCS], pa.string()),
            "lang": pa.array([r[2] for r in DOCS], pa.string()),
            "source": pa.array([r[3] for r in DOCS], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    yield str(d)
    # load_tables memoizes per (app_id, sf_dir); drop entries for this
    # tmp dir so later sessions can't see a deleted path.
    for k in [k for k in _TABLE_CACHE if k[1] == str(d)]:
        del _TABLE_CACHE[k]


def test_chunk_dedup_first_occurrence_wins(spark, mini_sf):
    rows = {
        r["doc_id"]: r
        for r in QUERIES["dedup_chunk_exact"].func(spark, mini_sf).collect()
    }
    # doc1: chunks [a..h][a..h] — second is an intra-doc dup.
    assert rows[1]["total_chunks"] == 2
    assert rows[1]["kept_chunks"] == 1 and rows[1]["dropped_chunks"] == 1
    # doc2: chunk1 == doc1's chunk (doc1 is first), chunk2 "x y" unique.
    assert rows[2]["total_chunks"] == 2 and rows[2]["kept_chunks"] == 1
    # single-token docs still produce one (short) kept chunk.
    assert rows[5]["total_chunks"] == 1 and rows[5]["kept_chunks"] == 1


def test_repetition_signals_flags_spam(spark, mini_sf):
    rows = {
        r["doc_id"]: r
        for r in QUERIES["text_repetition_signals"]
        .func(spark, mini_sf)
        .collect()
    }
    spam = rows[3]
    assert spam["n_unique"] == 1
    assert spam["top_bigram_count"] == 5 and spam["n_bigrams"] == 5
    assert spam["repetitive"] == 1
    varied = rows[4]
    assert varied["top_bigram_count"] == 1 and varied["repetitive"] == 0
    single = rows[5]  # one token → zero bigrams, never repetitive
    assert single["n_bigrams"] == 0 and single["repetitive"] == 0


def test_pack_sequences_shard_local_boundaries(spark, mini_sf):
    rows = QUERIES["pipeline_pack_sequences"].func(spark, mini_sf).collect()
    packs = {(r["source"], r["pack_id"]): r for r in rows}
    # srcA: 16+10+6+7+1 = 40 tokens, all inside pack 0.
    a0 = packs[("srcA", 0)]
    assert a0["n_docs"] == 5 and a0["pack_tokens"] == 40
    assert ("srcA", 1) not in packs
    # srcB: doc6 (130 tok) starts at offset 0 → pack 0; doc7 starts at
    # offset 130 → pack 1. Shard-local packing, no cross-source bleed.
    assert packs[("srcB", 0)]["n_docs"] == 1
    assert packs[("srcB", 0)]["pack_tokens"] == 130
    assert packs[("srcB", 1)]["n_docs"] == 1
    assert packs[("srcB", 1)]["pack_tokens"] == 6
