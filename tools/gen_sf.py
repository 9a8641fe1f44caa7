"""Generate TPC-H-ish fixture tables at an arbitrary scale factor.

The driver ships sf0.001/sf0.01/sf0.1 under /root/testdata (read-only);
scale-proof runs above that need bigger data. This generator mirrors the
driver tables' schemas and value universes (measured from sf0.1:
column types, key ranges, category sets, date windows, text vocab,
unit-norm clustered embeddings) at any sf, deterministically (seed 42),
so `bench.py` and `tools/check_oracle.py` run unchanged against the
output — Spark and DuckDB read the same parquet, so oracle checks stay
self-consistent at any sf.

Usage:  python tools/gen_sf.py 1.0 [outdir]     # default outdir .localdata/sf1

Row counts scale linearly from sf0.1's measured counts: lineitem
6M/sf, orders 1.5M/sf, customer 150k/sf, part 200k/sf, supplier
10k/sf, events 1M/sf, documents 50k/sf, embeddings 20k/sf.

Generation is vectorized numpy -> pyarrow (no Spark): sf1 writes in
seconds. Output parquet uses multiple row groups so Spark's scan
splits into parallel tasks like the driver fixtures do.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["cold", "hot", "blue", "red", "small", "large", "old", "new"]
NOUNS = ["plate", "gear", "rod", "ring", "anvil", "bolt", "widget", "cog"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

ORDER_EPOCH = np.datetime64("1995-01-01")
ORDER_DAYS = 2404  # -> max 2001-08-01 like the driver fixtures
EVENT_EPOCH = np.datetime64("2024-01-01T00:00:00.000000")
EVENT_SPAN_US = 30 * 86400 * 1_000_000  # 30 days


def _write(outdir: str, name: str, table: pa.Table) -> None:
    rows = table.num_rows
    # Row groups sized so Spark's byte-based splitter — not row-group
    # alignment — decides scan parallelism. The old rows//16 cap meant
    # sf10 lineitem (1.36 GB) opened as exactly 16 splits on 32 cores
    # and the 65 MB documents file as 8, understating the engine on
    # full hardware; a real 100 TB corpus arrives as thousands of
    # files with splits >> slots, so the fixtures should behave the
    # same way. rows//128 with an 8192-row floor lands row groups in
    # the ~1-12 MB range at every table/sf combination.
    rg = max(8192, rows // 128) if rows > 8192 else rows or 1
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"),
                   row_group_size=rg)
    print(f"  {name}: {rows} rows")


def _ts_days(rng, n, epoch, days):
    d = rng.integers(0, days, n)
    return (epoch + d.astype("timedelta64[D]")).astype("datetime64[us]")


def generate(sf: float, outdir: str, seed: int = 42) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(0, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(MKTSEGS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10_000, n_supp), 2),
    }))

    names = np.array([f"{a} {n}" for a in ADJS for n in NOUNS])
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(names[rng.integers(0, len(names), n_part)]),
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) * 0.1, 2),
    }))

    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(STATUSES)[rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_days(rng, n_ord, ORDER_EPOCH, ORDER_DAYS),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_days(rng, n_li, ORDER_EPOCH, ORDER_DAYS + 95),
    }))

    ev_us = np.sort(rng.integers(0, EVENT_SPAN_US, n_ev))
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": (EVENT_EPOCH + ev_us.astype("timedelta64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(80.0, n_ev).clip(0, 600), 2),
        "props": pa.array(
            [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)]),
    }))

    # documents: ~0.2% exact dups + a batch of near-dups so dedup
    # operators have real work at every sf.
    #
    # Corpus statistics stay SCALE-INVARIANT: vocabulary grows with the
    # corpus (Heaps' law, V ~ N^0.8 here) and word frequencies are
    # Zipf-distributed — like real text, where a 10x corpus does NOT
    # mean every n-gram appears 10x more often. A fixed tiny vocab
    # makes shingle document frequency grow linearly with corpus size,
    # which drives candidate-pair counts quadratic in EVERY sharing-
    # based dedup algorithm — an artifact of the synthetic data, not a
    # property any plan can avoid (the driver's own sf<=0.1 fixtures
    # are small enough not to hit it).
    n_vocab = max(len(VOCAB), int(len(VOCAB) * (sf / 0.1) ** 0.8))
    vocab = np.array(
        VOCAB + [
            f"{VOCAB[i % len(VOCAB)]}{i // len(VOCAB)}"
            for i in range(len(VOCAB), n_vocab)
        ]
    )
    zipf_p = 1.0 / np.arange(1, n_vocab + 1)
    zipf_p /= zipf_p.sum()
    lens = rng.integers(8, 90, n_doc)
    texts = [
        " ".join(vocab[rng.choice(n_vocab, ln, p=zipf_p)]) for ln in lens
    ]
    # Deliberate duplicate cases: every 3rd planted index is an EXACT
    # copy of one anchor doc (exercises digest dedup); the rest are
    # NEAR-duplicates — the first 80% of another doc's tokens — the
    # same augmentation recipe the dedup queries' oracles use, so
    # LSH/Jaccard operators have true near-dup (not exact-dup) recall
    # cases at every generated sf.
    dup_idx = rng.integers(0, n_doc, max(2, n_doc // 500))
    for j, i in enumerate(dup_idx):
        if j % 3 == 0:
            texts[int(i)] = texts[int(dup_idx[0])]
        else:
            src = texts[int(rng.integers(0, n_doc))].split(" ")
            texts[int(i)] = " ".join(src[: max(1, (len(src) * 4) // 5)])
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array(
            [f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 labeled gaussian clusters on the unit sphere (dim 64)
    cent = rng.normal(size=(10, 64))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = cent[labels] + rng.normal(scale=0.35, size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", f"sf{sf:g}")
    outdir = sys.argv[2] if len(sys.argv) > 2 else default
    print(f"generating sf={sf} -> {outdir}")
    generate(sf, outdir)
