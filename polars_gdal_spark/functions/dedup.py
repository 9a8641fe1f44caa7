"""Deduplication operators for LLM training-data pipelines.

Four families, all shuffle-on-key designs that hold at 100 TB:

* **exact**       — hash-groupBy on a content digest; the shuffle key is a
                    16-byte md5, perfectly distributed.
* **MinHash-LSH** — shingle → per-seed min-hash → band signatures →
                    bucket-join: candidate pairs come from an equi-join on
                    (band, signature), never a cross join.
* **SimHash**     — per-token hash bits majority-voted into a short
                    signature; near-dups collide on the signature key.
* **n-gram Jaccard** — shingle-level equi-join + intersection count /
                    union; exact verification for candidate pairs.

Hash choice: md5 (identical lowercase hex in Spark, DuckDB, and Python's
hashlib) so every operator is oracle-checkable. MinHash signatures
(round 8) hash each shingle ONCE — the first 14 hex chars of
``md5(shingle)`` parse to a 56-bit BIGINT (``conv(..., 16, 10)`` /
DuckDB ``CAST('0x' || … AS BIGINT)``) — and expand to the per-seed
family by XOR with the fixed ``MINHASH_XOR_CONSTS``; minima aggregate
as fixed-width longs (HashAggregate, not SortAggregate) and
``band_signatures`` keys buckets with ``concat_ws`` over the raw
decimal minima (injective, codegen, never exposed in query output).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def content_digest(col) -> Column:
    """Exact-dup key: md5 of the normalized text."""
    return F.md5(F.lower(F.trim(col)))


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct content digest (dropDuplicates on the
    digest — one shuffle on a uniform 128-bit key)."""
    return df.withColumn("_digest", content_digest(F.col(text_col))).dropDuplicates(
        ["_digest"]
    ).drop("_digest")


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Report duplicate groups: digest, group size, representative id."""
    return (
        df.select(
            content_digest(F.col(text_col)).alias("digest"), F.col(id_col)
        )
        .groupBy("digest")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("representative_id"),
        )
        .where(F.col("n_dups") > 1)
    )


def word_shingles(col, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text.

    WARNING (round 10): the Column-only contract forces the transform
    lambda to reference the tokenization EXPRESSION, which Spark
    re-evaluates per shingle position — O(len²) per document, plus an
    allocated slice and n-gram string each. Fine for the streaming
    per-micro-batch twins this serves; corpus-scale batch consumers
    must use :func:`_hashed_distinct_shingle_rows` (set semantics,
    bound column, hashed identity) or :func:`_shingle_rows_with_dups`
    (bag semantics) instead — ``benchmark_contamination`` measured
    19.3 → 4.25 s at sf10 switching off this helper."""
    toks = F.filter(F.split(F.lower(col), " "), lambda x: x != F.lit(""))
    ngrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    # Guard: F.sequence(1, k) with k < 1 generates a *descending* sequence,
    # so short texts must map to an empty shingle set explicitly.
    return F.when(
        F.size(toks) >= n, F.array_distinct(ngrams)
    ).otherwise(F.array().cast("array<string>"))


# Signature-scheme tag persisted into on-disk dedup indexes
# (``save_dedup_index``) and checked on every probe: signatures are
# recomputed by the probing library, so an index written under a
# different scheme must fail loudly, not silently match nothing.
MINHASH_SCHEME = "md5-xor56-v2"

# Fixed pseudorandom 56-bit MinHash seed constants (python:
# random.seed(0x5eed); getrandbits(56) ×64 — the first 16 are the
# default seeds; the tail keeps larger n_hashes supported), shared
# verbatim by the Spark side (bitwiseXOR), the streaming per-row twin,
# and the DuckDB oracle fragments (queries/dedup.py interpolates them
# into a VALUES list) — the two engines must XOR the identical
# constants or every signature diverges.
MINHASH_XOR_CONSTS = [
    61620540649648908,
    29374383483003867,
    42114560361087690,
    59085761434809420,
    46164968885894621,
    22365717841552286,
    56488808382706310,
    58206001367736487,
    15930271405568968,
    52763672706474767,
    41786700642489633,
    45891371794529076,
    70088452899773101,
    28543675751347374,
    64770685752751656,
    68451890056042756,
    16105742243026765,
    4059915829357249,
    43110164479346058,
    63811556597087024,
    18639027408036271,
    20084962532439055,
    44318522598847535,
    46591357680614842,
    3634969302166842,
    18055412755803610,
    53639226485935206,
    56124230027168489,
    3748100555903526,
    8032513097340747,
    22960493103953742,
    57660478624714851,
    55141248063769847,
    17112582844050571,
    66046876088062018,
    7675116838307994,
    3027341081297078,
    16859346234477940,
    50146916411130111,
    59525067707989650,
    9496079157183792,
    36523070345420732,
    62086252824631576,
    60586438383601343,
    605112995405163,
    18864003377358921,
    41390380031399960,
    32942175076149672,
    20331749008725783,
    40818463383746214,
    57764554220931263,
    28567181469021508,
    55027860195662079,
    17874659946552781,
    22520484897667887,
    24793574287444949,
    47549558367317558,
    25523569569616581,
    4482225520659277,
    53250585949605879,
    22444283127561564,
    34617101127823832,
    14782464242991570,
    63149532064141738,
]


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Exploded (id, shingle) pairs — the working set for MinHash and
    Jaccard. Cardinality ≈ rows × tokens; partitions by shingle hash when
    joined, which is near-uniform. DISTINCT per doc (set semantics —
    Jaccard/PPJoin consumers require it)."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )


def _shingle_rows_with_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    extra_cols: tuple[str, ...] = (),
    id_alias: str = "doc",
    out_col: str = "shingle",
    hashed: bool = False,
) -> DataFrame:
    """Exploded (doc, shingle) rows for MIN-AGGREGATING consumers only
    (MinHash): duplicate in-doc shingles are KEPT — a min over a bag
    equals the min over its set, so signatures are identical to
    :func:`shingle_table`'s, but construction is ~8× cheaper (measured
    18.6 → 2.2 s for 41M shingles at sf10). The per-position
    ``transform(slice + array_join)`` lambda in :func:`word_shingles`
    is interpreted per element and allocates an array plus a string per
    shingle; here the n-gram is assembled AFTER the explode — three
    bulk ``slice`` copies zipped positionally, then one ``concat_ws``
    per row inside whole-stage codegen. Byte-identical shingle strings,
    so the md5-based scheme and its DuckDB oracle mirror are unchanged.
    Jaccard/PPJoin consumers must keep :func:`shingle_table` (set
    semantics).

    ``extra_cols`` are carried through unchanged (e.g. a per-doc char
    count for repetition-fraction consumers); ``id_alias``/``out_col``
    rename the two produced columns so non-dedup consumers
    (``text_repetition_rules``) share this construction instead of
    duplicating it. ``hashed=True`` emits ``xxhash64`` over the n token
    slots directly (bigint, no n-gram string ever materialized) for
    consumers that only need shingle IDENTITY — joins/membership/counts
    — where 8-byte keys shrink every downstream shuffle and a 64-bit
    collision is ~2^-64 per pair (the ngram_jaccard substrate's
    documented argument)."""
    tk = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit("")
    )
    m = F.size(F.col("_tk")) - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice(F.col("_tk"), i + 1, m).alias(f"_{i}") for i in range(n)]
    )
    carried = list(extra_cols)
    return (
        df.select(
            F.col(id_col).alias(id_alias), *carried, tk.alias("_tk")
        )
        .where(F.size(F.col("_tk")) >= n)
        .select(id_alias, *carried, F.explode(zipped).alias("_g"))
        .select(
            id_alias,
            *carried,
            (
                F.xxhash64(*[F.col("_g")[f"_{i}"] for i in range(n)])
                if hashed
                else F.concat_ws(
                    " ", *[F.col("_g")[f"_{i}"] for i in range(n)]
                )
            ).alias(out_col),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: ONE md5 per shingle parsed to a
    56-bit base hash (hex chars 1-14), expanded to ``n_hashes`` hash
    functions by XOR with fixed pseudorandom 56-bit constants —
    ``h_s = base ⊕ C_s`` — and min-aggregated per seed.

    Output: one row per doc with ``sig`` array<bigint> of length
    ``n_hashes``. All ``n_hashes`` minima are computed as parallel agg
    columns in ONE groupBy pass — no seed explode (which would multiply
    the shingle table n_hashes×), and the min-agg is map-side combinable
    so the shuffle carries n_hashes values per doc, not the shingle set.

    Why ONE md5 and XOR expansion (round 8): the previous scheme hashed
    md5(s || ':' || shingle) per seed — 16 md5 evaluations per shingle
    row, measured as the single largest term of LSH pair generation at
    sf10 (~21 s of the 36 s signature materialization; column pruning
    had hidden it from count()-based profiles). One md5 plus 16 XORs
    computes the same-shaped signature at ~1/16 the hash CPU. XOR with
    independent random constants is the standard cheap MinHash seed
    family; a Kirsch–Mitzenmacher LINEAR expansion (h1 + s·h2) was
    tried first and REJECTED by measurement — its per-seed orders are
    correlated (a shingle small in both halves wins most seeds), which
    ballooned LSH candidates 42.7k → 503k at sf1; the XOR family
    reproduces the seeded-md5 family's selectivity (44.5k pairs on the
    same corpus).

    Why BIGINT and not the hex string: ``min(string)`` has a var-length
    aggregation buffer, which forces Spark into SortAggregate — the
    whole shingle table gets sorted by doc on BOTH sides of the shuffle.
    Fixed-width longs keep the 16-way min in HashAggregate (no sort)
    and shrink the per-doc shuffle payload. The oracle mirrors the
    scheme exactly via ``xor(CAST('0x' || substr(md5(shingle), 1, 14)
    AS BIGINT), C_s)`` — 14 hex chars parse exactly in both engines.
    """
    sh = _shingle_rows_with_dups(df, id_col, text_col, shingle_n)
    m = F.md5(F.col("shingle"))
    base = sh.select(
        "doc",
        F.conv(F.substring(m, 1, 14), 16, 10).cast("bigint").alias("_h1"),
    )
    if n_hashes > len(MINHASH_XOR_CONSTS):
        raise ValueError(
            f"n_hashes={n_hashes} exceeds the {len(MINHASH_XOR_CONSTS)} "
            "fixed MinHash seed constants"
        )
    aggs = [
        F.min(F.col("_h1").bitwiseXOR(F.lit(MINHASH_XOR_CONSTS[s]))).alias(
            f"_mh{s}"
        )
        for s in range(n_hashes)
    ]
    return (
        base.groupBy("doc")
        .agg(*aggs)
        .select(
            "doc", F.array(*[f"_mh{s}" for s in range(n_hashes)]).alias("sig")
        )
    )


def band_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """One row per (doc, band) with the band's LSH signature — the
    shared building block of pair generation (:func:`minhash_lsh_pairs`)
    and incremental new-vs-existing probing.

    Output columns: ``doc``, ``band`` (0..bands-1), ``band_sig`` — the
    band's minima joined as ``'|'``-separated DECIMAL strings. The
    representation is injective, so bucket membership (and therefore
    every pair-, component- and count-distinct-derived result) is
    identical to any hash of the same tuple — and ``band_sig`` never
    appears in a query output, only as a within-engine join/count key,
    so no oracle mirrors it. Round 8 dropped the previous
    ``md5(hex-join)`` formatting: the per-(doc, band) interpreted HOF
    (``transform`` + ``lpad(lower(hex))``) plus an md5 was the single
    most expensive step of LSH pair generation (3.2 s of the 5.65 s
    banded materialization at sf1 — more than the 16-way MinHash
    aggregation itself); ``concat_ws`` over ``element_at`` is pure
    whole-stage codegen.
    """
    rows_per_band = n_hashes // bands
    if sigs is None:
        sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    return sigs.select(
        "doc",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "sig",
    ).select(
        "doc",
        "band",
        F.concat_ws(
            "|",
            *[
                F.element_at(
                    F.col("sig"), F.col("band") * rows_per_band + i + 1
                )
                for i in range(rows_per_band)
            ],
        ).alias("band_sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 64,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: split the signature into ``bands`` bands of
    ``n_hashes/bands`` rows; docs sharing any band signature are
    candidates.

    ``sigs`` optionally supplies a precomputed
    :func:`minhash_signatures` relation (columns ``doc``, ``sig``) so a
    caller that also consumes the signatures directly (e.g. the
    sketch-accuracy harness) computes the shingle→min lineage ONCE.

    Pair generation groups docs per (band, band_sig) bucket and explodes
    in-bucket combinations — one aggregation pass over the signatures,
    no self-join (a self-join would recompute the signature lineage on
    both sides and shuffle it twice).

    Degenerate buckets are dropped, not collected: a pathological band
    signature (near-empty docs, templated boilerplate) would otherwise
    concentrate an unbounded membership list in a single row/task and
    emit O(bucket²) pairs. Bucket sizes are counted first (count-only
    agg, map-side combinable, never materializes membership); only
    buckets with 2..``max_bucket`` members — real near-dup clusters —
    proceed to membership collection. Oversized buckets carry no usable
    Jaccard signal (they are hash collisions or boilerplate floods) and
    their docs still pair up through their other, selective bands.
    """
    from pyspark import StorageLevel

    banded = band_signatures(
        df, id_col, text_col, n_hashes, bands, shingle_n, sigs=sigs
    )
    # Two consumers below (bucket-size count, membership collect): persist
    # so the signature lineage — a full shingle-table groupBy — runs ONCE.
    # banded is bands× the doc count (4 small columns), spillable to disk.
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    eligible = (
        banded.groupBy("band", "band_sig")
        .agg(F.count("*").alias("_bsz"))
        .where((F.col("_bsz") > 1) & (F.col("_bsz") <= max_bucket))
        .select("band", "band_sig")
    )
    buckets = (
        banded.join(eligible, ["band", "band_sig"])
        .groupBy("band", "band_sig")
        .agg(F.array_sort(F.collect_set("doc")).alias("docs"))
    )
    # In-bucket combinations via TWO chained Generate nodes (round 11):
    # explode the anchor position, then explode the suffix slice — all
    # codegen (Generate + element_at/slice are native), replacing the
    # nested F.transform lambda tower that built every pair as an
    # interpreted struct before the explode (higher-order functions
    # don't codegen — the embed_random_projection finding applied to
    # the pair generator). Same pair set: docs is sorted, anchors run
    # 1..n-1, partners are the strict suffix, so doc_a < doc_b and
    # every (i < j) combination appears exactly once.
    result = (
        buckets.select(
            "docs",
            F.explode(F.sequence(F.lit(1), F.size("docs") - 1)).alias("_i"),
        )
        .select(
            F.element_at("docs", F.col("_i")).alias("doc_a"),
            F.explode(
                F.slice(
                    F.col("docs"),
                    F.col("_i") + 1,
                    F.size("docs") - F.col("_i"),
                )
            ).alias("doc_b"),
        )
        .distinct()
    )
    # Eager checkpoint of the (small) pair set releases the banded cache
    # before returning — same lifecycle as ngram_jaccard_pairs.
    result = result.localCheckpoint(eager=True)
    banded.unpersist()
    return result


def simhash_bits(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash signature as a ``bits``-char 0/1 string.

    bit_i = sign of Σ_tokens (±1 depending on the i-th hex digit of
    md5(token) being >= '8'). Distinct tokens weighted once (set
    semantics), making the signature oracle-reproducible.

    All ``bits`` per-position vote sums are parallel agg columns in ONE
    ``groupBy(doc)`` pass over the token table — the same shape as
    :func:`minhash_signatures`. (An earlier version exploded tokens ×
    bit-positions, a ``bits``× shuffle amplification of the token table;
    here the shuffle carries ``bits`` partially-combined ints per doc.)

    The vote itself is integer bit-tests (round 8): the md5 hex parses
    into 8-hex-char BIGINT groups once per token, and "hex digit i >=
    '8'" is exactly "nibble i's top bit set" — ``(h >> (4·(7−pos)+3))
    & 1``. Byte-identical signatures to the substring/isin form it
    replaces (A/B checked row-for-row at sf10), at half the wall: 32
    per-row string slices + set probes became 4 convs + 32 shifts
    (11.1 → 5.3 s honest at sf10).
    """
    assert bits <= 32, "md5 hex gives 32 positions"
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), " "),
                    lambda x: x != F.lit(""),
                )
            )
        ).alias("tok"),
    ).withColumn("th", F.md5("tok"))
    n_groups = (bits + 7) // 8
    hs = [
        F.conv(F.substring("th", 1 + 8 * g, 8), 16, 10)
        .cast("bigint")
        .alias(f"_h{g}")
        for g in range(n_groups)
    ]
    grouped_toks = toks.select("doc", *hs)
    vote = []
    for i in range(1, bits + 1):
        g, pos = (i - 1) // 8, (i - 1) % 8
        shift = 4 * (7 - pos) + 3
        vote.append(
            F.sum(
                F.when(
                    F.shiftright(F.col(f"_h{g}"), shift).bitwiseAND(
                        F.lit(1)
                    )
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"_s{i}")
        )
    sums = grouped_toks.groupBy("doc").agg(*vote)
    sig = F.concat(
        *[
            F.when(F.col(f"_s{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(1, bits + 1)
        ]
    )
    return sums.select("doc", sig.alias("simhash"))


# Symmetric-edge-count ceiling for the single-task union-find finish of
# connected_components. The finishing task holds the edge endpoints plus
# np.unique/label scratch (~64 bytes per symmetric edge at peak), so 8M
# edges bounds the task at ~0.5 GB of Python-worker memory — far below a
# sane executor overhead allotment, while covering every near-dup graph
# a 10x-scale corpus produced (868k edges at sf10). Above the ceiling
# the distributed min-label loop below runs unchanged — at 100 TB the
# pair graph can be billions of edges and MUST stay distributed; this
# constant only decides where the well-known "finish the shrunken graph
# in one task" cutover sits (env SPARK_GRAFT_CC_LOCAL_MAX_EDGES).
#
# Wall-time at the ceiling, MEASURED (round 12, r11 ADVICE): the solve
# is ~2-3.4 s at 868k edges and 40-81 s at 8M edges single-task
# (random-forest / 800k-deep-chain synthetics). That worst case is
# still the right trade: a deep graph needs O(diameter) distributed
# propagation rounds (hours at 800k) vs the local O(log diameter)
# passes, and a shallow 8M-edge graph costs about the same either way.
# A sort-once + np.minimum.reduceat reformulation of the scatter was
# built and REJECTED by measurement: 130 s vs 81 s (deep) and 56 s vs
# 40 s (shallow) at 8M edges — per-round fancy-indexing gathers exceed
# the unbuffered-scatter cost the ADVICE flagged.
_CC_LOCAL_MAX_EDGES = int(
    os.environ.get("SPARK_GRAFT_CC_LOCAL_MAX_EDGES", str(8_000_000))
)


def _cc_local_labels(edges: DataFrame) -> DataFrame:
    """Exact (doc, component=min id) labels for a SMALL symmetric edge
    relation, computed in one task: ship the (already checkpointed)
    edge list to a single Arrow task and run vectorized min-label
    pointer-doubling over numpy index arrays. Converges in O(log
    diameter) C-speed passes; the fixpoint labels every node with its
    component's minimum id (labels start at identity, only decrease,
    and only values from the same component can propagate), which is
    exactly the loop path's output. Deterministic for any batch order:
    np.unique sorts the node universe and min-fixpoints are
    order-independent.

    The output id type FOLLOWS the input edge column (round-12, r11
    ADVICE): the loop path preserves the input id type, so this path
    must too — an int32 edge list used to come back widened to bigint
    only when the edge count happened to select the local finish, a
    schema divergence silently keyed on data size. Callers gate this
    path to integral id types (:func:`connected_components`)."""
    id_type = edges.schema["a"].dataType.simpleString()

    def solve(batches):
        import numpy as np
        import pyarrow as pa

        aa, bb = [], []
        arrow_t = None
        for batch in batches:
            if arrow_t is None:
                arrow_t = batch.column(0).type
            aa.append(batch.column(0).to_numpy(zero_copy_only=False))
            bb.append(batch.column(1).to_numpy(zero_copy_only=False))
        if not aa:
            return
        a = np.concatenate(aa)
        b = np.concatenate(bb)
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ai, bi = inv[: len(a)], inv[len(a):]
        lab = np.arange(len(nodes), dtype=np.int64)
        while True:
            prev = lab.copy()
            m = np.minimum(lab[ai], lab[bi])
            np.minimum.at(lab, ai, m)
            np.minimum.at(lab, bi, m)
            while True:  # pointer closure: compress chains to roots
                nxt = lab[lab]
                if np.array_equal(nxt, lab):
                    break
                lab = nxt
            if np.array_equal(lab, prev):
                break
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(nodes, type=arrow_t),
                pa.array(nodes[lab], type=arrow_t),
            ],
            names=["doc", "component"],
        )

    # coalesce, not repartition: edges is a materialized checkpoint, so
    # the single finishing task just reads the cached blocks — no
    # shuffle write, no sort-before-repartition.
    return (
        edges.coalesce(1)
        .mapInArrow(solve, f"doc {id_type}, component {id_type}")
        .localCheckpoint(eager=True)
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 10,
    local_max_edges: int | None = None,
) -> DataFrame:
    """Connected components over an undirected edge list (doc_a, doc_b):
    returns (doc, component) where component = the minimum doc id in the
    component — the canonical "pick one representative per duplicate
    cluster" step after LSH pair generation.

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; converges in
    O(component diameter) rounds (near-dup clusters are shallow).
    Deterministic, so the driver can oracle-check it against a recursive
    CTE.

    Two shuffles per round, down from four (round 8): neighbor labels
    and each node's own previous label ride ONE union into a single
    ``groupBy(a)`` — min(component) is the new label, and the self row
    carries the old label so "did anything change" is a column
    (``_chg``) of the checkpointed result rather than a second
    corpus-sized join (the old shape paid a labels⋈nmin join AND a
    full-relation inequality join per round). Every node appears as
    ``a`` (edges are symmetrized), so the groupBy covers all nodes.
    Deliberately NO explicit repartition of edges/labels: an A/B at
    sf0.1 and sf10 measured fixed-width repartition(32, key) slower at
    both scales (2.24 vs 1.24 s / 8.40 vs 6.86 s) — AQE's coalesced
    shuffle sizing beats a hand-pinned layout on node-count-sized
    relations.

    Round 11 tried FUSING propagation rounds in pairs (one
    localCheckpoint + one convergence check per TWO rounds, the
    pre-pair label threaded through both groupBys) on the round-10
    hypothesis that the ~1.2-2.4 s/round was scheduler/checkpoint
    overhead — REJECTED by a same-JVM alternating A/B from one
    checkpointed sf10 edge set (868k edges, 8 rounds to converge):
    per-round median 9.05 s vs fused 9.16 s over 4 trials. The cost is
    the propagation SHUFFLES themselves, which fusing does not reduce;
    the convergence-count jobs scan checkpointed data (~0.1 s each)
    and the eager checkpoint adds no separate job (it IS the round's
    action), so there was no per-round constant left to win.

    Round 11 also tried a LOCAL-CONTRACTION pre-pass (repartition by
    endpoint, per-partition union-find, min-label loop over the star
    edges) — REJECTED: on the LSH pair graph (~868k sym edges over
    ~431k nodes at sf10, essentially a forest of tiny clusters) the
    star set barely shrank (868k → 862k) and rounds fell only 6 → 5,
    while the pre-pass itself cost ~2.5 s: medians 12.6 s plain vs
    15.0 s contracted.

    What DID land (round 11): a hybrid finish. When the symmetric edge
    relation is small enough for one task (``local_max_edges``, default
    ``_CC_LOCAL_MAX_EDGES`` ≈ 0.5 GB of single-task scratch, env
    ``SPARK_GRAFT_CC_LOCAL_MAX_EDGES``), the components are solved
    EXACTLY in a single Arrow task by vectorized min-label
    pointer-doubling (:func:`_cc_local_labels`) — the standard
    "finish the shrunken graph in one task" cutover of Pregel-style CC
    implementations. Identical (doc, component) output (A/B-asserted
    at sf0.001/sf10), measured 10.5 → 2.7 s at sf10. Six propagation
    rounds of per-round broadcast + shuffle + checkpoint + count jobs
    on a 4 MB graph were pure fixed overhead — guide §1.3's napkin
    math said this stage should cost milliseconds, and the loop's cost
    was job COUNT, not bytes. Above the ceiling the distributed loop
    below runs unchanged (the 100 TB path: pair graphs can be billions
    of edges); ``max_iter`` and its fail-loud contract apply to that
    loop path only — the local path is a direct exact solve with no
    iteration budget to exceed."""
    import pyspark.sql.functions as F

    # Materialize edges once and truncate lineage every round — without
    # this, iteration k re-executes the entire upstream (LSH) plan k
    # times.
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    ceiling = (
        _CC_LOCAL_MAX_EDGES if local_max_edges is None else local_max_edges
    )
    # count() on the just-checkpointed relation is a ~0.1 s metadata-
    # cheap job; it decides the cutover the same way the triangle
    # query's scan-stats gate does (input-size-derived, never
    # core-count-derived). Integral ids only (round-12, r11 ADVICE):
    # the numpy finish would crash on e.g. string ids that the loop
    # path handles fine — the id TYPE must never change which inputs
    # succeed, so non-integral ids always take the loop.
    integral = edges.schema["a"].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint"
    )
    if ceiling > 0 and integral and edges.count() <= ceiling:
        return _cc_local_labels(edges)
    labels = (
        edges.select(F.col("a").alias("doc"))
        .distinct()
        .withColumn("component", F.col("doc"))
        .localCheckpoint(eager=True)
    )
    # max_iter + 1 iterations: a component whose min-label eccentricity
    # is exactly max_iter needs max_iter propagation rounds PLUS one
    # zero-change round to confirm convergence — without the +1, inputs
    # that converge right at the limit would raise spuriously (review
    # round 8).
    for _ in range(max_iter + 1):
        msgs = (
            edges.join(labels, edges.b == labels.doc)
            # the NULL sentinel must carry the id's own type: a
            # hard-coded bigint made the union insert a cast that
            # crashed non-integral id columns at runtime
            .select(
                "a",
                "component",
                F.lit(None).cast(edges.schema["a"].dataType).alias("_old"),
            )
            .unionAll(
                labels.select(
                    F.col("doc").alias("a"),
                    "component",
                    F.col("component").alias("_old"),
                )
            )
        )
        new_labels = (
            msgs.groupBy("a")
            .agg(
                F.min("component").alias("component"),
                F.min("_old").alias("_prev"),
            )
            .select(
                F.col("a").alias("doc"),
                "component",
                (F.col("component") < F.col("_prev")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("_chg")).limit(1).count()
        labels = new_labels.select("doc", "component")
        if changed == 0:
            break
    else:
        # round 8: a component whose diameter exceeds max_iter used to
        # return silently-unconverged labels (nodes > max_iter hops
        # from their component's minimum keep a stale label). Near-dup
        # clusters are shallow so the default never trips on the
        # library's own pipelines — but the generic API must fail
        # loudly, not wrongly.
        raise ValueError(
            f"connected_components: labels still changing after "
            f"max_iter={max_iter} propagation rounds — some node is "
            "more than max_iter hops from its component's minimum id; "
            "raise max_iter"
        )
    return labels


def _hashed_distinct_shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Exploded (doc, sh) rows with SET semantics and 64-bit hashed
    shingle identity — the fast shingle stream for consumers that only
    need membership/counts (the PPJoin substrate, benchmark
    decontamination): per-doc ``array_distinct`` runs in-array (no
    dedup shuffle), and ``xxhash64`` over the n token slots of the
    BOUND ``tk`` column never materializes an n-gram string. The
    bound-column detail is load-bearing: referencing the tokenization
    EXPRESSION inside the lambda (as :func:`word_shingles` does with
    its Column-only contract) re-evaluates it per element — O(len²)
    per document."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit("")
    )
    hash_args = ", ".join(f"element_at(tk, i + {j})" for j in range(n))
    sh_expr = F.expr(
        f"""CASE WHEN size(tk) >= {n} THEN
              array_distinct(transform(sequence(1, size(tk) - {n - 1}),
                i -> xxhash64({hash_args})))
            ELSE array() END"""
    )
    return df.select(F.col(id_col).alias("doc"), toks.alias("tk")).select(
        "doc", F.explode(sh_expr).alias("sh")
    )


def _shingle_docarr(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    max_shingle_df: int,
    with_prefix: bool = True,
    only_docs: DataFrame | None = None,
):
    """Shared candidate-generation substrate for the PPJoin-style
    similarity joins (:func:`ngram_jaccard_pairs`,
    :func:`ngram_containment_pairs`): hashed shingles, broadcast-anti
    hot-set DF cap, and the per-doc rare-first-sorted shingle array
    with its size and prefix slice (prefix length
    ``|r| − ⌈t·|r|⌉ + 1`` — the completeness bound both measures share,
    since both require ≥ ⌈t·|r|⌉ overlap with the probe side).
    Returns ``(docarr, sc_p)``; docarr is persisted MEMORY_AND_DISK.

    ``with_prefix=False`` (round 9) serves VERIFY-ONLY consumers
    (``dedup_minhash_estimate``, whose candidates come from LSH, not
    from a prefix join): the rare-first ordering exists solely to cut
    prefixes, so skipping it drops the df re-join (a second 41M-row
    shuffle at sf10) and skips the sort entirely (plain
    ``collect_list``) — the arrays feed only set ops
    (``array_intersect``), which are order-free. Measured 19.4 → 8.5 s
    warm at sf10; ``pre`` is absent from the result.

    ``only_docs`` (round 10, verify-only consumers again): a relation
    with a ``doc`` column — the per-doc arrays are built ONLY for
    these docs (LEFT SEMI before the collect), while the DF counts
    stay corpus-global (the cap and ``sz`` are defined over the whole
    corpus regardless of which docs get verified). When candidates
    come from LSH, the verify substrate serves |candidate docs| ≪
    |corpus| rows, so collecting every doc's array shuffles ~5× more
    than the consumer reads. Plain (non-broadcast) semi join: the
    candidate relation is corpus-proportional in the worst case, and
    the semi's doc-hash shuffle is one the groupBy(doc) directly
    reuses — AQE broadcasts it when it is actually small."""
    sc_p = df.sparkSession.sparkContext.defaultParallelism
    base = _hashed_distinct_shingle_rows(df, id_col, text_col, n)
    from pyspark import StorageLevel

    dfs = base.groupBy("sh").agg(F.count("*").alias("_df"))
    if not with_prefix:
        # broadcast-anti DF cap (the hot set is tiny at any corpus
        # size); no sort: the arrays feed only order-free set ops
        # (array_intersect) — element order never reaches any output
        hot = dfs.where(F.col("_df") > max_shingle_df).select("sh")
        shc = base.join(F.broadcast(hot), "sh", "left_anti")
        if only_docs is not None:
            shc = shc.join(
                only_docs.select("doc"), "doc", "left_semi"
            )
        docarr = (
            shc.groupBy("doc")
            .agg(F.collect_list("sh").alias("shs"))
            .select("doc", F.size("shs").alias("sz"), "shs")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        return docarr, sc_p
    if only_docs is not None:
        # prefix consumers GENERATE candidates from this relation — a
        # doc filter here would silently drop qualifying pairs
        raise ValueError(
            "_shingle_docarr: only_docs requires with_prefix=False "
            "(the prefix side must cover the whole corpus)"
        )
    # Prefix consumers need per-occurrence df anyway, so the DF cap is
    # the INNER join against the ≤cap df table — capping and df-attach
    # in one equi-join (round 10). The old broadcast-anti pass was a
    # third full shingle-generation: Catalyst reuses no exchange
    # between the hot-set BroadcastExchange and the df join's hash
    # exchange (read from the sf10 plan), so building the broadcast
    # recomputed the whole 41M-row groupBy. The inner join adds no
    # shuffle the df join didn't already pay, and the aggregation
    # buffer stays fixed-width (count only) at any corpus skew.
    # shuffle_hash hint: SMJ sorts 41M occurrence rows on both sides;
    # the hash build side is the post-agg df table — UNIQUE 8-byte
    # keys, so per-partition build memory is |distinct capped
    # shingles| / shuffle-partitions × 16 B (partition-count-sized at
    # any corpus scale, skew-free by construction). Measured
    # 15.9 → 9.3 s for the substrate build at sf10.
    # Round 12: an Arrow-kernel rebuild of this substrate was built,
    # measured and REJECTED at the full-row level (SCALE.md round 12
    # has the complete numbers). Two mapInArrow kernels (per-partition
    # np.unique df-count on a repartition(sh) — exact global df, since
    # hash partitioning co-locates each shingle — then one sort_indices
    # pass building the per-doc arrays) cut the ISOLATED substrate
    # 12.4-12.8 → 7.5-7.6 s at sf10 (faster in all 5 alternating
    # rounds) and were exceptAll-identical. But the full query rows got
    # SLOWER (+6 s both ngram_jaccard and containment over 8 quiet-
    # gated paired rounds): (a) MapInArrow reports no usable size
    # statistic, so consumers planned against the unmaterialized docarr
    # cache broadcast the 41M-row full-explode join sides (3 bogus
    # BroadcastHashJoins, +17 s) unless an eager count() materializes
    # the cache first — itself an extra full cache pass; (b) writing +
    # re-reading the array-heavy cache through the Python row boundary
    # costs what the removed shuffle+join saved; (c) mapInArrow loses
    # the hash(doc) output-partitioning claim the groupBy provides, so
    # both verify joins re-shuffle the array relation. Kernel-1-only
    # (df attach; JVM array build kept) was a wash quiet (±2 s) and
    # still needed the eager count. The driver benches at sf0.1 where a
    # size gate would keep this JVM shape anyway — rejected rather than
    # shipped as noise.
    # ceil() runs on floats; the 1e-9 bias only ever LENGTHENS the
    # prefix, which is always safe (a shortening would be a
    # false-negative bug).
    p_expr = (
        f"size(a) - cast(ceil({threshold} * size(a) - 1e-9) as int) + 1"
    )
    docarr = (
        base.join(
            dfs.where(F.col("_df") <= max_shingle_df).hint(
                "shuffle_hash"
            ),
            "sh",
        )
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("_df", "sh"))).alias("a"))
        .select(
            "doc",
            F.size("a").alias("sz"),
            F.expr("transform(a, x -> x.sh)").alias("shs"),
            F.expr(
                f"transform(slice(a, 1, {p_expr}), x -> x.sh)"
            ).alias("pre"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return docarr, sc_p


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int = 1024,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing \u22651 shingle.

    |A\u2229B| from co-occurrence on shared shingles; |A\u222aB| = |A|+|B|\u2212|A\u2229B|.
    Jaccard is an exact int/int ratio (bit-identical across engines).
    The shared-shingle requirement bounds the pair space to docs that
    actually share content.

    **Hot-shingle cap**: pair generation is quadratic per shingle \u2014 one
    boilerplate n-gram shared by 10\u2076 docs would emit ~10\u00b9\u00b2 pairs at web
    scale. Shingles whose document frequency exceeds ``max_shingle_df``
    are dropped from the working set (both the pairs AND the per-doc
    sizes, keeping the Jaccard a consistent ratio over the
    retained-shingle universe). High-DF shingles carry no near-duplicate
    signal \u2014 they are corpus-wide boilerplate \u2014 so this is the standard
    web-dedup practice, and it bounds the fan-out at
    ``max_shingle_df\u00b2/2`` pairs per shingle.

    **Execution strategy** (round 3: 3.2 s \u2192 1.8 s at sf0.1; round 4:
    prefix filtering fixed super-linear candidate growth \u2014 94 s \u2192 see
    SCALE.md at sf1):

    1. Shingles are hashed to **64-bit longs at generation time**
       (``xxhash64`` over the n token slots \u2014 no n-gram string is ever
       materialized; distinct token tuples \u2261 distinct n-gram strings
       because tokens are space-split, and a 64-bit collision at corpus
       shingle cardinality is ~2\u207b\u00b3\u2075 \u2014 below any observable effect).
       Every downstream shuffle moves 8-byte keys instead of ~25-byte
       strings.
    2. The DF cap is fused into the **shuffled-hash df-attach join**
       (round 10): prefix ordering needs per-occurrence df anyway, so
       the \u2264cap df table IS the inner-join side \u2014 no separate anti
       pass, no third shingle-generation (Catalyst reused no exchange
       between the old hot-set broadcast and the df join \u2014 read from
       the sf10 plan). The hash build side has UNIQUE 8-byte keys
       (post-agg shingles), so per-partition build memory is
       |distinct capped shingles| / shuffle-partitions \u00d7 16 B \u2014 sized
       by partition count at any corpus scale, and skew-free by
       construction. Measured 15.9 \u2192 9.3 s for the substrate at sf10
       (SMJ was sorting 41M rows on both sides of the join).
    3. **Prefix filtering** (the PPJoin principle \u2014 Xiao, Wang, Lin &
       Yu, "Efficient Similarity Joins for Near Duplicate Detection",
       WWW 2008): order each document's shingles by ascending global
       DF (rarest first) and index only the first
       ``|r| \u2212 \u2308t\u00b7|r|\u2309 + 1``; any pair with Jaccard \u2265 t provably
       shares a prefix shingle, so candidates come from the PREFIX
       equi-join \u2014 lossless, and the hot (high-DF) shingles that drive
       quadratic \u03a3df\u00b2 candidate growth fall out of the prefixes first.
       At t=0 the prefix is the whole set and the operator degrades to
       the plain all-sharing-pairs join.
    4. A **length filter** (min \u2265 t\u00b7max, necessary for J \u2265 t) prunes
       map-side before the candidate distinct.
    5. Verification joins the candidate pairs back to the per-doc
       shingle arrays (bounded by document length) and computes
       |A\u2229B| with one vectorized ``array_intersect`` per pair \u2014 each
       candidate pair crosses the wire ONCE, instead of once per
       shared shingle as in the old co-occurrence count. Round 10:
       the intersect runs over SUFFIX slices from the pair's first
       shared prefix position (carried as min(pos) through the
       candidate agg) \u2014 lossless because both arrays share the global
       (df, sh) sort, and cheapest exactly on the false candidates
       that dominate the verify stage, whose first shared element
       sits deep in both prefixes.
    6. The hot shuffles are **explicitly hash-repartitioned to
       ``defaultParallelism``**: AQE's size-based coalescing sees only
       a few MB here and would serialize the CPU-heavy pair join onto
       4-8 tasks; pinning partition count keeps all cores busy and is
       the neutral choice on a real cluster. Both pair-join sides
       project from the SAME repartitioned prefix relation, so the
       exchange is planned once and reused."""
    docarr, sc_p = _shingle_docarr(
        df, id_col, text_col, n, threshold, max_shingle_df
    )
    prefix = (
        docarr.select("doc", "sz", F.posexplode("pre").alias("_p0", "sh"))
        .select("doc", "sz", (F.col("_p0") + 1).alias("pos"), "sh")
        .repartition(sc_p, "sh")
    )
    # candidate pairs: prefix ⋈ prefix equi-join on the shingle key
    # (round 10 — back from the r9 collect_list + interpreted
    # pair-explode lambda, which evaluated nested HOFs per element:
    # the codegen join generates the same pairs at 9.4 → 4.8 s sf10
    # and needs no per-key aggregation buffer at all; per-key fan-out
    # stays bounded at cap²/2 by the substrate's DF cap). Two lossless
    # prunes run before the pair agg, both epsilon-relaxed so float
    # rounding can only keep extra candidates:
    # * the length filter (min size >= t * max size — necessary for
    #   J >= t);
    # * PPJoin's POSITIONAL filter (WWW'08 §3.2, round 9): both docs'
    #   arrays are sorted by the same global (df, sh) key, so every
    #   shared shingle sits at-or-after the pair's FIRST shared one in
    #   both orders — overlap <= 1 + min(|A|-pos_a, |B|-pos_b). J >= t
    #   needs overlap >= t/(1+t)·(|A|+|B|); an occurrence below that
    #   bound cannot be the first shared element of a qualifying pair,
    #   and the first shared occurrence of any TRUE pair always passes
    #   (its bound >= the actual overlap), so the min(pos) agg keeps
    #   every qualifying pair. Measured at sf10: candidates
    #   33.4M -> 4.0M, verify 86 -> 14 s, result rows identical.
    pa = prefix.select(
        "sh",
        F.col("doc").alias("doc_a"),
        F.col("sz").alias("sz_a"),
        F.col("pos").alias("pos_a"),
    )
    pb = prefix.select(
        "sh",
        F.col("doc").alias("doc_b"),
        F.col("sz").alias("sz_b"),
        F.col("pos").alias("pos_b"),
    )
    required = F.lit(threshold / (1.0 + threshold)) * (
        F.col("sz_a") + F.col("sz_b")
    ) - F.lit(1e-9)
    cand = (
        pa.join(pb, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(
            F.least("sz_a", "sz_b")
            >= F.lit(threshold) * F.greatest("sz_a", "sz_b") - F.lit(1e-9)
        )
        .where(
            (
                1
                + F.least(
                    F.col("sz_a") - F.col("pos_a"),
                    F.col("sz_b") - F.col("pos_b"),
                )
            )
            >= required
        )
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.min("pos_a").alias("_pa"), F.min("pos_b").alias("_pb"))
        .repartition(sc_p, "doc_a")
    )
    # exact verification on SUFFIX slices, not full arrays (round 10,
    # the heaviest-honest-row item): both docs' arrays are sorted by
    # the same global (df, sh) key, so every shared shingle sits
    # at-or-after the pair's FIRST shared one in both orders — the
    # intersection of the suffixes starting at that element IS the full
    # intersection. min(pos) over the surviving prefix-join rows
    # recovers that element exactly for every TRUE pair (its first
    # shared occurrence always passes the positional filter: its bound
    # ≥ the actual overlap ≥ required); for a FALSE pair the filter may
    # have dropped earlier shared occurrences, which can only SHRINK
    # the computed overlap below the already-failing true value — the
    # pair is discarded either way, so the output is unchanged. The
    # A-side slice runs BEFORE the doc_b join, so the second join's
    # shuffle carries suffixes, not full arrays. |A∪B| = |A|+|B|−|A∩B|.
    result = (
        cand.join(docarr.select(F.col("doc").alias("doc_a"), "shs"), "doc_a")
        .select(
            "doc_a",
            "doc_b",
            "sz_a",
            "sz_b",
            "_pb",
            F.slice(
                "shs", F.col("_pa"), F.col("sz_a") - F.col("_pa") + 1
            ).alias("_sa"),
        )
        .join(docarr.select(F.col("doc").alias("doc_b"), "shs"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "sz_a",
            "sz_b",
            F.size(
                F.array_intersect(
                    "_sa",
                    F.slice(
                        "shs",
                        F.col("_pb"),
                        F.col("sz_b") - F.col("_pb") + 1,
                    ),
                )
            ).alias("inter"),
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    # docarr stays persisted for the returned (lazy) plan's lifetime;
    # repeated calls re-cache a fresh copy, but MEMORY_AND_DISK blocks
    # are LRU-evicted by the block manager, so accumulation is bounded
    # by the storage pool. An eager-checkpoint-then-unpersist (the
    # minhash lifecycle) would free it deterministically, but collapses
    # the returned plan to an RDD scan and with it the pinned
    # broadcast-anti-join plan evidence — laziness wins here.
    return result


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 1024,
) -> DataFrame:
    """Asymmetric containment pairs: |A∩B|/|A| ≥ t OR |A∩B|/|B| ≥ t —
    the excerpt/quote case symmetric Jaccard structurally misses (a
    short document quoted inside a long one has containment ≈ 1 but
    tiny Jaccard). Same PPJoin-style substrate as
    :func:`ngram_jaccard_pairs` with two deliberate differences:

    * candidates come from the PREFIX(probe) × FULL(index) equi-join —
      containment of A in B requires ≥ ⌈t·|A|⌉ shared shingles, so the
      rare-first prefix bound holds for the CONTAINED side, but the
      containing side must stay fully indexed; running the probe over
      both roles covers both directions of the OR;
    * there is NO length filter — short-in-long is the signal, and the
      Jaccard pruning rule (min ≥ t·max) would delete exactly the pairs
      this operator exists to find.

    Verification intersects the two full shingle arrays once per
    candidate; both containments are exact int/int IEEE divisions
    (bit-identical across engines). Naive co-occurrence counting
    measured 30.5 s at sf1 / 79.7 s at sf3 — the prefix-filtered form
    exists because that absolute cost dominates the whole headline."""
    docarr, sc_p = _shingle_docarr(
        df, id_col, text_col, n, threshold, max_shingle_df
    )
    prefix = docarr.select("doc", F.explode("pre").alias("sh")).repartition(
        sc_p, "sh"
    )
    full = docarr.select("doc", F.explode("shs").alias("sh"))
    cand = (
        prefix.select(F.col("doc").alias("_dp"), "sh")
        .join(full.select(F.col("doc").alias("_df_"), "sh"), "sh")
        .where(F.col("_dp") != F.col("_df_"))
        .select(
            F.least("_dp", "_df_").alias("doc_a"),
            F.greatest("_dp", "_df_").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .repartition(sc_p, "doc_a")
    )
    return (
        cand.join(
            docarr.select(
                F.col("doc").alias("doc_a"),
                F.col("sz").alias("sz_a"),
                F.col("shs").alias("_sa"),
            ),
            "doc_a",
        )
        .join(
            docarr.select(
                F.col("doc").alias("doc_b"),
                F.col("sz").alias("sz_b"),
                F.col("shs").alias("_sb"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "sz_a",
            "sz_b",
            F.size(F.array_intersect("_sa", "_sb")).alias("inter"),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / F.col("sz_a")).alias("cont_a_in_b"),
            (F.col("inter") / F.col("sz_b")).alias("cont_b_in_a"),
        )
        .where(
            (F.col("cont_a_in_b") >= threshold)
            | (F.col("cont_b_in_a") >= threshold)
        )
    )


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str,
    n: int = 13,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document n-gram overlap with a benchmark/eval corpus.

    Training-data hygiene: before training, drop (or flag) corpus
    documents that share long word n-grams with an evaluation set — the
    standard "13-gram decontamination" recipe from the GPT-3 appendix,
    expressed Spark-first.

    Shape for 100 TB: the benchmark side is an eval set (thousands of
    rows), so its distinct shingle set is collected into a **broadcast**
    hash relation — the corpus-side shingle stream is probed map-side
    with NO shuffle of the corpus. The only shuffle is the final
    ``groupBy(doc)``, whose partial counts are map-side combined; the
    wire carries two longs per document. Nothing here is quadratic and
    no corpus-sized structure ever sits on one node.

    Output: one row per input document —
    ``(doc, n_shingles, n_overlap, contamination)`` where contamination
    is the exact int/int overlap fraction (0.0 for documents too short
    to produce a single n-gram — they cannot be contaminated).

    Round 10: both shingle streams are 64-bit hashed zip-style
    (:func:`_hashed_distinct_shingle_rows`) — only membership COUNTS
    reach the output, so identity-by-hash is the substrate's documented
    ~2⁻⁶⁴ argument and the DuckDB oracle's string-keyed counts are
    unchanged. The old corpus side (:func:`shingle_table` →
    :func:`word_shingles`) re-evaluated the tokenization expression per
    shingle position inside the transform lambda (O(len²) per doc) and
    materialized every n-gram string; measured 19.3 → 5.0 s at sf10
    for ``text_decontaminate``.
    """
    # the eval side needs no id, but the helper explodes (doc, sh) rows
    # — aliasing the TEXT column as the doc spine made every exploded
    # bench shingle row carry the whole document string until the
    # select (round-10 ADVICE). An xxhash64 surrogate keeps the spine
    # 8 bytes wide; the spine is dropped before the distinct, so hash
    # collisions between bench texts cannot affect the shingle SET.
    bench_sh = (
        _hashed_distinct_shingle_rows(
            benchmark.select(
                F.xxhash64(F.col(bench_text_col)).alias("_bid"),
                F.col(bench_text_col).alias("_bt"),
            ),
            "_bid",
            "_bt",
            n,
        )
        .select("sh")
        .distinct()
    )
    sh = _hashed_distinct_shingle_rows(docs, id_col, text_col, n)
    # ONE pass over the corpus shingle stream: the broadcast LEFT join
    # tags each shingle with a hit marker, and a single groupBy(doc)
    # yields both the size and the overlap (count of markers) — half the
    # explode work and one shuffle instead of two vs. computing
    # sizes/hits as separate aggregates.
    counts = (
        sh.join(
            F.broadcast(bench_sh.withColumn("_hit", F.lit(1))),
            "sh",
            "left",
        )
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_overlap"),
        )
    )
    # carry_cols ride along on the doc spine so callers need no join-back
    # to recover their own columns (docs must be unique per id for that —
    # which also makes a distinct() redundant; when no carry is asked
    # for, keep the id-only distinct so duplicate-id inputs still get
    # one output row, at the cost of shuffling bare ids, never text).
    all_docs = docs.select(
        F.col(id_col).alias("doc"), *[F.col(c) for c in carry_cols]
    )
    if not carry_cols:
        all_docs = all_docs.distinct()
    return (
        all_docs.join(counts, "doc", "left")
        .select(
            "doc",
            *carry_cols,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.coalesce("n_overlap", F.lit(0))
                / F.col("n_shingles").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 32,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicate pairs with SimHash hamming distance ≤
    ``max_hamming`` — the Manku-et-al banding construction.

    Pigeonhole guarantee: split the ``bits``-bit signature into
    ``max_hamming + 1`` equal bands; any pair within the hamming budget
    differs in at most ``max_hamming`` positions, so at least one band
    matches EXACTLY. Candidates therefore come from a band equi-join —
    never an all-pairs scan — and an exact per-pair hamming refine
    closes the filter. Same degenerate-bucket cap as
    :func:`minhash_lsh_pairs` (boilerplate floods collapse to one
    signature; those buckets are dropped by size before membership
    collection).

    Output: (doc_a, doc_b, hamming), doc_a < doc_b.
    """
    from pyspark import StorageLevel

    nb = max_hamming + 1
    if bits % nb:
        raise ValueError(f"bits ({bits}) must divide into {nb} bands")
    width = bits // nb
    sigs = simhash_bits(df, id_col, text_col, bits)
    # The signature rides the band explode as a BIGINT (round 11): the
    # per-pair hamming refine is then one codegen'd
    # bit_count(xor(_ia, _ib)) instead of splitting two ``bits``-char
    # strings into arrays and zip_with-comparing them per candidate
    # pair — higher-order functions are interpreted by Catalyst, and
    # the two array allocations per pair were the dominant term of the
    # refine. Identical hamming for equal-length 0/1 strings (popcount
    # of xor = count of differing positions; conv preserves leading
    # zeros), guarded to bits ≤ 63 so the signed-bigint conversion can
    # never overflow — wider signatures keep the array form.
    as_int = bits <= 63
    sig_col = (
        F.conv("simhash", 2, 10).cast("bigint")
        if as_int
        else F.col("simhash")
    )
    banded = sigs.select(
        "doc",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("band"),
    ).select(
        "doc",
        sig_col.alias("_sig"),
        "band",
        F.expr(f"substring(simhash, band * {width} + 1, {width})").alias(
            "bv"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    eligible = (
        banded.groupBy("band", "bv")
        .agg(F.count("*").alias("_bsz"))
        .where((F.col("_bsz") > 1) & (F.col("_bsz") <= max_bucket))
        .select("band", "bv")
    )
    cand = banded.join(eligible, ["band", "bv"])
    a = cand.select(
        "band", "bv", F.col("doc").alias("doc_a"), F.col("_sig").alias("_sa")
    )
    b = cand.select(
        "band", "bv", F.col("doc").alias("doc_b"), F.col("_sig").alias("_sb")
    )
    if as_int:
        ham = F.bit_count(
            F.col("_sa").bitwiseXOR(F.col("_sb"))
        ).cast("int")
    else:
        ham = F.size(
            F.filter(
                F.zip_with(
                    F.split(F.col("_sa"), ""),
                    F.split(F.col("_sb"), ""),
                    lambda x, y: x != y,
                ),
                lambda t: t,
            )
        )
    result = (
        a.join(b, ["band", "bv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    result = result.localCheckpoint(eager=True)
    banded.unpersist()
    return result


def incremental_dedup_flags(
    new_docs: DataFrame,
    existing_docs: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Flag each NEW document against an EXISTING corpus: exact
    duplicate (same content digest) and/or near duplicate (shares any
    MinHash-LSH band signature with an existing document) — the
    incremental-ingestion shape: when a new crawl increment lands, it is
    deduplicated against the corpus WITHOUT reprocessing the corpus.

    Output: one row per new document —
    ``(doc, is_exact_dup, is_near_dup)`` (booleans as 0/1 bigints for
    cross-engine hash stability).

    Scale shape: the existing side collapses to its distinct digest and
    (band, band_sig) KEY SETS (in production these are read from the
    persisted index the last ingest wrote — the corpus text is never
    re-scanned; here they are derived in one pass). Both probes are
    LEFT SEMI joins, which cannot explode: output ≤ |new batch| however
    hot a band bucket is, so no bucket cap is needed — the cap only
    exists on the PAIR-generation path. Wire cost: the new batch's
    digests and band sigs, plus the existing key sets, all hash
    equi-joins on uniform keys.
    """
    old_digests, old_bands = _dedup_keysets(
        existing_docs, id_col, text_col, n_hashes, bands, shingle_n
    )
    return _probe_dedup_keysets(
        new_docs, old_digests, old_bands, id_col, text_col,
        n_hashes, bands, shingle_n,
    )


def _dedup_keysets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    shingle_n: int,
) -> tuple[DataFrame, DataFrame]:
    """A corpus's dedup KEY SETS: distinct content digests and distinct
    (band, band_sig) MinHash-LSH signatures. Everything a future
    increment needs to dedup against this corpus — the text itself never
    has to be read again."""
    digests = docs.select(F.md5(F.col(text_col)).alias("digest")).distinct()
    bandsigs = (
        band_signatures(docs, id_col, text_col, n_hashes, bands, shingle_n)
        .select("band", "band_sig")
        .distinct()
    )
    return digests, bandsigs


def _probe_dedup_keysets(
    new_docs: DataFrame,
    old_digests: DataFrame,
    old_bands: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """Shared probe core: LEFT SEMI the new batch's digests and band
    signatures against the existing key sets (duplicate keys on the
    right side of a semi-join are harmless, so appended indexes need no
    re-distinct). Output ≤ |new batch| rows by construction."""
    new_digests = new_docs.select(
        F.col(id_col).alias("doc"),
        F.md5(F.col(text_col)).alias("digest"),
    )
    exact = (
        new_digests.join(old_digests, "digest", "left_semi")
        .select("doc")
        .withColumn("_e", F.lit(1))
    )
    new_bands = band_signatures(
        new_docs, id_col, text_col, n_hashes, bands, shingle_n
    )
    near = (
        new_bands.join(old_bands, ["band", "band_sig"], "left_semi")
        .select("doc")
        .distinct()
        .withColumn("_n", F.lit(1))
    )
    return (
        new_docs.select(F.col(id_col).alias("doc"))
        .join(exact, "doc", "left")
        .join(near, "doc", "left")
        .select(
            "doc",
            F.coalesce("_e", F.lit(0)).cast("bigint").alias("is_exact_dup"),
            F.coalesce("_n", F.lit(0)).cast("bigint").alias("is_near_dup"),
        )
    )


def save_dedup_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> None:
    """Materialize a corpus's dedup index for rolling-crawl reuse (the
    IVF-index-persistence pattern, ``similarity.save_ivf_index``): the
    digest and band-signature key sets as parquet, plus a 1-row params
    table so probes/appends reproduce the exact signature recipe. The
    params table carries the signature SCHEME tag (round 8): a probe
    recomputes band signatures with the library's current scheme, so
    an index written under a different scheme would silently match
    nothing on the near-dup side (exact dups still match via digest,
    masking the breakage) — the scheme check turns that into a loud
    rebuild instruction instead. The corpus text is scanned ONCE here;
    every later increment probes and appends key sets only."""
    digests, bandsigs = _dedup_keysets(
        docs, id_col, text_col, n_hashes, bands, shingle_n
    )
    digests.write.mode("overwrite").parquet(path + "/digests")
    bandsigs.write.mode("overwrite").parquet(path + "/bands")
    docs.sparkSession.createDataFrame(
        [(n_hashes, bands, shingle_n, MINHASH_SCHEME)],
        "n_hashes int, bands int, shingle_n int, scheme string",
    ).write.mode("overwrite").parquet(path + "/params")


def _dedup_index_params(spark, path: str) -> tuple[int, int, int]:
    p = spark.read.parquet(path + "/params").collect()[0]
    scheme = p["scheme"] if "scheme" in p.__fields__ else "md5-seeded-v1"
    if scheme != MINHASH_SCHEME:
        raise ValueError(
            f"dedup index at {path!r} was built with MinHash scheme "
            f"{scheme!r}, but this library computes {MINHASH_SCHEME!r} "
            "— band signatures would match nothing; rebuild the index "
            "with save_dedup_index"
        )
    return p["n_hashes"], p["bands"], p["shingle_n"]


def probe_dedup_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc",
    text_col: str = "text",
) -> DataFrame:
    """Flag a new batch against a PERSISTED dedup index — same output as
    :func:`incremental_dedup_flags` but the existing corpus contributes
    only its stored key sets: no corpus text is read (the probe plan
    scans ``{path}/digests`` and ``{path}/bands`` parquet, nothing
    else). Signature params come from the index so the recipe always
    matches what was saved."""
    spark = new_docs.sparkSession
    n_hashes, bands, shingle_n = _dedup_index_params(spark, path)
    return _probe_dedup_keysets(
        new_docs,
        spark.read.parquet(path + "/digests"),
        spark.read.parquet(path + "/bands"),
        id_col, text_col, n_hashes, bands, shingle_n,
    )


def append_dedup_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc",
    text_col: str = "text",
) -> None:
    """Fold increment N's keys into the index after ingest: append the
    increment's key sets (params read from the index, so signatures stay
    compatible). Appended keys may duplicate existing ones — harmless
    for semi-join probes (see :func:`_probe_dedup_keysets`); a periodic
    compaction can re-distinct if storage matters. Cost: one scan of the
    INCREMENT only — the accumulated corpus is never rescanned."""
    spark = new_docs.sparkSession
    n_hashes, bands, shingle_n = _dedup_index_params(spark, path)
    digests, bandsigs = _dedup_keysets(
        new_docs, id_col, text_col, n_hashes, bands, shingle_n
    )
    digests.write.mode("append").parquet(path + "/digests")
    bandsigs.write.mode("append").parquet(path + "/bands")


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS algorithm): hash every token k-gram, slide a window
    of ``w`` consecutive hashes, select each window's minimum; the
    distinct selected hashes are the document's fingerprints. Guarantees
    any shared substring of length >= w + k - 1 tokens contributes at
    least one shared fingerprint, at ~2/(w+1) the density of the full
    k-gram set — position-localized overlap detection that the
    bag-of-shingles Jaccard measure can't provide, at a fraction of the
    index size.

    Hashes are the md5-prefix 60-bit BIGINTs of the minhash family
    (order-preserving vs the oracle's 15-char hex strings, so min
    selection is engine-identical). Documents with at least one k-gram
    but fewer than ``w`` select the single global minimum (one covering
    window). No shuffle; output is the exploded (doc, fp) relation.

    One Arrow ragged-array kernel per partition (round 12 — the
    deferred round-11 "HOF sweep residue" item): tokenization semantics
    stay in Spark only for ``lower`` (engine-identical casing); the
    kernel splits on single spaces exactly like ``split(text, ' ')`` +
    empty filter, builds each k-gram by slicing the space-joined token
    string at token offsets (byte-identical to ``concat_ws(' ',
    tokens[i:i+k])``), takes the first 60 bits of ``hashlib.md5`` (==
    ``conv(substr(md5(gram), 1, 15), 16, 10)``: the first 15 hex chars
    ARE the top 60 bits of the digest), and computes the w-window
    sliding minima with one strided-view ``min`` per document. This
    replaces the interpreted ``transform`` wrapper around the md5
    k-gram hash plus the round-10 ``zip_with(least)`` doubling passes:
    Catalyst interprets higher-order functions (they do not codegen —
    the embed_random_projection finding), so every gram paid lambda
    dispatch + object churn around the md5, and every doubling pass
    allocated two slices per document. The (doc, fp) multiset is pinned
    against a pure-Python brute force for every w shape in
    tests/test_llm_ops.py and the cross-engine md5 oracle is unchanged.
    NULL texts and sub-k docs yield no rows, exactly like the
    ``CASE``/``explode`` form they replace; the output doc type follows
    the input id column."""
    src = df.select(
        F.col(id_col).alias("doc"), F.lower(F.col(text_col)).alias("_t")
    )
    doc_t = src.schema["doc"].dataType.simpleString()

    def gen(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        md5 = hashlib.md5
        swv = np.lib.stride_tricks.sliding_window_view
        for batch in batches:
            docs_col = batch.column(0)
            # Per-doc Python/numpy call overhead dominates at ~24
            # tokens/doc, so everything after the md5 loop is computed
            # ONCE per batch over flat ragged arrays: one strided
            # sliding-min over the concatenated hash stream with a
            # cumsum mask cancelling the windows that straddle document
            # boundaries, reduceat for the sub-w global minima, and one
            # lexsort for the per-doc distinct.
            buf = bytearray()
            ngs_l: list = []
            keep_docs: list = []
            for d, t in zip(docs_col.to_pylist(), batch.column(1).to_pylist()):
                if t is None:
                    continue
                toks = [x for x in t.split(" ") if x]
                ng = len(toks) - k + 1
                if ng < 1:
                    continue
                # slice k-grams out of ONE space-joined string at token
                # BYTE offsets — identical bytes to the utf-8 of
                # " ".join(toks[i:i+k]), no join allocation per gram
                joined = " ".join(toks)
                enc = joined.encode("utf-8")
                if len(enc) == len(joined):
                    starts = [0]
                    acc = 0
                    for x in toks:
                        acc += len(x) + 1
                        starts.append(acc)
                else:
                    starts = [0]
                    acc = 0
                    for x in toks:
                        acc += len(x.encode("utf-8")) + 1
                        starts.append(acc)
                mv = memoryview(enc)
                for i in range(ng):
                    buf += md5(mv[starts[i]: starts[i + k] - 1]).digest()[:8]
                ngs_l.append(ng)
                keep_docs.append(d)
            if not ngs_l:
                continue
            # first 8 digest bytes big-endian >> 4 == first 15 hex chars
            # (shift as uint64: values touch bit 63 before the shift)
            H = (
                np.frombuffer(bytes(buf), dtype=">u8") >> np.uint64(4)
            ).astype(np.int64)
            ngs = np.asarray(ngs_l, dtype=np.int64)
            nd = len(ngs)
            offs = np.zeros(nd + 1, dtype=np.int64)
            np.cumsum(ngs, out=offs[1:])
            doc_idx_parts = []
            fp_parts = []
            if len(H) >= w:
                wm = swv(H, w).min(axis=1)
                counts_w = np.maximum(ngs - w + 1, 0)
                delta = np.zeros(len(wm) + 1, dtype=np.int64)
                vd = counts_w > 0
                np.add.at(delta, offs[:-1][vd], 1)
                np.add.at(delta, (offs[:-1] + counts_w)[vd], -1)
                mask = np.cumsum(delta[:-1]) > 0
                # windows of doc d occupy consecutive flat positions
                # offs[d]..offs[d]+counts_w[d]-1, docs ascending, so the
                # masked values align with the repeat order
                fp_w = wm[mask]
                dx_w = np.repeat(np.arange(nd)[vd], counts_w[vd])
                # per-doc distinct: sort by (doc, fp), keep firsts
                order = np.lexsort((fp_w, dx_w))
                fp_w, dx_w = fp_w[order], dx_w[order]
                first = np.ones(len(fp_w), dtype=bool)
                first[1:] = (dx_w[1:] != dx_w[:-1]) | (fp_w[1:] != fp_w[:-1])
                doc_idx_parts.append(dx_w[first])
                fp_parts.append(fp_w[first])
                short = ~vd
            else:
                short = np.ones(nd, dtype=bool)
            if short.any():
                # 1 <= ng < w: the single global minimum (one covering
                # window), via one reduceat over all segments
                seg_min = np.minimum.reduceat(H, offs[:-1])
                doc_idx_parts.append(np.arange(nd)[short])
                fp_parts.append(seg_min[short])
            dx = np.concatenate(doc_idx_parts)
            fps = np.concatenate(fp_parts)
            try:
                docs_np = np.asarray(keep_docs, dtype=np.int64)
                out_doc = pa.array(docs_np[dx], type=docs_col.type)
            except (TypeError, ValueError, OverflowError):
                obj = np.asarray(keep_docs, dtype=object)
                out_doc = pa.array(obj[dx].tolist(), type=docs_col.type)
            yield pa.RecordBatch.from_arrays(
                [out_doc, pa.array(fps, type=pa.int64())],
                names=["doc", "fp"],
            )

    return src.mapInArrow(gen, f"doc {doc_t}, fp bigint")


def winnowing_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 3,
    max_fp_df: int = 1024,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints —
    the MOSS match report. Candidates come only from the fingerprint
    equi-join (grouped-array pair generation, the ngram_jaccard_pairs
    recipe: map-side (i < j) pairs per fingerprint group, no self-join
    shuffle of the corpus); fingerprints whose document frequency
    exceeds ``max_fp_df`` are boilerplate and are dropped via the
    broadcast anti-join cap BEFORE any pair is generated, bounding the
    per-fingerprint fan-out. Fingerprint sets are distinct per doc, so
    the per-pair group count IS the shared-fingerprint count; pairs
    ride the counting shuffle as single packed BIGINTs (doc_a << 31 |
    doc_b, id range asserted in-plan) since mostly-unique pair keys
    defeat partial aggregation and every key byte is shuffle volume.

    ONE fingerprint shuffle (round 7): the exploded (doc, fp) relation
    is repartitioned by fp once and persisted; the document-frequency
    count, the hot-fp cut (broadcast anti-join) and the per-fp group
    arrays all reuse that partitioning with zero further Exchange —
    the previous shape recomputed the fingerprint HOF pipeline twice
    and shuffled it twice (measured ~30% of sf1 wall). The returned
    DataFrame exposes ``unpersist_sources()`` to release the cached
    relation after materialization."""
    from pyspark import StorageLevel

    sc_p = df.sparkSession.sparkContext.defaultParallelism
    fpt = (
        winnowing_fingerprints(df, id_col, text_col, k, w)
        .repartition(sc_p, "fp")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # groupBy(fp) on the fp-repartitioned cache: no Exchange
    dfs = fpt.groupBy("fp").agg(F.count("*").alias("_df"))
    hot = dfs.where(F.col("_df") > max_fp_df).select("fp")
    kept = fpt.join(F.broadcast(hot), "fp", "left_anti")
    grouped = kept.groupBy("fp").agg(
        F.array_sort(F.collect_list("doc")).alias("ds")
    )
    # The pair stream (~7.4x the kept fp rows at sf10) dominates the
    # operator: its rows are mostly-unique keys, so partial aggregation
    # cannot shrink the shuffle and every byte of the pair key rides
    # the wire. Each (doc_a < doc_b) pair therefore packs into ONE
    # BIGINT (doc_a << 31 | doc_b) — ~40% less shuffle volume and a
    # single-word agg key versus a two-field struct row. Validity
    # (0 <= id < 2^31) is asserted IN-PLAN on each sorted group's
    # bounds, so out-of-range ids fail loudly instead of colliding.
    # The pack casts to BIGINT FIRST (round-7 ADVICE): Spark's
    # shiftleft is width-of-operand, so shiftleft(int32, 31) wraps to
    # -2^31 for every positive id — the value-range guard would pass
    # while every packed pair key is garbage. Casting makes the shift
    # 64-bit for any integral id column.
    guard = F.expr(
        "assert_true(size(ds) < 2 OR "
        "(element_at(ds, 1) >= 0 AND element_at(ds, -1) < 2147483648), "
        "'winnowing_pairs: packed pair keys require doc ids in "
        "[0, 2^31)')"
    )
    # assert_true returns NULL on success (row kept) and throws on
    # violation; `.isNull()` — never OR'd with a literal, which
    # BooleanSimplification would fold away, deleting the guard
    # In-bucket combinations via TWO chained Generate nodes (round 12 —
    # the minhash_lsh_pairs r11 change applied to the remaining caller):
    # explode the anchor position, then explode the strict suffix slice
    # — Generate/element_at/slice are codegen, while the nested
    # F.transform struct tower was interpreted per element. Same pair
    # set: ds is sorted and distinct per fingerprint, so doc_a < doc_b
    # and every (i < j) combination appears exactly once.
    # size filter first: unlike minhash's bucket-eligibility pass,
    # single-doc fingerprint groups reach this point, and
    # sequence(1, 0) DESCENDS ([1, 0]) instead of returning empty
    out = (
        grouped.where(guard.isNull())
        .where(F.size("ds") >= 2)
        .select(
            "ds",
            F.explode(F.sequence(F.lit(1), F.size("ds") - 1)).alias("_i"),
        )
        .select(
            F.element_at("ds", F.col("_i")).alias("_a"),
            F.explode(
                F.slice(
                    F.col("ds"), F.col("_i") + 1, F.size("ds") - F.col("_i")
                )
            ).alias("_b"),
        )
        .select(
            (
                F.shiftleft(F.col("_a").cast("bigint"), 31)
                + F.col("_b").cast("bigint")
            ).alias("pk")
        )
        .groupBy("pk")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
        .select(
            F.shiftright("pk", 31).alias("doc_a"),
            (F.col("pk") % F.lit(2147483648)).alias("doc_b"),
            "shared",
        )
    )
    from polars_gdal_spark.functions import attach_unpersist

    return attach_unpersist(out, fpt)
