"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
LLM-pipeline operators), as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — matching DuckDB SQL for every SQL-expressible query.

The real inventory lives in ``polars_gdal_spark.queries``; this module is
a thin adapter so the driver and the library share one registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from polars_gdal_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3-style shipping priority) on sf0.001."""
    return QUERIES["q3_shipping_priority"].func(spark, "/root/testdata/sf0.001")


def _last_verified_round() -> dict[str, int]:
    """Map query name -> latest driver round with a green (hash_match) row.

    Round 1 showed the driver's CORRECTNESS sweep may stop before the full
    registry (exactly the first 50 dict keys got rows). With every query now
    carrying at least one green row, a static "unverified first" ordering
    would degenerate to registration order and re-verify the same 50
    forever; instead each sweep refreshes the *stalest* verifications.
    """
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError, IndexError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                last[name] = max(last.get(name, 0), rnd)
    return last


# Queries whose implementation or parameters changed, mapped to the
# round the change landed in: a green driver row from an EARLIER round
# no longer attests the current code, so such entries sort as
# never-verified until a green row at round >= the change round lands
# — after which they expire automatically (round-7 ADVICE: the old
# hand-maintained set kept pinning already-re-verified queries at the
# head of every sweep, displacing genuinely-stale rows).
CHANGED_IN_ROUND = {
    # (r10 entries expired: all 8 landed green r10 driver rows —
    # CORRECTNESS_r10.json — so they sort by staleness again)
    # r10: support count rides a packed-bigint pair key with an in-plan
    # assert_true range guard (identical edge set; plan change) — the
    # round-10 rewrite shipped WITHOUT this entry (round-10 ADVICE), so
    # its last green row (r09) predates the plan it would attest.
    # r11: edge materialization adaptive on scan stats (plain shape
    # below the 500 MB threshold, so the driver-gate-scale plan is the
    # r10 one; entry bumped to cover both changes)
    "graph_triangle_participation": 11,
    # (dedup_minhash_estimate: r11 tried persisting the candidate
    # relation per round-10 ADVICE — measured 19.7 -> 23.5/37.3 s at
    # sf10 and REVERTED, so its plan is exactly the r10-attested one)
    # r11: benchmark-side shingle spine is an xxhash64 surrogate, not
    # the full text string (same shingle set; code change only — the
    # r11 before/after explains in plans/r11/ show Catalyst had already
    # pruned the spine, so the physical plan is unchanged)
    "text_decontaminate": 11,
    "pipeline_training_prep_v2": 11,
    # r11: per-iteration contribution stream rebuilt from the CLOSED
    # FORM of the synthetic graph (explode two destinations per rank
    # row, per-row degree expression) — the edges-union build, the
    # out-degree groupBy shuffle and the edges⋈outdeg⋈ranks join chain
    # are gone from every iteration (plans/r11/graph_pagerank_*_full).
    # Contribution multiset identical, ranks bit-equal vs the unchanged
    # oracle (cell-exact PASS at sf0.001/0.01/0.1 recorded in
    # OPTIMIZATION_r11.md).
    "graph_pagerank": 11,
    # r11: vocabulary count folded into the bigram-type relation via
    # (token, NULL) sentinel rows for 1-token docs — the second full
    # tokenization (explode + exact distinct over the occurrence
    # stream) is gone; sentinels are filtered from c2 and can never
    # match the inner scoring join, so the output rows are identical
    # (cell-exact PASS at sf0.001/0.01/0.1; ~1.5 s off the sf10 row).
    "text_bigram_lm_score": 11,
    # r11: connected_components gained a hybrid finish — edge sets
    # within the single-task memory ceiling (default 8M symmetric
    # edges, env SPARK_GRAFT_CC_LOCAL_MAX_EDGES) are solved exactly in
    # ONE Arrow task by vectorized min-label pointer-doubling instead
    # of 6+ rounds of broadcast+shuffle+checkpoint+count jobs; above
    # the ceiling the distributed loop is unchanged. Identical
    # (doc, component) relation (A/B-asserted at sf0.001/sf10; all four
    # queries cell-exact vs their unchanged oracles at
    # sf0.001/0.01/0.1). sf10: components 21.2->11.3 s, quality_resolve
    # 24.4->19.0 s, near_resolve 17.4->15.3 s, embedding_cosine
    # ->10.8 s.
    "dedup_components": 11,
    "dedup_near_resolve": 11,
    "dedup_quality_resolve": 11,
    "dedup_embedding_cosine": 11,
    # r11: the 16-projection F.aggregate(F.zip_with(...)) tower is one
    # mapInArrow int64 GEMM per batch (HOFs are interpreted, not
    # codegen'd — the SRP-keys lesson applied to the JL projection):
    # 5.2-5.8 -> ~0.5 s at sf10, exceptAll-identical, oracle unchanged
    # (cell-exact PASS at sf0.001/0.01/0.1).
    "embed_random_projection": 11,
    # r11: hamming refine is bit_count(xor) over the signature carried
    # as BIGINT through the band explode, replacing the per-pair
    # split+zip_with array compare (interpreted HOF). Identical values
    # (popcount of xor = differing positions; bits<=63 guard), oracle
    # cell-exact at all three SFs; measured neutral at registry
    # candidate densities (the signature build dominates) — kept for
    # the codegen refine + narrower banded persist.
    "dedup_simhash_pairs": 11,
    # r11: minhash_lsh_pairs' in-bucket combination explode is two
    # chained Generate nodes (explode anchor position, explode suffix
    # slice) instead of the nested interpreted F.transform struct tower
    # — same sorted-docs pair set (exceptAll-identical), all-codegen;
    # isolated pair stage 0.68-1.13 -> 0.51-0.65 s at sf10 (same-JVM
    # alternating A/B). The three CC-family consumers above already
    # carry r11 entries; these are the remaining callers.
    "dedup_minhash_lsh": 11,
    "dedup_lsh_recall": 11,
    "dedup_minhash_estimate": 11,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered oldest-verification-first: never-verified queries (round 0)
    lead, then ascending round of last green driver check, ties broken by
    registration order — except ``CHANGED_IN_ROUND`` members whose last
    green row predates their change round, which sort as never-verified.
    A 50-query sweep therefore always refreshes the 50 stalest rows plus
    anything whose code changed since its last green row.
    """
    unknown = set(CHANGED_IN_ROUND) - set(QUERIES)
    if unknown:
        # a typo'd or renamed entry would silently skip the forced
        # re-verification this map exists to guarantee
        raise ValueError(
            f"CHANGED_IN_ROUND names unknown queries: {sorted(unknown)}"
        )
    last = _last_verified_round()
    order = {name: i for i, name in enumerate(QUERIES)}

    def _key(n: str):
        forced = last.get(n, 0) < CHANGED_IN_ROUND.get(n, 0)
        return (0 if forced else last.get(n, 0), order[n])

    names = sorted(QUERIES, key=_key)
    return {name: QUERIES[name].func for name in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in QUERIES.items()
        if spec.oracle is not None
    }
