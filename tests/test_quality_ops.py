"""Semantic pins for the round-8 quality/budget operators.

The oracle gate proves engine-equivalence; these tests pin the
SEMANTICS a user relies on:

* ``dedup_quality_resolve`` keeps each cluster's highest-quality
  member — including when that is NOT the min-id doc (the one case
  that distinguishes it from ``dedup_near_resolve``);
* ``pipeline_token_budget`` fills each source greedily to (and never
  past) its quota;
* ``text_gopher_rules``' ``keep`` is exactly the conjunction of the
  per-rule verdicts.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from polars_gdal_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_quality_resolve_keeps_best_not_min(spark):
    from polars_gdal_spark.functions import dedup as D
    from polars_gdal_spark.functions import text as T
    from polars_gdal_spark.queries.dedup import _augmented

    kept = {
        r.doc
        for r in QUERIES["dedup_quality_resolve"].func(spark, SF).collect()
    }
    aug = _augmented(spark, SF)
    pairs = D.minhash_lsh_pairs(aug, "doc", "text", 16, 4, 3)
    comp = D.connected_components(pairs)
    c = F.col("text")
    qual = aug.select(
        "doc", (T.stopword_count(c) / T.token_count(c)).alias("q")
    )
    rows = comp.join(qual, "doc").collect()
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    assert by_comp, "fixture corpus must produce near-dup clusters"
    saw_non_min_winner = False
    for members in by_comp.values():
        best = max(members, key=lambda r: (r.q, -r.doc))
        min_id = min(m.doc for m in members)
        for m in members:
            assert (m.doc in kept) == (m.doc == best.doc), (
                f"cluster {sorted(x.doc for x in members)}: kept set "
                f"disagrees with argmax-quality at doc {m.doc}"
            )
        if best.doc != min_id:
            saw_non_min_winner = True
    # the semantic must actually be exercised: at least one cluster's
    # winner differs from the min-id rule, else this test proves nothing
    # beyond dedup_near_resolve
    assert saw_non_min_winner


def test_token_budget_greedy_and_capped(spark):
    rows = QUERIES["pipeline_token_budget"].func(spark, SF).collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, sel in by_src.items():
        total = sum(r.ntok for r in sel)
        assert total <= 600, f"{src} exceeds its quota: {total}"
        assert max(r.cum_tok for r in sel) == total


def test_token_budget_maximality(spark):
    """The first document NOT selected from a source would overflow the
    quota — the fill is greedy in rank order, not an arbitrary subset."""
    from polars_gdal_spark.functions import text as T
    from polars_gdal_spark.queries import load_tables

    sel = QUERIES["pipeline_token_budget"].func(spark, SF).collect()
    picked = {r.doc_id for r in sel}
    spent = {}
    for r in sel:
        spent[r.source] = max(spent.get(r.source, 0), r.cum_tok)
    docs = load_tables(spark, SF)["documents"]
    ntok = T.token_count(F.col("text"))
    ranked = docs.select(
        "doc_id",
        "source",
        ntok.alias("ntok"),
        (T.stopword_count(F.col("text")) / ntok).alias("q"),
    ).collect()
    by_src: dict[str, list] = {}
    for r in ranked:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (-r.q, r.doc_id))
        for r in rows:
            if r.doc_id not in picked:
                assert spent.get(src, 0) + r.ntok > 600
                break


def test_gopher_keep_is_rule_conjunction(spark):
    rows = QUERIES["text_gopher_rules"].func(spark, SF).collect()
    assert rows
    n_keep = 0
    for r in rows:
        assert r.keep == (
            r.r_words
            and r.r_word_len
            and r.r_alpha
            and r.r_symbol
            and r.r_stopwords
        )
        n_keep += bool(r.keep)
    # thresholds are corpus-adapted so the filter splits non-trivially
    assert 0 < n_keep < len(rows)


def _mixed_case_sf_dir(tmp_path, docs):
    """Clone the sf0.001 table set with a hand-built documents table —
    the registry queries take an sf dir, so semantic pins on corpus
    CONTENT build one."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sfmx"
    d.mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"/root/testdata/sf0.001/{name}.parquet", d)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in docs], pa.int64()),
            "text": pa.array([r[1] for r in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array([r[2] for r in docs], pa.string()),
            "n_chars": pa.array(
                [len(r[1]) for r in docs], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_stopword_rules_are_case_insensitive(spark, tmp_path):
    """Round-9 ADVICE: the fixture corpus is lowercase, so the oracle
    gate cannot distinguish stopword_count(lower(c)) from
    stopword_count(c) — pin the lowercased semantic on mixed-case text
    so a regression to case-sensitive counting fails HERE."""
    # doc 0: stopwords appear ONLY capitalized — case-sensitive
    # counting sees 0 (< 2 => r_stopwords False), lowercased sees 4
    filler = " ".join(f"w{i}" for i in range(30))
    docs = [
        (0, "The It And But " + filler, "g"),
        (1, "zz yy xx " + filler, "g"),  # no stopwords either way
    ]
    rows = {
        r.doc_id: r
        for r in QUERIES["text_gopher_rules"]
        .func(spark, _mixed_case_sf_dir(tmp_path, docs))
        .collect()
    }
    assert rows[0].r_stopwords, (
        "capitalized stopwords must count (lowercased semantics)"
    )
    assert not rows[1].r_stopwords


def test_token_budget_quality_is_case_insensitive(spark, tmp_path):
    """Same pin for pipeline_token_budget's quality ratio: the greedy
    rank must order by stopword_count(lower(text))/ntok."""
    n = 400  # each doc alone fits the 600-token budget; both don't
    caps = ("The It And But Not She May Out Who Now " * (n // 10)).split()
    low = ["the"] + [f"w{i}" for i in range(n - 1)]
    docs = [
        (0, " ".join(caps), "mx"),  # q=1.0 lowercased, 0.0 otherwise
        (1, " ".join(low), "mx"),  # q=1/400 under either counting
    ]
    sel = (
        QUERIES["pipeline_token_budget"]
        .func(spark, _mixed_case_sf_dir(tmp_path, docs))
        .collect()
    )
    picked = {r.doc_id for r in sel if r.source == "mx"}
    # lowercased ranking picks doc 0 first and doc 1 overflows;
    # case-sensitive ranking would pick doc 1 instead
    assert picked == {0}
