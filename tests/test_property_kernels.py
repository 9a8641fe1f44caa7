"""Property-based tests (hypothesis) for the cross-engine arithmetic
kernels — no SparkSession needed: each property pins the DuckDB side of
an oracle identity against an independent pure-python reference, so a
drift in either engine's semantics (hex parsing, bit ops, bin()) fails
here in milliseconds instead of as a mysterious oracle hash mismatch."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from polars_gdal_spark.functions.layout import morton_sql

u16 = st.integers(min_value=0, max_value=65535)
posint = st.integers(min_value=1, max_value=2**52)


def _interleave_ref(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=200, deadline=None)
@given(u16, u16)
def test_morton_sql_matches_bitwise_reference(a, b):
    got = duckdb.sql(
        f"SELECT {morton_sql(str(a), str(b))}"
    ).fetchone()[0]
    assert got == _interleave_ref(a, b)


@settings(max_examples=200, deadline=None)
@given(posint)
def test_duckdb_bin_length_is_bit_length(n):
    """The quantized-log2 identity every integer-exact 'log' in the
    oracle suite rests on (DSIR, adaptive planes, BM25 idf)."""
    got = duckdb.sql(f"SELECT length(bin(CAST({n} AS BIGINT)))").fetchone()[0]
    assert got == n.bit_length()


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=1, max_size=20))
def test_duckdb_hex_prefix_parse_matches_python(s):
    """md5-prefix bucketing parity: DuckDB's '0x'||hex cast and python's
    int(hex, 16) must agree on every md5 prefix (the DSIR bucket key)."""
    import hashlib

    hx = hashlib.md5(s.encode("utf-8")).hexdigest()[:6]
    got = duckdb.sql(
        f"SELECT CAST(('0x' || substr(md5(?), 1, 6)) AS BIGINT)",
        params=[s],
    ).fetchone()[0]
    assert got == int(hx, 16)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), max_size=40))
def test_cusum_closed_form_matches_recurrence(ys):
    """The window-parallel CUSUM identity events_cusum_drift rests on:
    ``max(0, s_prev + y)`` unrolled equals ``P_i - min(0, min_j P_j)``
    (prefix sum minus clamped running min) at every position."""
    s, out_rec = 0, []
    for y in ys:
        s = max(0, s + y)
        out_rec.append(s)
    p, mn, out_closed = 0, 0, []
    for y in ys:
        p += y
        mn = min(mn, p)
        out_closed.append(p - min(0, mn))
    assert out_rec == out_closed


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-10**6, max_value=10**6), max_size=30))
def test_duckdb_running_min_window_matches_python(ys):
    """The oracle's cumulative-min window must agree with the python
    running min the closed form assumes (ordering + frame semantics)."""
    if not ys:
        return
    rows = ", ".join(f"({i}, {y})" for i, y in enumerate(ys))
    got = [
        r[0]
        for r in duckdb.sql(
            f"SELECT min(y) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) "
            f"FROM (VALUES {rows}) t(i, y) ORDER BY i"
        ).fetchall()
    ]
    ref, m = [], None
    for y in ys:
        m = y if m is None else min(m, y)
        ref.append(m)
    assert got == ref


# BPE merge kernel: the trainer/encoder rely on replace() applying ALL
# non-overlapping occurrences left-to-right identically in both engines.
# With the wrapped-token representation matches can never share
# characters, so any sane replace agrees — this property pins DuckDB's
# semantics against Python's str.replace (Spark's StringReplace has the
# same contract).
_tok = st.text(alphabet="ab", min_size=1, max_size=3)
_word = st.lists(_tok, min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(_word, _tok, _tok)
def test_duckdb_replace_matches_python_on_wrapped_tokens(toks, a, b):
    w = "".join(f"({t})" for t in toks)
    pat, rep = f"({a})({b})", f"({a}{b})"
    got = duckdb.sql(
        "SELECT replace(?, ?, ?)", params=[w, pat, rep]
    ).fetchone()[0]
    assert got == w.replace(pat, rep)


# Interval-join bucketization (queries/relational.join_interval_binned):
# completeness requires that whenever a point falls inside a window, the
# point's bucket is one of the window's exploded buckets — for ANY
# epoch-micros values and the fixed bucket width. Floor-div (not float
# division) is what makes this hold at 2^50-scale integers.
_W = 1_800_000_000
_us = st.integers(min_value=0, max_value=2**50)


@settings(max_examples=300, deadline=None)
@given(_us, _us)
def test_interval_bucketization_is_complete(t, lo):
    hi = lo + _W
    if not (lo <= t < hi):
        return
    point_bucket = t // _W
    window_buckets = range(lo // _W, (hi - 1) // _W + 1)
    assert point_bucket in window_buckets
