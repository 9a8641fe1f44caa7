"""Python UDTFs (user-defined TABLE functions) — the SURVEY §2.L
escape hatch for logic whose OUTPUT is tabular per input row and whose
semantics the built-in expression language can't produce.

The worked example: PII span extraction. ``pii_scrub``
(functions/text.py) redacts matches with pure JVM regex — the right
tool when you only need the cleaned text. An ANNOTATION pipeline needs
the (kind, start, end) spans themselves (to build redaction audits or
NER-style training labels), and Spark's ``regexp_extract_all`` returns
match strings without offsets — offsets require a per-row iterator,
which is exactly what a UDTF is: each input row expands to zero or more
typed output rows via ``LATERAL``.

Scale notes: UDTFs execute on executors over the partitioned input
(Arrow-batched with ``useArrow=True``); a lateral UDTF join is a narrow
transform — no shuffle, parallelism equals the scan's. Python executes
per row, so this stays the slow path reserved for what JVM expressions
cannot say; the patterns here are precompiled once per worker at class
import, not per row.

Reference parity: the reference's Rust crate exposes no UDF surface at
all (SURVEY §2.L); this demonstrates the engine-side extension point.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

from polars_gdal_spark.functions.text import PII_PATTERNS

_COMPILED = [(kind, re.compile(pat)) for kind, pat in PII_PATTERNS.items()]


@udtf(returnType="kind string, match string, start int, end int")
class PiiSpans:
    """One output row per PII match in the input text: the match kind
    (email/ipv4/phone), the matched string, and its [start, end) char
    span. Same patterns as ``pii_scrub``, so counts reconcile."""

    def eval(self, text):  # noqa: ANN001 — UDTF eval signature
        for kind, rx in _COMPILED:
            for m in rx.finditer(text or ""):
                yield kind, m.group(0), m.start(), m.end()


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL use:

    ``SELECT d.doc_id, s.* FROM docs d, LATERAL pii_spans(d.text) s``
    """
    spark.udtf.register("pii_spans", PiiSpans)
