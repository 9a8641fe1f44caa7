"""Operator function library.

``geo``        — geometry format conversions (WKB/WKT/GeoJSON), the only
                 scalar functions the reference owns (§2.B5/§2.C5).
``text``       — text analysis: tokenization, quality scoring, language ID,
                 fingerprinting.
``dedup``      — exact + near-duplicate detection (hash, MinHash-LSH,
                 SimHash, n-gram Jaccard).
``similarity`` — embedding similarity search (exact cosine top-k, LSH
                 bucketed variant).
``multimodal`` — opaque-binary-payload column conventions + stubbed decode.

All functions are column-expression builders or DataFrame transformers:
JVM-side built-ins wherever possible (whole-stage codegen), Arrow-batched
pandas UDFs only where built-ins can't express the op. No driver-side
collects anywhere.
"""


def attach_unpersist(df, *relations):
    """Attach the round-7 ``unpersist_sources()`` hook: operators that
    persist internal relations (the kNN site table, the winnowing
    fingerprint shuffle) return their plan with this callable so
    library callers looping over many invocations can release the
    caches after materialization (the bench's clearCache hid the
    leak). One shared implementation — the hook contract must not
    drift between operators.

    CAVEAT: the attribute lives on THIS DataFrame object only; any
    further transformation (``df.where(...)``, ``df.select(...)``)
    returns a new DataFrame without it, so capture the hook before
    deriving from the result.
    """

    def unpersist_sources():
        return [r.unpersist() for r in relations]

    df.unpersist_sources = unpersist_sources
    return df
