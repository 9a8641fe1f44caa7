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
