"""Physical-plan regression tests: every scale-critical plan property
asserted by tools/explain_audit.py, run as part of the suite. Only the
plan is generated (no job executes), so this is cheap at any SF."""

from __future__ import annotations

import pytest

from polars_gdal_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

from tools.explain_audit import EXPECT


def _plan(spark, name: str) -> str:
    if name == "dedup_ngram_jaccard":
        # max_shingle_df=8 makes the DF cap actually drop rows at
        # SF_SMOKE (with the default cap nothing is hot).
        from polars_gdal_spark.functions import dedup as D
        from polars_gdal_spark.queries.dedup import _augmented

        df = D.ngram_jaccard_pairs(
            _augmented(spark, SF_SMOKE), "doc", "text",
            n=3, threshold=0.3, max_shingle_df=8,
        )
    else:
        df = QUERIES[name].func(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize("name", sorted(EXPECT))
def test_plan_shape(spark, name):
    plan = _plan(spark, name).lower()
    for want in EXPECT[name]:
        if want.startswith("!"):
            assert want[1:].lower() not in plan, f"{name}: found {want[1:]}"
        else:
            assert want.lower() in plan, f"{name}: missing {want}"
