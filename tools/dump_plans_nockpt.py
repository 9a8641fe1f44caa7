"""Like dump_plans.py, but with DataFrame.localCheckpoint patched to a
no-op while BUILDING the query, so iterative queries whose returned
DataFrame is checkpoint-backed (graph_pagerank) print their full
per-iteration lineage instead of a single RDD scan. The patch is
evidence-generation only — it never runs in library or bench code — and
does not alter the per-iteration plan shape (checkpointing only
truncates lineage between iterations).

Usage: python tools/dump_plans_nockpt.py <repo_root> <sf_dir> <out_dir> <suffix> q1 [...]
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo_root, sf_dir, out_dir, suffix = sys.argv[1:5]
    names = sys.argv[5:]
    sys.path.insert(0, repo_root)
    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame,
    # which overrides the abstract pyspark.sql.DataFrame — patch the
    # concrete class or the patch never resolves.
    from pyspark.sql.classic.dataframe import DataFrame

    from polars_gdal_spark.queries import QUERIES
    from polars_gdal_spark.session import get_spark

    spark = get_spark("dump_plans_nockpt")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    orig = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore
    try:
        for name in names:
            df = QUERIES[name].func(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(
                    f"== {name} @ {sf_dir} ({suffix}; localCheckpoint "
                    "patched to identity so the full iterative lineage "
                    "prints)\n\n"
                )
                f.write(txt)
            print(f"wrote {path} ({len(txt)} chars)")
    finally:
        DataFrame.localCheckpoint = orig  # type: ignore
    spark.stop()


if __name__ == "__main__":
    main()
