"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/dump_plans.py <repo_root> <sf_dir> <out_dir> <suffix> q1 [q2 ...]

Writes <out_dir>/<query>_<suffix>.txt for each query. Used to produce the
plans/r11/<query>_{before,after}.txt evidence pairs (run once against the
round-10 checkout for "before", once against HEAD for "after").
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo_root, sf_dir, out_dir, suffix = sys.argv[1:5]
    names = sys.argv[5:]
    sys.path.insert(0, repo_root)
    from polars_gdal_spark.queries import QUERIES
    from polars_gdal_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name].func(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ({suffix})\n\n")
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
