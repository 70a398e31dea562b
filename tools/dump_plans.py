"""Dump .explain('formatted') for named registry queries to files.

Usage:
    python tools/dump_plans.py <outdir> <suffix> [query ...]

Writes <outdir>/<query>_<suffix>.txt for each query (all registry queries
when none are named).  Plans are captured against $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) — plan SHAPE is sf-independent for these
queries; only AQE runtime stats differ.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sparklog.queries import REGISTRY, release_caches
    from sparklog.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if not names:
        names = list(REGISTRY)
    for name in names:
        fn = REGISTRY[name][0]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        release_caches()
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
