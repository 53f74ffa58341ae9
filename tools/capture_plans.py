"""Capture .explain("formatted") for headline queries into
plans/$SPARK_GRAFT_PLANS_ROUND/ (default r11).

Usage:
    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]

With no query names, captures every bench.HEADLINE query. Output:
plans/<round>/<query>_<tag>.txt. Re-running overwrites — capture
"before" once at the pre-optimization commit, "after" as queries are
touched.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from spotify_podcasts_airflow_batch_spark.plans.registry import all_queries
    from spotify_podcasts_airflow_batch_spark.session import get_spark

    registry = all_queries()
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        q = registry.get(name)
        if q is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        df = q.spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
