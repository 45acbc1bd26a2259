"""Capture ``explain("formatted")`` output for declared queries.

Optimization-round evidence tool: writes
``plans/<round>/<query>_<suffix>.txt`` for each named ``queries()`` entry
so before/after plan shapes are committable artifacts. Usage::

    python tools/capture_plans.py <suffix> <query> [query ...]

Runs at sf0.01 (plan SHAPE is scale-independent; fixtures stay cheap).
The round subdir comes from ``$SPARK_GRAFT_PLAN_ROUND`` (default r16).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(REPO, "plans",
                   os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16"))


def main():
    if len(sys.argv) < 3:
        print("usage: python tools/capture_plans.py <suffix> "
              "<query> [query ...]", file=sys.stderr)
        return 2
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    q = entry.queries()
    unknown = [n for n in names if n not in q]
    if unknown:
        print(f"unknown queries: {unknown} (see queries() in "
              "__spark_entry__.py)", file=sys.stderr)
        return 2
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = q[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path, flush=True)


if __name__ == "__main__":
    sys.exit(main())
