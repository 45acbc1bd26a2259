"""TPC-H sf1 spot-run: q1 / q6 / q9 / q18 one order of magnitude above
the bench scale factor.

VERDICT r11 task #7: the ×10 scale probe covers writes/dedup and three
TPC-H plans at ×10 replicas of sf0.1, but the 2×-of-baseline perf gate
was only ever measured AT sf0.1. This runs four representative TPC-H
shapes — q1 (wide scan+agg), q6 (pushdown filter+agg), q9 (5-way join
with two dimension broadcasts), q18 (self-join on a HAVING subquery) —
on a faithful ×10 upscale of sf0.1 (≈ sf1) and prints per-query minima
alongside the sf0.1 minima from the same session.

"Faithful" = every FK stays aligned across replicas: orders/lineitem
shift o_orderkey/l_orderkey by the orders stride, customer and
o_custkey shift by the customer stride, part/supplier and
l_partkey/l_suppkey by theirs; nation/region are fixed-size dimensions
and stay as-is (exactly like real TPC-H, where they don't scale).

Usage::

    python tools/tpch_sf1_probe.py [base_sf_dir] [runs]
    # defaults: /root/testdata/sf0.1  2

Output: JSON lines per run, then a final line with sf0.1 minima, sf1
minima, and the scale factor per query. Pass/fail bar (recorded in
PLANS.md): each query's sf1 time <= 2 x (10 x its sf0.1 time) — i.e.
within the 2x gate of linear scaling, the same bar the driver bench
applies at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTOR = 10
QUERIES = ("tpch_q1", "tpch_q6", "tpch_q9", "tpch_q18")


def build_sf1(spark, base: str, out: str) -> None:
    from pyspark.sql import functions as F

    from hoodie_spark.sources import load_table

    os.makedirs(out, exist_ok=True)
    orders = load_table(spark, base, "orders")
    customer = load_table(spark, base, "customer")
    part = load_table(spark, base, "part")
    supplier = load_table(spark, base, "supplier")
    strides = {
        "orders": orders.agg(F.max("o_orderkey")).first()[0] + 1,
        "customer": customer.agg(F.max("c_custkey")).first()[0] + 1,
        "part": part.agg(F.max("p_partkey")).first()[0] + 1,
        "supplier": supplier.agg(F.max("s_suppkey")).first()[0] + 1,
    }

    def replicas(df, shifts, nparts):
        parts = []
        for i in range(FACTOR):
            p = df
            for col, stride in shifts.items():
                p = p.withColumn(col, F.col(col) + F.lit(int(i * stride)))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.coalesce(nparts).write.mode("overwrite").parquet(out + "/_tmp")
        os.rename(out + "/_tmp", outpath)

    for name, df, shifts, nparts in (
            ("orders", orders, {"o_orderkey": strides["orders"],
                                "o_custkey": strides["customer"]}, 16),
            ("lineitem", load_table(spark, base, "lineitem"),
             {"l_orderkey": strides["orders"],
              "l_partkey": strides["part"],
              "l_suppkey": strides["supplier"]}, 32),
            ("customer", customer,
             {"c_custkey": strides["customer"]}, 8),
            ("part", part, {"p_partkey": strides["part"]}, 8),
            ("supplier", supplier, {"s_suppkey": strides["supplier"]}, 8)):
        outpath = os.path.join(out, f"{name}.parquet")
        if os.path.exists(outpath):
            continue
        replicas(df, shifts, nparts)
    # fixed-size dimension: copy through (real TPC-H nation doesn't scale)
    outpath = os.path.join(out, "nation.parquet")
    if not os.path.exists(outpath):
        load_table(spark, base, "nation").coalesce(1) \
            .write.mode("overwrite").parquet(out + "/_tmp")
        os.rename(out + "/_tmp", outpath)


def run_queries(spark, sf_dir: str, prefix: str) -> dict:
    import __spark_entry__ as entry
    from hoodie_spark.sources import load_table

    for t in ("orders", "lineitem", "customer", "part", "supplier",
              "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(
            f"{prefix}_{t}")
    keys = {"l": f"{prefix}_lineitem", "o": f"{prefix}_orders",
            "c": f"{prefix}_customer", "p": f"{prefix}_part",
            "s": f"{prefix}_supplier", "n": f"{prefix}_nation",
            "r": f"{prefix}_nation"}
    timings = {}
    for qn in QUERIES:
        spark.catalog.clearCache()
        sql = entry.TPCH_SQL[qn].format(**keys)
        t0 = time.time()
        n = spark.sql(sql).count()
        timings[qn] = round(time.time() - t0, 3)
        timings[qn + "_rows"] = n
    return timings


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    sf1_dir = "/tmp/tpch_sf1_" + os.path.basename(base.rstrip("/"))
    t0 = time.time()
    build_sf1(spark, base, sf1_dir)
    print(json.dumps({"built": sf1_dir, "sec": round(time.time() - t0, 1)}))

    base_runs, sf1_runs = [], []
    for r in range(runs):
        tb = run_queries(spark, base, "b")
        t1 = run_queries(spark, sf1_dir, "s")
        base_runs.append(tb)
        sf1_runs.append(t1)
        print(json.dumps({"run": r, "sf01": tb, "sf1": t1}))
    mins = lambda rs: {q: min(t[q] for t in rs) for q in QUERIES}
    b, s = mins(base_runs), mins(sf1_runs)
    factors = {q: round(s[q] / b[q], 2) if b[q] else None for q in QUERIES}
    gate = {q: s[q] <= 2 * FACTOR * b[q] for q in QUERIES}
    print(json.dumps({"sf01_minima": b, "sf1_minima": s,
                      "factor_at_10x_data": factors,
                      "within_2x_of_linear": gate}))


if __name__ == "__main__":
    main()
