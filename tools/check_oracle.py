"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, column names (sorted) and
canonicalized values. Usage::

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # match plausible driver normalization: round to 9 significant digits
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ").replace("+00:00", "")
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "12g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    import __spark_entry__ as entrymod
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            s_cols = df.columns
            s_rows = df.collect()
        except Exception as e:
            results[name] = f"SPARK-ERROR {type(e).__name__}: {str(e)[:200]}"
            continue
        if name not in os_:
            results[name] = f"rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)"
            continue
        try:
            rel = con.execute(os_[name])
            o_cols = [d[0] for d in rel.description]
            o_rows = rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}"
            continue
        dt = time.time() - t0
        if sorted(s_cols) != sorted(o_cols):
            results[name] = f"COLS-MISMATCH spark={sorted(s_cols)} oracle={sorted(o_cols)}"
            continue
        if len(s_rows) != len(o_rows):
            results[name] = f"COUNT-MISMATCH spark={len(s_rows)} oracle={len(o_rows)}"
            continue
        a = canon_rows(s_cols, [tuple(r) for r in s_rows])
        b = canon_rows(o_cols, o_rows)
        if a != b:
            diff = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y) \
                if a and b else 0
            results[name] = (f"VALUE-MISMATCH at sorted-row {diff}:\n"
                            f"    spark : {a[diff] if diff < len(a) else '?'}\n"
                            f"    oracle: {b[diff] if diff < len(b) else '?'}")
        else:
            results[name] = f"OK ({len(s_rows)} rows, {dt:.1f}s)"

    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for name, v in results.items():
        flag = "  " if v.startswith(("OK", "rows-only")) else "!!"
        print(f"{flag} {name:24s} {v}")
    print(f"\n{n_ok}/{len(results)} matched")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
