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


def tclass(t: str) -> str:
    """Coarse type class for engine-parity checking.

    The driver's value hash is type-sensitive across *classes* (int vs
    decimal/hugeint vs float — they normalize differently through
    arrow/pandas) but tolerant within a class (int32 vs int64 both land as
    int64). round-1 evidence: text_stats (i32 vs i64) hashed green while
    dedup_simhash (i32 vs HUGEINT) hashed red.
    """
    t = str(t).lower()
    if t.startswith(("decimal", "hugeint")):
        return "decimal"
    if t.startswith(("tinyint", "smallint", "int", "bigint", "uint")):
        return "int"
    if t.startswith(("float", "double", "halffloat")):
        return "float"
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("date"):
        return "date"
    if t in ("string", "large_string", "varchar"):
        return "str"
    if t in ("bool", "boolean"):
        return "bool"
    return t


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
            atbl = con.sql(os_[name]).arrow()
            o_cols = atbl.column_names
            o_types = [str(f.type) for f in atbl.schema]
            o_rows = (list(zip(*(atbl.column(i).to_pylist()
                                 for i in range(atbl.num_columns))))
                      if atbl.num_columns else [])
        except Exception as e:
            results[name] = f"ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}"
            continue
        dt = time.time() - t0
        if sorted(s_cols) != sorted(o_cols):
            results[name] = f"COLS-MISMATCH spark={sorted(s_cols)} oracle={sorted(o_cols)}"
            continue
        s_types = dict(df.dtypes)
        bad_types = [
            (c, s_types[c], ot) for c, ot in zip(o_cols, o_types)
            if tclass(s_types[c]) != tclass(ot)
        ]
        if bad_types:
            results[name] = f"TYPE-MISMATCH (spark vs oracle): {bad_types}"
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
