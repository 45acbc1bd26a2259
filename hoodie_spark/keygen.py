"""Key generators: record identity + partition-path expressions.

Reference parity: hudi-client/hudi-spark-client/src/main/java/org/apache/hudi/
keygen/ — SimpleKeyGenerator, ComplexKeyGenerator (composite keys joined as
``field:value,field:value``), TimestampBasedKeyGenerator (timestamp → path),
NonpartitionedKeyGenerator, factory HoodieSparkKeyGeneratorFactory.java.

Spark-first: keys and partition paths are Column expressions evaluated inside
whole-stage codegen — no per-record Java objects, no Avro.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .config import NO_PARTITION, PARTITION_PATH, RECORD_KEY, TableConfig


def record_key_expr(cfg: TableConfig) -> Column:
    """SimpleKeyGenerator for one field, ComplexKeyGenerator for several."""
    fields = cfg.recordkey_fields
    if not fields:
        raise ValueError("recordkey_fields must be configured")
    if len(fields) == 1:
        return F.col(fields[0]).cast("string")
    parts = [F.concat(F.lit(f + ":"), F.col(f).cast("string")) for f in fields]
    return F.concat_ws(",", *parts)


def partition_path_expr(cfg: TableConfig) -> Column:
    """Partition path column; NO_PARTITION sentinel for unpartitioned."""
    if cfg.partition_expr:
        return F.expr(cfg.partition_expr).cast("string")
    if cfg.partition_fields:
        return F.concat_ws("/", *[F.col(f).cast("string") for f in cfg.partition_fields])
    # Hudi stores the empty partition path for non-partitioned tables; the
    # NO_PARTITION sentinel exists only as the physical directory name.
    return F.lit("")


# SQL words that look like identifiers inside partition expressions but are
# never column references (type names, keywords)
_NON_COLUMN_WORDS = {
    "as", "and", "or", "not", "in", "is", "null", "true", "false", "case",
    "when", "then", "else", "end", "between", "like", "distinct", "interval",
    "string", "int", "integer", "bigint", "long", "smallint", "tinyint",
    "double", "float", "decimal", "boolean", "date", "timestamp", "binary",
    "varchar", "char",
}


def _expr_columns(expr: str) -> set[str]:
    """Column identifiers referenced by a partition expression: word tokens
    that are not immediately followed by '(' (function calls) and are not
    SQL keywords/type names. Static — avoids running the analyzer (which
    logs an ERROR on the expected-miss probe for key-only deletes)."""
    import re

    # blank out string literals (keep offsets) so 'yyyy' in
    # date_format(ts, 'yyyy') is not mistaken for a column
    no_strings = re.sub(r"'[^']*'|\"[^\"]*\"", lambda m: " " * len(m.group(0)), expr)
    out = set()
    for m in re.finditer(r"[A-Za-z_][A-Za-z0-9_]*", no_strings):
        tail = no_strings[m.end():m.end() + 1]
        if tail == "(" or m.group(0).lower() in _NON_COLUMN_WORDS:
            continue
        out.add(m.group(0))
    return out


def partition_resolvable(df: DataFrame, cfg: TableConfig) -> bool:
    """True when the partition expression can be evaluated on ``df``.

    False for key-only inputs (delete-by-key) whose partition source columns
    are absent — those degrade to a global index lookup
    (GlobalDeleteKeyGenerator semantics)."""
    cols = set(df.columns)
    if cfg.partition_expr:
        return _expr_columns(cfg.partition_expr) <= cols
    if cfg.partition_fields:
        return set(cfg.partition_fields) <= cols
    return True


def custom_partition_expr(spec: str,
                          timestamp_format: str | dict = "yyyy/MM/dd") -> str:
    """CustomKeyGenerator parity (hudi-client/hudi-spark-client/.../keygen/
    CustomKeyGenerator.java, CustomAvroKeyGenerator.java): compile the
    reference's named per-field partition spec
    ``"field1:simple,field2:timestamp"`` into a ``partition_expr`` SQL
    string for :class:`~hoodie_spark.config.TableConfig`.

    Semantics match the reference: each ``field:type`` segment renders as
    the field's string value (``simple``) or its formatted timestamp
    (``timestamp`` — TimestampBasedKeyGenerator's output format, supplied
    per-field via a ``{field: fmt}`` dict or one format for all), and
    segments join with ``/``. An empty spec means non-partitioned
    (returns ``''`` → the empty partition path). Record keys need no
    counterpart: the reference delegates to Simple/ComplexKeyGenerator by
    field count, exactly what :func:`record_key_expr` already does.

    Spark-first: the result is one Catalyst expression evaluated inside
    whole-stage codegen. Timestamp fields are cast to timestamp first,
    so string timestamps, date/timestamp columns, and bigint epoch
    seconds all work (Spark's numeric→timestamp cast is seconds-based).
    """
    spec = (spec or "").strip()
    if not spec:
        return "''"
    segs = []
    for part in spec.split(","):
        part = part.strip()
        pieces = [p.strip() for p in part.split(":")]
        if len(pieces) != 2 or not pieces[0]:
            raise ValueError(
                f"custom partition spec segment {part!r} is not in "
                "'field:type' form (types: simple, timestamp)")
        field, ktype = pieces[0], pieces[1].lower()
        # NULL field values render as the reference's 'default' segment
        # (CustomAvroKeyGenerator emits DEFAULT_PARTITION_PATH per part) —
        # without the coalesce, concat_ws would DROP the null segment and
        # collapse 'a/NULL/c' into a different partition's path 'a/c'
        if ktype == "simple":
            segs.append(f"coalesce(cast(`{field}` as string), 'default')")
        elif ktype in ("timestamp", "timestampbased", "timestamp_based"):
            fmt = (timestamp_format.get(field, "yyyy/MM/dd")
                   if isinstance(timestamp_format, dict) else timestamp_format)
            fmt = fmt.replace("'", "''")  # quote-safe SQL literal
            segs.append(
                f"coalesce(date_format(cast(`{field}` as timestamp), "
                f"'{fmt}'), 'default')")
        else:
            raise ValueError(
                f"unknown PartitionKeyType {ktype!r} for field {field!r} "
                "(expected 'simple' or 'timestamp')")
    if len(segs) == 1:
        return segs[0]
    return "concat_ws('/', " + ", ".join(segs) + ")"


def with_keys(df: DataFrame, cfg: TableConfig) -> DataFrame:
    """Attach _hoodie_record_key and _hoodie_partition_path columns.

    A key-only input (e.g. delete by record key) gets a null partition path;
    the index lookup supplies the record's actual partition."""
    df = df.withColumn(RECORD_KEY, record_key_expr(cfg))
    pp = (partition_path_expr(cfg) if partition_resolvable(df, cfg)
          else F.lit(None).cast("string"))
    return df.withColumn(PARTITION_PATH, pp)
