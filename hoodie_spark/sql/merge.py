"""SQL DML surface: MERGE INTO / UPDATE / DELETE as a builder API.

Reference parity: MergeIntoHoodieTableCommand.scala:56-159 (matched
update/delete + not-matched insert with per-clause conditions, compiled into
ExpressionPayload + ExpressionCodeGen), UpdateHoodieTableCommand.scala,
DeleteHoodieTableCommand.scala.

Spark-first: the reference serializes clause expressions into the write
config and code-generates them per record inside the payload on executors;
here the clauses are plain Column expressions evaluated by whole-stage
codegen in ONE upsert batch — first-matching-clause semantics via a chained
CASE, delete clauses via the soft-delete channel. MERGE applies its result
unconditionally (the command already decided the winner), so the underlying
upsert runs with the incoming-wins payload — same effect as ExpressionPayload
overriding combineAndGetUpdateValue."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import IS_DELETED, MergePolicy


class MergeIntoBuilder:
    """tbl.merge(source, "target.k = source.k")
           .when_matched_update(set={"v": "source.v + target.v"})
           .when_matched_delete(condition="source.op = 'del'")
           .when_not_matched_insert()
           .execute()
    """

    def __init__(self, table, source: DataFrame, on: str):
        self.table = table
        self.source = source
        self.on = on
        self.matched: list[tuple[str, str | None, dict | None]] = []
        self.not_matched: list[tuple[str | None, dict | None]] = []

    def when_matched_update(self, set: dict[str, str],  # noqa: A002
                            condition: str | None = None) -> "MergeIntoBuilder":
        self.matched.append(("update", condition, set))
        return self

    def when_matched_delete(self, condition: str | None = None) -> "MergeIntoBuilder":
        self.matched.append(("delete", condition, None))
        return self

    def when_not_matched_insert(self, values: dict[str, str] | None = None,
                                condition: str | None = None) -> "MergeIntoBuilder":
        self.not_matched.append((condition, values))
        return self

    # ------------------------------------------------------------------ run
    def execute(self):
        tbl = self.table
        data_cols = [n for n, _ in tbl.data_columns()]
        target = tbl.snapshot().alias("target")
        source = self.source.alias("source")
        batches: list[DataFrame] = []

        if self.matched:
            joined = source.join(target, F.expr(self.on), "inner")
            # first-matching-clause wins (MergeIntoHoodieTableCommand:126):
            # chained CASE built last→first so earlier clauses take priority
            clause_idx = F.lit(None).cast("int")
            for i in range(len(self.matched) - 1, -1, -1):
                _k, cond, _s = self.matched[i]
                c = F.expr(cond) if cond else F.lit(True)
                clause_idx = F.when(c, F.lit(i)).otherwise(clause_idx)
            sel = []
            for col in data_cols:
                if col == IS_DELETED:
                    continue
                expr = F.col(f"target.{col}")
                for i, (kind, _cond, sets) in enumerate(self.matched):
                    if kind == "update" and sets and col in sets:
                        expr = F.when(clause_idx == i, F.expr(sets[col])).otherwise(expr)
                sel.append(expr.alias(col))
            has_delete = any(k == "delete" for k, _c, _s in self.matched)
            if has_delete:
                is_del = F.lit(False)
                for i, (kind, _c, _s) in enumerate(self.matched):
                    if kind == "delete":
                        is_del = F.when(clause_idx == i, F.lit(True)).otherwise(is_del)
                sel.append(is_del.alias(IS_DELETED))
            batches.append(joined.filter(clause_idx.isNotNull()).select(*sel))

        if self.not_matched:
            anti = source.join(target, F.expr(self.on), "left_anti")
            for cond, values in self.not_matched:
                part = anti.filter(F.expr(cond)) if cond else anti
                sel = []
                for col in data_cols:
                    if col == IS_DELETED:
                        continue
                    if values and col in values:
                        sel.append(F.expr(values[col]).alias(col))
                    elif col in self.source.columns:
                        sel.append(F.col(f"source.{col}").alias(col))
                    else:
                        sel.append(F.lit(None).alias(col))
                batches.append(part.select(*sel))

        if not batches:
            return None
        batch = batches[0]
        for b in batches[1:]:
            batch = batch.unionByName(b, allowMissingColumns=True)
        return _apply_unconditional(tbl, lambda: tbl.upsert(batch))


def update(table, set: dict[str, str], where: str | None = None):  # noqa: A002
    """UPDATE ... SET ... WHERE (UpdateHoodieTableCommand.scala)."""
    snap = table.snapshot()
    if where:
        snap = snap.filter(F.expr(where))
    data_cols = [n for n, _ in table.data_columns()]
    sel = [F.expr(e).alias(c) if (e := set.get(c)) else F.col(c) for c in data_cols]
    return _apply_unconditional(table, lambda: table.upsert(snap.select(*sel)))


def delete_where(table, condition: str):
    """DELETE FROM ... WHERE (DeleteHoodieTableCommand.scala)."""
    snap = table.snapshot().filter(F.expr(condition))
    data_cols = [n for n, _ in table.data_columns()]
    return table.delete(snap.select(*data_cols))


def _apply_unconditional(table, fn):
    """Run a write with incoming-wins resolution (ExpressionPayload effect)."""
    prev = table.write_config.merge_policy
    table.write_config.merge_policy = MergePolicy.OVERWRITE_LATEST
    try:
        return fn()
    finally:
        table.write_config.merge_policy = prev
