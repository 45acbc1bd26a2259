"""Pre-commit validators: SQL gates a write must pass BEFORE it publishes.

Public SparkPreCommitValidator design (this reference snapshot predates
it): each validator sees the committed PRE state and the would-be POST
state (the manifest fold with the pending commit overlaid — no instant is
written until every validator passes), so a failed validation aborts the
write with the table untouched and the just-written files removed.

Queries use the placeholder ``<TBL>`` for the table view, e.g.::

    sql_query_equality_validator("SELECT COUNT(*) FROM <TBL>")          # no row-count change
    sql_query_single_result_validator("SELECT COUNT(*) FROM <TBL> WHERE v IS NULL", 0)
    sql_query_inequality_validator("SELECT SUM(amount) FROM <TBL>")     # must change
"""

from __future__ import annotations

__all__ = [
    "PreCommitValidationError", "PreCommitContext",
    "sql_query_equality_validator", "sql_query_inequality_validator",
    "sql_query_single_result_validator",
]


class PreCommitValidationError(Exception):
    """Raised by a validator to abort the pending write."""


class PreCommitContext:
    """What a validator may inspect. ``pre_df`` is the committed snapshot,
    ``post_df`` the snapshot as it WOULD look after this commit."""

    def __init__(self, table, instant: str, stats: list[dict], post_view):
        self.table = table
        self.instant = instant
        self.stats = stats
        self._post_view = post_view

    def pre_df(self):
        return self.table.snapshot()

    def post_df(self):
        rc = self.table._reader
        return rc._assemble(self._post_view,
                            self._post_view.latest_slices(), None)


def _run(ctx: PreCommitContext, query: str, df) -> list:
    name = f"__pre_commit_{abs(hash((ctx.instant, query))) % 10**8}"
    df.createOrReplaceTempView(name)
    try:
        return sorted(map(tuple, ctx.table.spark.sql(
            query.replace("<TBL>", name)).collect()))
    finally:
        ctx.table.spark.catalog.dropTempView(name)


def sql_query_equality_validator(query: str):
    """Fail unless ``query`` returns identical rows on pre and post state
    (SqlQueryEqualityPreCommitValidator semantics) — e.g. an aggregate an
    upsert must not disturb."""
    def validate(ctx: PreCommitContext):
        pre = _run(ctx, query, ctx.pre_df())
        post = _run(ctx, query, ctx.post_df())
        if pre != post:
            raise PreCommitValidationError(
                f"equality validator failed for {query!r}: "
                f"pre={pre[:3]} post={post[:3]}")
    return validate


def sql_query_inequality_validator(query: str):
    """Fail unless ``query``'s result CHANGES across the commit
    (SqlQueryInequalityPreCommitValidator semantics)."""
    def validate(ctx: PreCommitContext):
        pre = _run(ctx, query, ctx.pre_df())
        post = _run(ctx, query, ctx.post_df())
        if pre == post:
            raise PreCommitValidationError(
                f"inequality validator failed for {query!r}: result "
                f"unchanged ({post[:3]})")
    return validate


def sql_query_single_result_validator(query: str, expected):
    """Fail unless ``query`` over the POST state returns exactly one row
    whose single value equals ``expected``
    (SqlQuerySingleResultPreCommitValidator semantics)."""
    def validate(ctx: PreCommitContext):
        rows = _run(ctx, query, ctx.post_df())
        if len(rows) != 1 or len(rows[0]) != 1 or rows[0][0] != expected:
            raise PreCommitValidationError(
                f"single-result validator failed for {query!r}: "
                f"expected {expected!r}, got {rows[:3]}")
    return validate
