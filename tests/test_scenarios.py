"""Randomized operation-DAG scenarios against a Python model.

Reference parity: hudi-integ-test's HoodieTestSuiteJob — YAML DAGs of
Insert/Upsert/Delete/Rollback/Compact/Clean nodes with query-result
validations (unit-test-cow-dag.yaml: scripted sequence → exact counts,
duplicate-key check = 0). Here hypothesis draws the DAG and a dict model
predicts the exact table state after every operation; the snapshot must
match the model and never contain duplicate keys.
"""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, TableType, WriteConfig

SF_DIR = "/root/testdata/sf0.001"

# ops: (kind, param)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), st.integers(2, 7)),
        st.tuples(st.just("delete"), st.integers(2, 9)),
        st.tuples(st.just("delete_partition"), st.integers(0, 6)),
        st.tuples(st.just("rollback"), st.just(0)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("logcompact"), st.just(0)),
        st.tuples(st.just("cluster"), st.just(0)),
    ),
    min_size=3, max_size=6)


@pytest.fixture(scope="module")
def base_rows(spark):
    rows = (spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .filter("o_orderkey < 400")
            .select("o_orderkey", "o_orderstatus", "o_totalprice",
                    "o_orderdate").collect())
    return [tuple(r) for r in rows]


@given(table_type=st.sampled_from([TableType.COPY_ON_WRITE,
                                   TableType.MERGE_ON_READ]),
       index_type=st.sampled_from(["simple", "bucket"]),
       ops=_OPS)
@settings(max_examples=4, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_random_operation_dag(spark, tmp_path_factory, base_rows,
                              table_type, index_type, ops):
    import uuid

    from hoodie_spark.config import IndexType

    path = str(tmp_path_factory.mktemp("dag")) + "/" + uuid.uuid4().hex[:8]
    tbl = HoodieTable.create(
        spark, path, "dag", ["o_orderkey"], None,
        partition_expr="cast(year(o_orderdate) as string)",
        table_type=table_type,
        write_config=WriteConfig(
            parquet_max_file_size=64 * 1024,
            record_size_estimate=256,
            index_type=(IndexType.BUCKET if index_type == "bucket"
                        else IndexType.SIMPLE),
            bucket_index_num_buckets=3))
    schema = "o_orderkey long, o_orderstatus string, o_totalprice double, " \
             "o_orderdate timestamp"

    def df_of(rows):
        return spark.createDataFrame(rows, schema)

    model = {r[0]: r for r in base_rows}
    tbl.bulk_insert(df_of(base_rows))
    # (model state, instant) after each data commit — rollback only targets
    # these; service commits (compaction/clustering) are not user-undoable
    # in the model
    history = [(dict(model), tbl.timeline.completed()[-1].timestamp)]

    for kind, p in ops:
        if kind == "upsert":
            batch = [(k, "Z", v[2] + float(p), v[3])
                     for k, v in list(model.items()) if k % p == 0]
            if not batch:
                continue
            tbl.upsert(df_of(batch))
            model.update({r[0]: r for r in batch})
            history.append((dict(model), tbl.timeline.completed()[-1].timestamp))
        elif kind == "delete":
            keys = [k for k in model if k % p == 1]
            if not keys:
                continue
            tbl.delete(df_of([model[k] for k in keys]))
            for k in keys:
                del model[k]
            history.append((dict(model), tbl.timeline.completed()[-1].timestamp))
        elif kind == "delete_partition":
            parts = sorted({str(v[3].year) for v in model.values()})
            if not parts:
                continue
            part = parts[p % len(parts)]
            tbl.delete_partitions([part])
            model = {k: v for k, v in model.items()
                     if str(v[3].year) != part}
            history.append((dict(model), tbl.timeline.completed()[-1].timestamp))
        elif kind == "rollback" and len(history) > 1:
            last = tbl.timeline.completed()[-1]
            if last.timestamp != history[-1][1]:
                continue  # last commit is a service action, not user-undoable
            tbl.rollback(last.timestamp)
            history.pop()
            model = dict(history[-1][0])
        elif kind == "compact" and table_type == TableType.MERGE_ON_READ:
            tbl.compact()
        elif kind == "logcompact" and table_type == TableType.MERGE_ON_READ:
            tbl.logcompact(min_log_files=2)
        elif kind == "cluster":
            tbl.cluster()

        snap = {r[0]: (r[0], r[1], r[2], r[3]) for r in
                tbl.snapshot().select("o_orderkey", "o_orderstatus",
                                      "o_totalprice", "o_orderdate")
                .collect()}
        assert len(snap) == len(model), (kind, p)
        assert snap == model, (kind, p)
        # the integ-suite's duplicate-key validation
        assert tbl.snapshot().groupBy("o_orderkey").count() \
            .filter("count > 1").count() == 0
