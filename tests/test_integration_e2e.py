"""Full lifecycle: snapshot ETL -> continuous CDC -> parity check.

The reference's complete story (implicit full ETL before consume,
/root/reference/synch/cli.py:75-76, then continuous_etl, then
`synch check`) replayed against the customer fixture.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F, types as T

from synch_spark.config import SyncConfig, TableSpec
from synch_spark.pipeline import check, etl_full
from synch_spark.session import read_table
from synch_spark.sources.table import ParquetTable
from synch_spark.streaming.pipeline import CdcPipeline

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)


def test_snapshot_then_cdc_then_check(spark, tmp_path):
    source = read_table(spark, "/root/testdata/sf0.001", "customer")
    spec = TableSpec(schema="db", table="customer", pk=("c_custkey",))
    warehouse = str(tmp_path / "wh")
    table = ParquetTable(spark, f"{warehouse}/db/customer")

    # EP1: snapshot
    assert etl_full(source, table, spec)
    assert check(source, table, checksum=True).ok

    # EP3: stream a batch of changes — update one row, delete one, insert one
    cfg = SyncConfig()
    cfg.add_table(spec)
    pipe = CdcPipeline(
        spark=spark, cfg=cfg, warehouse=warehouse,
        checkpoint_dir=str(tmp_path / "ck"),
        value_schemas={"db.customer": VALUE_SCHEMA},
    )
    first = source.orderBy("c_custkey").limit(2).collect()
    upd, dele = first[0], first[1]
    new_row = {
        "c_custkey": 999_999, "c_name": "NEW CUSTOMER", "c_nationkey": 1,
        "c_acctbal": 42.5, "c_mktsegment": "BUILDING",
    }
    events_dir = tmp_path / "ev"
    events_dir.mkdir()
    upd_after = {**upd.asDict(), "c_acctbal": 123.45}
    with open(events_dir / "b.json", "w") as f:
        for action, before, after, us in [
            ("update", upd.asDict(), upd_after, 1),
            ("delete", dele.asDict(), None, 2),
            ("insert", None, new_row, 3),
        ]:
            f.write(json.dumps({
                "schema": "db", "table": "customer", "action": action,
                "before": json.dumps(before) if before else None,
                "after": json.dumps(after) if after else None,
                "event_unixtime": us,
            }) + "\n")
    q = pipe.start_file_stream(str(events_dir), available_now=True)
    q.awaitTermination(120)

    # verify final state: row count preserved (one del, one ins)
    final = table.read()
    assert final.count() == source.count()
    got_upd = final.filter(F.col("c_custkey") == upd["c_custkey"]).collect()[0]
    assert got_upd["c_acctbal"] == 123.45
    assert final.filter(F.col("c_custkey") == dele["c_custkey"]).count() == 0
    assert final.filter(F.col("c_custkey") == 999_999).count() == 1

    # E3: count parity against the expected post-CDC source state
    expected_source = (
        source.filter(F.col("c_custkey") != dele["c_custkey"])
        .unionByName(spark.createDataFrame([new_row], VALUE_SCHEMA))
    )
    res = check(expected_source, table)
    assert res.ok
