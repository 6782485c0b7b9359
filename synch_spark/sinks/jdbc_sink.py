"""JDBC sink: the reference's ClickHouse write strategy over any JDBC target.

The reference flushes each micro-batch as ALTER DELETE for every
touched pk followed by a bulk INSERT
(/root/reference/synch/replication/continuous.py:122-154,
/root/reference/synch/writer/merge_tree.py:28-61). This sink reproduces
that exact two-step shape Spark-side:

1. the batch compacts to one net action per pk (cdc_apply.compact_batch
   — W3), so delete-then-insert is order-free within the batch;
2. DELETE .. WHERE pk IN (...) runs on the driver over a plain JDBC
   connection (the key set is micro-batch sized — the same bound the
   broadcast merge already relies on — chunked into bounded IN-lists;
   composite pks use the reference's OR-of-conjunctions form,
   writer/__init__.py delete_events);
3. the net inserts stream through Spark's distributed JDBC writer —
   every executor writes its partition directly to the target, no rows
   through the driver.

The JDBC connection comes from the JVM's DriverManager via py4j, so any
driver on the Spark classpath works: embedded Derby (live-tested here),
clickhouse-jdbc / MySQL / Postgres in production — this is the
"Structured Streaming with ClickHouse JDBC sink" deployment shape; the
versioned parquet store remains the default (analytics-queryable) target.

Failure contract: the DELETE+INSERT pair is not transactional across
the two statements. A crash between them redelivers the batch on
restart (checkpoint not advanced); both steps are idempotent under
replay (DELETE of absent keys is a no-op; re-INSERT after the paired
DELETE restores the same rows) — at-least-once delivery converging to
the exactly-once final state, the reference's own guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from synch_spark.config import TableSpec
from synch_spark.operators.cdc_apply import compact_batch

IN_CHUNK = 1000  # keys per DELETE statement

#: Spark simpleString -> portable SQL column type for ALTER ADD/MODIFY
_SQL_TYPES = {
    "tinyint": "SMALLINT", "smallint": "SMALLINT", "int": "INTEGER",
    "bigint": "BIGINT", "float": "REAL", "double": "DOUBLE",
    "boolean": "BOOLEAN", "date": "DATE", "timestamp": "TIMESTAMP",
    "string": "VARCHAR(1024)",
}


def _sql_type(spark_type) -> str:
    simple = spark_type.simpleString()
    if simple.startswith("decimal"):
        return simple.upper()
    return _SQL_TYPES.get(simple, "VARCHAR(1024)")


def alter_statements(table: str, ops) -> list[str]:
    """ANSI ALTER statements for parsed ddl.AlterOps (ref convert.py:
    94-121 emits the ClickHouse forms; these are the portable ones —
    swap RENAME syntax per dialect if the target needs it)."""
    out = []
    for op in ops:
        if op.action == "add_column":
            out.append(
                f"ALTER TABLE {table} ADD COLUMN {op.column} {_sql_type(op.spark_type)}"
            )
        elif op.action == "drop_column":
            out.append(f"ALTER TABLE {table} DROP COLUMN {op.column}")
        elif op.action == "rename_column":
            # the ClickHouse/MySQL/Postgres form; Derby alone wants
            # `RENAME COLUMN t.a TO b` — swap per dialect if needed
            out.append(
                f"ALTER TABLE {table} RENAME COLUMN {op.column} TO {op.new_column}"
            )
        elif op.action == "modify_column":
            out.append(
                f"ALTER TABLE {table} ALTER COLUMN {op.column} "
                f"SET DATA TYPE {_sql_type(op.spark_type)}"
            )
    return out


def delete_statements(
    table: str, pk: tuple[str, ...], keys: list[tuple], chunk: int = IN_CHUNK
) -> list[tuple[str, list]]:
    """PARAMETERIZED delete statements for the touched keys (ref
    delete_events, /root/reference/synch/writer/__init__.py): single-
    column pks use a chunked IN-list of placeholders, composite pks the
    OR-of-conjunctions form. Returns (sql_with_placeholders, params)
    pairs for PreparedStatement execution — key VALUES never enter the
    SQL text, so a hostile string pk cannot break out regardless of the
    target dialect's escaping rules (MySQL treats backslash as an
    escape; quote-doubling alone would not be safe there)."""
    out = []
    for i in range(0, len(keys), chunk):
        part = keys[i : i + chunk]
        if len(pk) == 1:
            marks = ", ".join("?" for _ in part)
            out.append(
                (f"DELETE FROM {table} WHERE {pk[0]} IN ({marks})",
                 [k[0] for k in part])
            )
        else:
            conj = " OR ".join(
                "(" + " AND ".join(f"{c} = ?" for c in pk) + ")" for _ in part
            )
            out.append(
                (f"DELETE FROM {table} WHERE {conj}",
                 [v for k in part for v in k])
            )
    return out


class JdbcSink:
    """foreachBatch-compatible applier writing to a JDBC table."""

    def __init__(self, spark, url: str, target_table: str,
                 properties: dict | None = None):
        self.spark = spark
        self.url = url
        self.target_table = target_table
        self.properties = properties or {}

    def _execute(self, statements: list[tuple[str, list]]) -> None:
        jvm = self.spark.sparkContext._jvm
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            for sql, params in statements:
                ps = conn.prepareStatement(sql)
                try:
                    for i, v in enumerate(params, start=1):
                        ps.setObject(i, v)
                    ps.executeUpdate()
                finally:
                    ps.close()
        finally:
            conn.close()

    def apply_batch(
        self,
        events: DataFrame,
        spec: TableSpec,
        value_columns: list[str] | None = None,
    ) -> None:
        """One micro-batch: compact -> driver-side chunked DELETE of the
        touched pks -> distributed INSERT of the net upserts."""
        from synch_spark.operators.cdc_apply import _row_cols

        cols = _row_cols(events, value_columns)
        if not spec.has_pk:
            inserts = events.filter(F.col("action") == "insert").select(*cols)
            self._write(inserts)
            return
        net = compact_batch(events, spec.pk).select("action", *cols).persist()
        try:
            keys = [
                tuple(r[c] for c in spec.pk)
                for r in net.select(*spec.pk).collect()  # micro-batch sized
            ]
            if keys:
                self._execute(
                    delete_statements(self.target_table, spec.pk, keys)
                )
            self._write(net.filter(F.col("action") != "delete").drop("action"))
        finally:
            net.unpersist()

    def apply_ddl(self, ops) -> None:
        """DDL channel for a JDBC-sunk table: translate the parsed
        AlterOps to ANSI ALTER statements and execute them on the
        target — the reference's SqlConvert.to_clickhouse + execute
        (/root/reference/synch/convert.py:123-131) generalized to any
        JDBC dialect. Runs under the stream's DDL barrier, so data
        batches on either side see a consistent target schema."""
        self._execute([(sql, []) for sql in alter_statements(self.target_table, ops)])

    def _write(self, df: DataFrame) -> None:
        writer = df.write.mode("append")
        for k, v in self.properties.items():
            writer = writer.option(k, v)
        writer.jdbc(self.url, self.target_table, properties=self.properties)
