"""DDL translator golden tests, mirroring the reference's
/root/reference/tests/test_sql_convent.py and test_mysqlparser.py corpus
(add/drop/change/modify incl. decimal, datetime, defaults, comments)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from synch_spark.ddl import apply_alter, parse_alter
from synch_spark.typemap import source_type_to_spark


def test_parse_add_column_decimal():
    ops = parse_alter(
        "alter table test.test add column amount decimal(10,2) not null default '0' comment 'money'"
    )
    assert len(ops) == 1
    op = ops[0]
    assert op.action == "add_column" and op.column == "amount"
    assert op.spark_type == T.DecimalType(10, 2)
    assert op.nullable is False and op.default == "0"


def test_parse_add_column_datetime():
    (op,) = parse_alter("ALTER TABLE test.test ADD COLUMN created_at datetime")
    assert op.action == "add_column" and op.spark_type == T.TimestampType()


def test_parse_drop_change_modify():
    (op,) = parse_alter("alter table db.t drop column old_col")
    assert op.action == "drop_column" and op.column == "old_col"
    (op,) = parse_alter("alter table db.t change old_name new_name varchar(255)")
    assert op.action == "rename_column" and (op.column, op.new_column) == ("old_name", "new_name")
    (op,) = parse_alter("alter table db.t modify column n bigint not null")
    assert op.action == "modify_column" and op.spark_type == T.LongType()


def test_parse_multi_clause():
    ops = parse_alter(
        "alter table db.t add column a int, add column b decimal(18,4), drop column c"
    )
    assert [o.action for o in ops] == ["add_column", "add_column", "drop_column"]
    assert ops[1].spark_type == T.DecimalType(18, 4)


def test_parse_rejects_non_alter():
    with pytest.raises(ValueError):
        parse_alter("CREATE TABLE t (id int)")


def test_apply_alter_roundtrip(spark):
    df = spark.createDataFrame([(1, "x", 2.5)], ["id", "name", "val"])
    out = apply_alter(
        df,
        parse_alter(
            "alter table db.t add column tag varchar(8) default 'new', "
            "change name title varchar(64), modify column val decimal(10,2)"
        ),
    )
    assert set(out.columns) == {"id", "title", "val", "tag"}
    row = out.collect()[0]
    assert row["tag"] == "new" and str(row["val"]) == "2.50"


@pytest.mark.parametrize(
    "src,expected",
    [
        ("tinyint(1)", T.BooleanType()),
        ("tinyint", T.ByteType()),
        ("smallint", T.ShortType()),
        ("mediumint", T.IntegerType()),
        ("bigint", T.LongType()),
        ("decimal(10,2)", T.DecimalType(10, 2)),
        ("numeric(5)", T.DecimalType(5, 0)),
        ("varchar(255)", T.StringType()),
        ("longtext", T.StringType()),
        ("double", T.DoubleType()),
        ("float", T.FloatType()),
        ("datetime", T.TimestampType()),
        ("timestamp", T.TimestampType()),
        ("date", T.DateType()),
        ("json", T.StringType()),
        ("varbinary(16)", T.BinaryType()),
        ("whoknows", T.StringType()),
    ],
)
def test_typemap(src, expected):
    assert source_type_to_spark(src) == expected

def test_non_column_clauses_parse_to_no_ops():
    """Index/constraint/table-option clauses are valid MySQL ALTER but
    touch no column data: they must yield NO op — not be force-fit into
    a column op ('ADD INDEX i (c)' used to become add_column
    column='INDEX') and not raise (a raising clause wedges a replaying
    stream on the same checkpointed event)."""
    from synch_spark.ddl import parse_alter

    for sql in [
        "alter table db.t add index idx_a (a)",
        "alter table db.t add unique key uk (a, b)",
        "alter table db.t drop index idx_a",
        "alter table db.t drop primary key",
        "alter table db.t add constraint fk foreign key (a) references p(id)",
        "alter table db.t drop foreign key fk",
        "alter table db.t alter column a set default 5",
        "alter table db.t engine=InnoDB",
        "alter table db.t auto_increment = 100",
        "alter table db.t default character set utf8mb4",
        "alter table db.t rename index i1 to i2",
    ]:
        assert parse_alter(sql) == [], sql
    # mixed: the column op survives, the index clause drops out
    ops = parse_alter(
        "alter table db.t add column c bigint, add index idx_c (c)")
    assert len(ops) == 1 and ops[0].action == "add_column" \
        and ops[0].column == "c"
    # a column that merely STARTS like an option keyword still parses
    ops = parse_alter("alter table db.t add column engine_id bigint")
    assert len(ops) == 1 and ops[0].column == "engine_id"


def test_unsigned_integer_types_widen():
    """UNSIGNED widening (Spark's JDBC convention): each unsigned
    integer maps to the next-wider signed Spark type — bigint unsigned
    to LongType would overflow values above 2^63-1 that the binlog row
    decoder (which honors the signedness TLV) faithfully produces."""
    from synch_spark.typemap import source_type_to_spark as f

    assert f("tinyint unsigned").simpleString() == "smallint"
    assert f("smallint unsigned").simpleString() == "int"
    assert f("mediumint unsigned").simpleString() == "int"
    assert f("int unsigned").simpleString() == "bigint"
    assert f("int(11) unsigned").simpleString() == "bigint"
    assert f("bigint unsigned").simpleString() == "decimal(20,0)"
    # boolean idiom beats the widening; signed types unchanged
    assert f("tinyint(1)").simpleString() == "boolean"
    assert f("bigint").simpleString() == "bigint"


def test_change_column_keeps_unsigned():
    """CHANGE COLUMN captured the type WITHOUT its unsigned suffix,
    silently narrowing a bigint-unsigned rename — the suffix must ride
    into the AlterOp's type like ADD/MODIFY always did."""
    ops = parse_alter("ALTER TABLE db.t CHANGE COLUMN a b bigint unsigned NOT NULL")
    assert ops[0].action == "rename_column"
    assert ops[0].type_str.lower() == "bigint unsigned"
    assert ops[0].spark_type.simpleString() == "decimal(20,0)"
