"""Source-DB type -> Spark DataType mapping.

Parity: the reference's explicit MySQL->ClickHouse type table
(/root/reference/synch/convert.py:28-46 and 81-93, incl. Decimal(p,s)
and Nullable wrapping). Here the target is Spark's native type system,
which subsumes the reference's two decimal workarounds
(skip_decimal stringify /root/reference/synch/writer/__init__.py:113-123
and the post-create MODIFY COLUMN fix-up
/root/reference/synch/writer/__init__.py:55-76): DecimalType(p,s) is
exact end-to-end, so both collapse to identity.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# base-name -> Spark type (parameterless cases)
_SIMPLE: dict[str, T.DataType] = {
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "real": T.DoubleType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "mediumint": T.IntegerType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "serial": T.IntegerType(),
    "bigserial": T.LongType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "text": T.StringType(),
    "longtext": T.StringType(),
    "mediumtext": T.StringType(),
    "tinytext": T.StringType(),
    "json": T.StringType(),  # MySQL JSON columns ride as JSON strings
    "blob": T.BinaryType(),
    "longblob": T.BinaryType(),
    "varbinary": T.BinaryType(),
    "binary": T.BinaryType(),
    "uuid": T.StringType(),
}

_TYPE_RE = re.compile(r"^\s*(\w+)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?", re.IGNORECASE)


def source_type_to_spark(type_str: str) -> T.DataType:
    """Map a MySQL/Postgres column type string to a Spark DataType.

    ``decimal(p,s)``/``numeric(p,s)`` keep exact precision; ``varchar(n)``
    etc. drop the length (Spark strings are unbounded). ``tinyint(1)`` is
    MySQL's boolean idiom.
    """
    m = _TYPE_RE.match(type_str)
    if not m:
        return T.StringType()
    base = m.group(1).lower()
    p, s = m.group(2), m.group(3)
    if base in ("decimal", "numeric"):
        precision = int(p) if p else 10
        scale = int(s) if s else 0
        return T.DecimalType(precision, scale)
    if base == "tinyint" and p == "1":
        return T.BooleanType()  # MySQL boolean idiom, signed or not
    if base == "unsigned":  # "unsigned int" style — be permissive
        return T.LongType()
    # UNSIGNED widening (Spark's own JDBC convention): each unsigned
    # integer type needs the next-wider signed Spark type — mapping
    # bigint unsigned to LongType would overflow values above 2^63-1
    # that the binlog row decoder faithfully produces (it honors the
    # TABLE_MAP signedness TLV). The reference never handles unsigned
    # (convert.py maps only bool), so this is a correctness extension.
    if re.search(r"\bunsigned\b", type_str, re.IGNORECASE):
        widened = {"tinyint": T.ShortType(), "smallint": T.IntegerType(),
                   "mediumint": T.IntegerType(), "int": T.LongType(),
                   "integer": T.LongType(), "bigint": T.DecimalType(20, 0)}
        if base in widened:
            return widened[base]
    return _SIMPLE.get(base, T.StringType())


def spark_type_to_sql(dt: T.DataType) -> str:
    """Spark DataType -> ANSI SQL type string (for DDL emission)."""
    return dt.simpleString().upper()


def struct_field(name: str, type_str: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, source_type_to_spark(type_str), nullable)
