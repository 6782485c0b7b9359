"""DDL channel: parse MySQL ALTER statements and apply them to Spark tables.

Parity: the reference's mysqlparse-based translator
(/root/reference/synch/convert.py:48-131) handling ADD COLUMN, DROP
COLUMN, CHANGE COLUMN (rename), MODIFY COLUMN with type/length/decimals/
null/default/comment/position, and its type table (convert.py:28-46).
Golden behaviors mirrored from /root/reference/tests/test_sql_convent.py.

We parse with a small regex grammar into a typed `AlterOp`, translate the
column type through typemap, and apply to a DataFrame as a projection
(schema evolution on parquet = rewrite-on-next-commit; cheap because the
projection fuses into whatever write follows). DDL ordering vs data is
enforced by the streaming layer's DDL barrier (W7), not here.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from synch_spark.typemap import source_type_to_spark

_ALTER_RE = re.compile(r"^\s*alter\s+table\s+(?:`?(\w+)`?\.)?`?(\w+)`?\s+(.*)$", re.I | re.S)
_ADD_RE = re.compile(
    r"^add\s+(?:column\s+)?`?(\w+)`?\s+(\w+(?:\s*\([\d\s,]+\))?(?:\s+unsigned)?)"
    r"(?P<rest>.*)$",
    re.I | re.S,
)
_DROP_RE = re.compile(r"^drop\s+(?:column\s+)?`?(\w+)`?\s*$", re.I)
_CHANGE_RE = re.compile(
    r"^change\s+(?:column\s+)?`?(\w+)`?\s+`?(\w+)`?\s+"
    r"(\w+(?:\s*\([\d\s,]+\))?(?:\s+unsigned)?)(?P<rest>.*)$",
    re.I | re.S,
)
_MODIFY_RE = re.compile(
    r"^modify\s+(?:column\s+)?`?(\w+)`?\s+(\w+(?:\s*\([\d\s,]+\))?(?:\s+unsigned)?)(?P<rest>.*)$",
    re.I | re.S,
)
_DEFAULT_RE = re.compile(r"default\s+(?:'([^']*)'|(\S+))", re.I)

# clauses that are VALID MySQL ALTER but touch no column data — indexes,
# constraints, table options, defaults. They must parse to NO op, not be
# force-fit into a column op: 'ADD INDEX i (c)' would otherwise match
# _ADD_RE as add_column column='INDEX' type='i' (a spurious string
# column), and 'DROP INDEX i' would raise and wedge a replaying stream.
_NOOP_CLAUSE_RE = re.compile(
    r"^(?:"
    r"add\s+(?:unique\s+|fulltext\s+|spatial\s+)?(?:index|key)\b"
    r"|add\s+(?:constraint|primary|foreign|unique|check)\b"
    r"|drop\s+(?:index|key|constraint|check)\b"
    r"|drop\s+(?:primary|foreign)\s+key\b"
    r"|rename\s+(?:index|key)\b"
    r"|alter\s+(?:column\s+)?`?\w+`?\s+(?:set|drop)\s+default\b"
    r"|alter\s+(?:index|check|constraint)\b"
    r"|(?:engine|auto_increment|comment|row_format|algorithm|lock)\s*=?"
    r"|(?:default\s+)?(?:character\s+set|charset|collate)\b"
    r"|convert\s+to\b"
    r"|order\s+by\b"
    r"|(?:enable|disable)\s+keys\b"
    r"|force\b"
    r")",
    re.I,
)


@dataclass
class AlterOp:
    """Normalized DDL op (the reference's ParseRet, convert.py:48-79)."""

    schema: str | None
    table: str
    action: str  # add_column | drop_column | rename_column | modify_column
    column: str
    new_column: str | None = None  # rename target
    type_str: str | None = None
    nullable: bool = True
    default: str | None = None

    @property
    def spark_type(self):
        return source_type_to_spark(self.type_str) if self.type_str else None


def parse_alter(sql: str) -> list[AlterOp]:
    """Parse one MySQL ALTER TABLE statement (possibly multi-clause)."""
    m = _ALTER_RE.match(sql.strip().rstrip(";"))
    if not m:
        raise ValueError(f"not an ALTER TABLE statement: {sql!r}")
    schema, table, body = m.group(1), m.group(2), m.group(3)
    ops: list[AlterOp] = []
    # split clauses on top-level commas (types like decimal(10,2) contain
    # commas inside parens — track depth)
    clauses, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            clauses.append(body[start:i])
            start = i + 1
    clauses.append(body[start:])
    for clause in (c.strip() for c in clauses if c.strip()):
        op = _parse_clause(schema, table, clause)
        if op is not None:
            ops.append(op)
    return ops


def _parse_clause(schema: str | None, table: str, clause: str) -> AlterOp | None:
    if _NOOP_CLAUSE_RE.match(clause):
        return None  # index/constraint/table-option clause: no column data
    if m := _ADD_RE.match(clause):
        rest = m.group("rest") or ""
        dm = _DEFAULT_RE.search(rest)
        default = (dm.group(1) or dm.group(2)) if dm else None
        # `DEFAULT NULL` (the form MySQL itself emits) means SQL NULL, not
        # the 4-char string "null" — only the unquoted keyword qualifies
        if dm and dm.group(1) is None and default and default.lower() == "null":
            default = None
        return AlterOp(
            schema, table, "add_column", m.group(1), None, m.group(2).strip(),
            nullable="not null" not in rest.lower(),
            default=default,
        )
    if m := _DROP_RE.match(clause):
        return AlterOp(schema, table, "drop_column", m.group(1))
    if m := _CHANGE_RE.match(clause):
        return AlterOp(
            schema, table, "rename_column", m.group(1), m.group(2), m.group(3).strip()
        )
    if m := _MODIFY_RE.match(clause):
        rest = m.group("rest") or ""
        return AlterOp(
            schema, table, "modify_column", m.group(1), None, m.group(2).strip(),
            nullable="not null" not in rest.lower(),
        )
    raise ValueError(f"unsupported ALTER clause: {clause!r}")


def apply_alter(df: DataFrame, ops: list[AlterOp]) -> DataFrame:
    """Apply parsed DDL ops to a DataFrame (projection-based evolution).

    add_column -> lit(default) cast to the mapped type (D3);
    drop_column -> drop (D4); rename_column -> withColumnRenamed (D5);
    modify_column -> cast (D6). The projection fuses into the next write.
    """
    out = df
    for op in ops:
        if op.action == "add_column":
            value = F.lit(op.default).cast(op.spark_type) if op.default is not None else F.lit(
                None
            ).cast(op.spark_type)
            out = out.withColumn(op.column, value)
        elif op.action == "drop_column":
            out = out.drop(op.column)
        elif op.action == "rename_column":
            out = out.withColumnRenamed(op.column, op.new_column)
            if op.type_str:
                cur = dict(out.dtypes).get(op.new_column)
                target = op.spark_type
                if target is not None and cur != target.simpleString():
                    out = out.withColumn(op.new_column, F.col(op.new_column).cast(target))
        elif op.action == "modify_column":
            out = out.withColumn(op.column, F.col(op.column).cast(op.spark_type))
        else:
            raise ValueError(f"unknown DDL action {op.action}")
    return out
