"""Reference-DDL schema translation — port a SkinnerDB schema file to Spark.

The reference creates tables from DDL with its own type strings
(src/ddl/TableCreator.java:41-80; recognized types src/types/TypeUtil.java:120-153,
where NUMERIC/DECIMAL map to double and column flags are
primary/unique/not-null/foreign — src/catalog/info/ColumnInfo.java:13-56).
A reference user's `skinner.schema.sql` runs through :func:`translate_ddl`
unchanged and yields Spark `StructType`s + canonical Spark DDL, so their
existing schemas port without edits.

Constraint flags are parsed and *recorded* but not enforced — Spark (like the
reference, which only stores them) treats them as metadata; at scale they
inform bucketing/partitioning choices instead.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

#: reference type string -> Spark type (TypeUtil.java:120-153 parity)
_TYPE_MAP: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "tinyint": T.ByteType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "smallint": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "double": T.DoubleType(),
    "float": T.DoubleType(),
    "real": T.DoubleType(),
    # the reference maps NUMERIC/DECIMAL to double (no exact decimal)
    "numeric": T.DoubleType(),
    "decimal": T.DoubleType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "text": T.StringType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "time": T.IntegerType(),  # reference stores TIME as epoch-second int
    "timestamp": T.TimestampNTZType(),
}

_FLAGS = ("primary key", "unique", "not null", "references")


@dataclass
class TableDef:
    name: str
    schema: T.StructType
    flags: dict[str, list[str]] = field(default_factory=dict)

    def spark_ddl(self) -> str:
        cols = ", ".join(f"{f.name} {f.dataType.simpleString().upper()}" for f in self.schema)
        return f"CREATE TABLE {self.name} ({cols}) USING parquet"


def _parse_type(type_str: str) -> T.DataType:
    base = re.match(r"([a-z]+)", type_str.strip().lower())
    if not base or base.group(1) not in _TYPE_MAP:
        raise ValueError(f"unrecognized reference type: {type_str!r}")
    return _TYPE_MAP[base.group(1)]


def translate_ddl(ddl_text: str) -> list[TableDef]:
    """Translate one or more reference CREATE TABLE statements."""
    tables: list[TableDef] = []
    for m in re.finditer(
        r"create\s+table\s+(\w+)\s*\((.*?)\)\s*;", ddl_text, re.IGNORECASE | re.DOTALL
    ):
        name, body = m.group(1), m.group(2)
        fields: list[T.StructField] = []
        flags: dict[str, list[str]] = {f: [] for f in _FLAGS}
        # split on commas not inside parens (e.g. decimal(12,2))
        for coldef in re.split(r",(?![^()]*\))", body):
            coldef = coldef.strip()
            if not coldef:
                continue
            lowered = coldef.lower()
            if lowered.startswith(("primary key", "foreign key", "unique (")):
                continue  # table-level constraint: metadata only
            parts = coldef.split(None, 1)
            col_name, rest = parts[0], parts[1] if len(parts) > 1 else "string"
            dtype = _parse_type(rest)
            nullable = "not null" not in rest.lower()
            for flag in _FLAGS:
                if flag in rest.lower():
                    flags[flag].append(col_name)
            fields.append(T.StructField(col_name, dtype, nullable))
        tables.append(TableDef(name, T.StructType(fields), flags))
    return tables
