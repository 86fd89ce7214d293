"""Additive schema-evolution resolver.

The reference's schema "evolution" is static list-splicing between table
generations (/root/reference/fintick/bqloader/schema.py:23-47 — SURVEY.md
§1.2). Here it is dynamic, Iceberg-style, applied to the lake table's
manifest schema before each MERGE (north_star): new columns are added
nullable, integral/floating types may widen (int→long, float→double,
decimal precision growth), and **narrowing or incompatible changes are
rejected** — history is never rewritten; old data files simply lack the
new columns (read as null) or hold the narrower physical type (widened on
read — Spark 4 parquet readers support widening promotion).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    """Batch schema requires a non-additive (narrowing/incompatible) change."""


#: allowed widenings: source type -> set of wider types
_WIDEN: dict[str, set[str]] = {
    "byte": {"short", "integer", "long"},
    "short": {"integer", "long"},
    "integer": {"long"},
    "float": {"double"},
    "date": {"timestamp"},
}


def _is_widening(frm: T.DataType, to: T.DataType) -> bool:
    if frm == to:
        return True
    if isinstance(frm, T.DecimalType) and isinstance(to, T.DecimalType):
        return (
            to.precision >= frm.precision
            and to.scale >= frm.scale
            and (to.precision - to.scale) >= (frm.precision - frm.scale)
        )
    return to.typeName() in _WIDEN.get(frm.typeName(), set())


@dataclass
class SchemaChange:
    kind: str  # 'add' | 'widen'
    column: str
    from_type: str | None
    to_type: str


@dataclass
class Resolution:
    schema: T.StructType
    changes: list[SchemaChange] = field(default_factory=list)

    @property
    def changed(self) -> bool:
        return bool(self.changes)


def resolve_schema(table: T.StructType, batch: T.StructType) -> Resolution:
    """Resolve ``table`` ∪ ``batch`` under additive-evolution rules.

    Returns the (possibly widened/extended) table schema. Column order:
    existing table columns first (stable field ids by position), new batch
    columns appended in batch order — matching Iceberg's add-column
    semantics.
    """
    by_name = {f.name: f for f in batch.fields}
    out: list[T.StructField] = []
    changes: list[SchemaChange] = []

    for f in table.fields:
        b = by_name.get(f.name)
        if b is None or b.dataType == f.dataType:
            out.append(f)
            continue
        if _is_widening(f.dataType, b.dataType):
            out.append(T.StructField(f.name, b.dataType, True))
            changes.append(
                SchemaChange("widen", f.name, f.dataType.simpleString(), b.dataType.simpleString())
            )
        elif _is_widening(b.dataType, f.dataType):
            # batch is narrower than table — fine, cast up on ingest
            out.append(f)
        else:
            raise SchemaEvolutionError(
                f"incompatible change for column {f.name!r}: "
                f"{f.dataType.simpleString()} -> {b.dataType.simpleString()}"
            )

    table_names = {f.name for f in table.fields}
    for f in batch.fields:
        if f.name not in table_names:
            out.append(T.StructField(f.name, f.dataType, True))  # new cols nullable
            changes.append(SchemaChange("add", f.name, None, f.dataType.simpleString()))

    return Resolution(T.StructType(out), changes)


def conform(df, schema: T.StructType):
    """Project/cast a DataFrame to the resolved schema (missing → null,
    narrower physical → cast up). Catalyst folds these casts into the scan."""
    from pyspark.sql import functions as F

    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
