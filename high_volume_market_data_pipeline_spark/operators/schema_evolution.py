"""Schema evolution / drift detection.

The reference handles schema change with a blanket
``option("overwriteSchema", "true")`` on every overwrite
(extract_crypto_data.py:221, bronze_to_silver_crypto.py:115,
silver_to_gold_crypto_stats.py:96) — any drift silently rewrites the table
schema. A general engine should *see* the drift before deciding: diff the
incoming batch's schema against the table's, then apply an explicit
policy (align + evolve additively, or reject).

Everything here is driver-side StructType metadata work — zero jobs, zero
data movement; ``align_to_schema`` emits a plain projection that fuses into
the write plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass
class SchemaDiff:
    """Field-level difference between an existing table schema and an
    incoming batch schema."""

    added: list[str] = field(default_factory=list)      # only in incoming
    removed: list[str] = field(default_factory=list)    # only in existing
    retyped: list[tuple[str, str, str]] = field(default_factory=list)
    # (name, existing_type, incoming_type)

    @property
    def is_compatible_append(self) -> bool:
        """True iff incoming rows can append after aligning: no retyped
        columns (additive evolution and dropped columns null-fill)."""
        return not self.retyped

    @property
    def unchanged(self) -> bool:
        return not (self.added or self.removed or self.retyped)


def schema_diff(existing: StructType, incoming: StructType) -> SchemaDiff:
    """Name-keyed field diff (order-insensitive — column order is not a
    schema contract in columnar tables)."""
    old = {f.name: f.dataType.simpleString() for f in existing.fields}
    new = {f.name: f.dataType.simpleString() for f in incoming.fields}
    return SchemaDiff(
        added=sorted(n for n in new if n not in old),
        removed=sorted(n for n in old if n not in new),
        retyped=sorted(
            (n, old[n], new[n]) for n in old.keys() & new.keys()
            if old[n] != new[n]
        ),
    )


def align_to_schema(
    df: DataFrame,
    target: StructType,
    keep_extra: bool = False,
) -> DataFrame:
    """Project ``df`` onto ``target``'s columns: missing columns null-fill
    with the target type, present columns try_cast to it (null on
    conversion failure — a malformed value must not kill an ANSI-mode job
    ten hours in; pair with check_expectations to count the nulls), extra
    columns drop unless ``keep_extra`` (additive evolution — they append
    after the target's columns, the Delta/iceberg mergeSchema behavior).
    A pure projection — Catalyst fuses it into the surrounding plan."""
    have = {f.name for f in df.schema.fields}
    cols = [
        (F.col(f.name).try_cast(f.dataType) if f.name in have
         else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in target.fields
    ]
    if keep_extra:
        cols += [
            F.col(n) for n in df.columns
            if n not in {f.name for f in target.fields}
        ]
    return df.select(*cols)
