"""Set operators (union / intersect / except) as named library operators.

The reference never uses set ops (SURVEY §2.7 note: union is library-mandated
for idiomatic multi-batch concatenation, extract_crypto_data.py:100's Python
list.extend being the non-Spark form; `union_all` lives in operators/sorts.py).
INTERSECT/EXCEPT plan as hash
LeftSemi/LeftAnti joins over distinct inputs — one shuffle per side on the
full row as key, broadcastable when one side is small. Prefer these over
`collect`-and-diff driver logic: cohort membership at 100 TB stays
distributed end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def intersect_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """ANSI INTERSECT (distinct rows present in both). Plans as aggregate +
    left-semi hash join."""
    return left.intersect(right)


def except_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """ANSI EXCEPT (distinct left rows absent from right). Plans as
    aggregate + left-anti hash join."""
    return left.subtract(right)
