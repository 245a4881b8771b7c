"""Query registry + determinism helpers shared by all query modules.

The driver's correctness gate hashes values order-insensitively, so every
query must produce bit-identical values in Spark and DuckDB. Two rules make
that hold:

1. Money/double aggregates go through exact DECIMAL (``dsum``/``davg`` and
   their SQL twins) — double sums are summation-order dependent and Spark's
   partial-aggregation order differs from DuckDB's.
2. Hash-derived logic (minhash, fingerprints) uses md5 over UTF-8 bytes,
   which both engines implement bit-identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable, optionally with its
    DuckDB oracle SQL (omitted ⇒ the driver records a rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def assert_driver_safe_schema(df: DataFrame, name: str) -> None:
    """Reject array/map/struct-typed output columns on a driver-hashed query.

    Learned rule (round 3, CORRECTNESS_r03.json): the driver's correctness
    canonicalizer pandas-``sort_values`` the raw result frame and crashes
    with ``TypeError: unhashable type: 'list'`` on any array cell — so the
    driver contract de facto forbids complex-typed cells in hashed outputs.
    Oracle-backed queries must stringify collections at the output boundary
    (``concat_ws`` / integer-quantized element strings; DuckDB twin via
    ``array_to_string`` / ``string_agg``); array-typed operators stay
    available as library functions.
    """
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        raise TypeError(
            f"query {name!r} emits complex-typed columns {bad}; the driver "
            "hash crashes on array/map/struct cells — stringify them at the "
            "output boundary (see registry.assert_driver_safe_schema)"
        )


_DEC = "decimal(18,4)"


def dsum(col: F.Column):
    """Exact decimal sum of a double expression (order-independent), emitted
    as DOUBLE.

    The sum itself runs in DECIMAL(18,4) so it is summation-order
    independent; the single final decimal→double cast is correctly rounded
    in both engines. Emitting DOUBLE (not DECIMAL) matters for the driver
    hash: DuckDB's ``.df()`` coerces DECIMAL results to float64 while Spark's
    ``.toPandas()`` yields ``Decimal`` objects whose string form keeps
    trailing scale zeros (``'1259321.6100'`` vs ``'1259321.61'``) — so any
    query whose decimal output has a trailing zero hash-mismatches even
    though values are equal (the round-1 failure mode for all 10 red rows).
    """
    return F.sum(col.cast(_DEC)).cast("double")


def davg(col: F.Column):
    """Deterministic average: exact decimal sum → double ÷ non-null count."""
    return F.round(F.sum(col.cast(_DEC)).cast("double") / F.count(col), 6)


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"
        f" / COUNT({expr}), 6)"
    )
