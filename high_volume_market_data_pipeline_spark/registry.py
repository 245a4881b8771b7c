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


_DEC = "decimal(18,4)"


def dsum(col: F.Column):
    """Exact decimal sum of a double expression (order-independent)."""
    return F.sum(col.cast(_DEC)).cast("decimal(38,4)")


def davg(col: F.Column):
    """Deterministic average: exact decimal sum → double ÷ non-null count."""
    return F.round(F.sum(col.cast(_DEC)).cast("double") / F.count(col), 6)


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DECIMAL(38,4))"


def davg_sql(expr: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"
        f" / COUNT({expr}), 6)"
    )
