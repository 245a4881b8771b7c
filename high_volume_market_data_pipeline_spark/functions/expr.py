"""Expression-shaping helpers shared across operator modules."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(col: Column, fn: Callable[[Column], Column]) -> Column:
    """Evaluate ``col`` once per row and pass the materialized value to
    ``fn`` as a bound lambda variable.

    Defeats CollapseProject-driven re-evaluation: Catalyst inlines
    projection expressions into every downstream use and higher-order
    functions are interpreted with no common-subexpression elimination, so
    an expensive expression referenced n times costs n evaluations — unless
    it is bound through a single-element ``transform(array(x), v -> ...)``,
    inside which ``v`` is a value, not an expression tree. Measured impact
    on the MinHash pipeline: 60× (see dedup/minhash.py).
    """
    return F.element_at(F.transform(F.array(col), fn), 1)
