"""Env-gated plan capture for INTERNAL operator frames.

The optimization deliverable wants ``explain("formatted")`` evidence for
the operators a round touches, but the interesting frames inside
lifecycle operators (the incremental-dedup store probe, the ANN append
delta) never surface as a registered query's return value — they
materialize eagerly inside the operator. This hook lets a capture run
dump those plans from the REAL code path: set
``SPARK_GRAFT_PLAN_DUMP_DIR`` and each instrumented site writes
``<name>.txt`` there. Unset (production, bench, driver runs) the hook is
one dict lookup — no plan is rendered, no I/O happens.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def dump_plan(df: DataFrame, name: str) -> None:
    out_dir = os.environ.get("SPARK_GRAFT_PLAN_DUMP_DIR")
    if not out_dir:
        return
    os.makedirs(out_dir, exist_ok=True)
    text = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
        fh.write(text)
