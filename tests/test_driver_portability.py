"""Driver-contract portability: the harness may launch its driver from ANY
cwd with a PLAIN SparkSession (the verify skill's step-1 recipe, automated).

Python workers inherit the driver cwd, so any Arrow kernel whose closure
references a repo-package symbol by name (cloudpickle's by-reference path
for importable module-level defs) explodes with ModuleNotFoundError on the
workers the moment the driver is launched outside the repo root. The r8
`image_decode_stats` defect was exactly this; this test makes cwd
portability a standing gate instead of a judge's spot-check.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# entry() plus the Arrow-kernel queries: every mapInPandas/mapInArrow/
# pandas_udf family in the tree has one representative here, with the
# r8 offender (image_decode_stats) first. The two Python-DataSource
# queries pin the OTHER foreign-cwd trap: Spark runs DataSource
# plan-time methods (schema/offsets/partitions) in a fresh python
# runner process that inherits the driver cwd, so the sources must
# pickle by value and parse their formats without repo imports.
_QUERIES = (
    "image_decode_stats",
    "image_decode_palette_stats",
    "multimodal_byte_features",
    "knn_bruteforce_cosine",
    "knn_pq_adc",
    "paged_feed_rollup",
    "stream_table_appends",
)

_DRIVER_CODE = """
import importlib.util, sys
sys.path.insert(0, {repo!r})
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {repo!r} + "/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
sf = "/root/testdata/sf0.001"
assert len(mod.entry(spark).collect()) >= 0
qs = mod.queries()
for name in {queries!r}:
    rows = qs[name](spark, sf).collect()
    assert rows, name + " returned no rows"
    print(name, "ok", len(rows))
spark.stop()
"""


def test_entry_and_arrow_kernels_run_from_foreign_cwd():
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_CODE.format(repo=REPO, queries=_QUERIES)],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, (
        f"driver run from /tmp failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    for name in _QUERIES:
        assert f"{name} ok" in proc.stdout
