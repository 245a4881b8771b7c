"""K6 — persistent catalog registration (Hive metastore on Derby).

Reference contract (main_pipeline.py:189-218): register external tables in
a metastore and verify with SHOW TABLES; registrations must survive the
session. Runs in SUBPROCESSES because the shared pytest SparkSession owns
this process's JVM — persistence across two separate driver processes is
exactly the property under test.
"""

from __future__ import annotations

import subprocess
import sys

from tests.conftest import SF_DIR

_REGISTER = """
import sys
sys.path.insert(0, "/root/repo")
from high_volume_market_data_pipeline_spark.session import (
    build_metastore_session, stop_session,
)
from high_volume_market_data_pipeline_spark.catalog import (
    register_catalog_tables,
)
spark = build_metastore_session({root!r}, master="local[2]")
registered = register_catalog_tables(spark, {sf_dir!r}, database="hvmdp")
print("REGISTERED", len(registered))
stop_session(spark)
"""

_READBACK = """
import sys
sys.path.insert(0, "/root/repo")
from high_volume_market_data_pipeline_spark.session import (
    build_metastore_session, stop_session,
)
spark = build_metastore_session({root!r}, master="local[2]")
tables = [r.tableName for r in spark.sql("SHOW TABLES IN hvmdp").collect()]
n = spark.sql("SELECT COUNT(*) AS n FROM hvmdp.nation").collect()[0]["n"]
print("TABLES", len(tables), "NATION_ROWS", n)
stop_session(spark)
"""


def _run(code: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_catalog_registration_survives_the_session(tmp_path):
    root = str(tmp_path / "meta")
    out1 = _run(_REGISTER.format(root=root, sf_dir=SF_DIR))
    assert "REGISTERED 10" in out1
    # A brand-new driver process, same metastore root: tables still there
    # and queryable — the reference's Hive-registration contract.
    out2 = _run(_READBACK.format(root=root))
    assert "TABLES 10" in out2
    assert "NATION_ROWS 25" in out2
