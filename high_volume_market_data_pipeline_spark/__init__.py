"""high_volume_market_data_pipeline_spark — a PySpark-native analytics engine.

A clean-room, Spark-first rebuild of the query/data-processing capabilities of
the reference pipeline ``matankaisman88/High-Volume-Market-Data-Pipeline``
(surveyed in /root/repo/SURVEY.md), extended with large-scale dedup /
similarity / text / streaming operators.

Design stance (SURVEY.md §7.1): a library of named, composable,
individually-verified DataFrame operators plus a pipeline-assembly layer.
Everything is declarative DataFrame API so Catalyst/AQE/Tungsten do the
physical planning; Python UDFs only where builtins genuinely can't express
the semantics (Arrow-batched pandas UDFs, never per-row).
"""

from high_volume_market_data_pipeline_spark.session import build_session, stop_session

__version__ = "0.1.0"

__all__ = ["build_session", "stop_session", "__version__"]
