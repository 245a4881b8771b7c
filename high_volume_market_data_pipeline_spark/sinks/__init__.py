"""Sink operators (SURVEY.md §2.2 K1–K6, §2.9 M1–M6).

Delta-lake behaviors (MERGE, replaceWhere, OPTIMIZE/Z-ORDER, VACUUM) are
provided with parquet-native equivalents that preserve the observable
semantics, switching to real Delta implementations when ``delta-spark`` is
importable (SURVEY §7.3 degradation plan).
"""

from high_volume_market_data_pipeline_spark.sinks.writers import (
    write_partition_scoped_overwrite,
    write_partitioned_overwrite,
    write_single_csv,
    write_training_shards,
)
from high_volume_market_data_pipeline_spark.sinks.merge import merge_upsert
from high_volume_market_data_pipeline_spark.sinks.bucketed import (
    drop_table,
    read_table,
    write_bucketed_table,
)
from high_volume_market_data_pipeline_spark.sinks.maintenance import (
    compact_table,
    zorder_cluster,
)

__all__ = [
    "compact_table",
    "drop_table",
    "read_table",
    "write_bucketed_table",
    "merge_upsert",
    "write_partition_scoped_overwrite",
    "write_partitioned_overwrite",
    "write_single_csv",
    "write_training_shards",
    "zorder_cluster",
]
