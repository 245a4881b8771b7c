"""Sink operators (SURVEY.md §2.2 K1–K6, §2.9 M1–M6).

Delta-lake behaviors (MERGE, replaceWhere, OPTIMIZE/Z-ORDER, VACUUM,
history/time travel) are provided as parquet-native implementations that
preserve the observable semantics. The transactional backbone is the
manifest-log table (``history.VersionedParquetTable`` — snapshot dirs +
atomic manifest commits, the same data-files-plus-ordered-log layout Delta
uses); ``merge.merge_upsert_versioned`` runs MERGE through it. This is the
primary and only executed path: ``delta-spark`` cannot be installed in this
environment, so no dormant Delta branches are carried (SURVEY §7.3
degradation plan, NOTES.md round-3 entry).
"""

from high_volume_market_data_pipeline_spark.sinks.writers import (
    write_partition_scoped_overwrite,
    write_partitioned_overwrite,
    write_single_csv,
    write_training_shards,
)
from high_volume_market_data_pipeline_spark.sinks.history import (
    VersionedParquetTable,
)
from high_volume_market_data_pipeline_spark.sinks.merge import (
    merge_upsert,
    merge_upsert_versioned,
    merged_state,
)
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
    "VersionedParquetTable",
    "compact_table",
    "drop_table",
    "read_table",
    "write_bucketed_table",
    "merge_upsert",
    "merge_upsert_versioned",
    "merged_state",
    "write_partition_scoped_overwrite",
    "write_partitioned_overwrite",
    "write_single_csv",
    "write_training_shards",
    "zorder_cluster",
]
