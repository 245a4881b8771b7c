"""Named, composable relational operators (SURVEY.md §2.3–2.8).

Each operator is a plain function DataFrame → DataFrame so compositions stay
inside one Catalyst plan (no materialization between operators); the optimizer
sees the whole tree and can push filters/prune columns across operator
boundaries.
"""

from high_volume_market_data_pipeline_spark.operators.projection import (
    enrich_ingestion,
    project_cast,
    select_columns,
)
from high_volume_market_data_pipeline_spark.operators.dedup import (
    dedup_exact,
    dedup_keep_latest,
)
from high_volume_market_data_pipeline_spark.operators.ranking import (
    rank_top_k_per_group,
    row_number_top_k_per_group,
)
from high_volume_market_data_pipeline_spark.operators.aggregates import (
    distinct_values,
    grouped_agg,
)
from high_volume_market_data_pipeline_spark.operators.joins import (
    anti_join,
    broadcast_join,
    cross_join,
    equi_join,
    semi_join,
)
from high_volume_market_data_pipeline_spark.operators.sorts import (
    global_sort,
    top_k_global,
    union_all,
)
from high_volume_market_data_pipeline_spark.operators.skew import (
    salted_grouped_agg,
    salted_join,
)
from high_volume_market_data_pipeline_spark.operators.setops import (
    except_distinct,
    intersect_distinct,
)
from high_volume_market_data_pipeline_spark.operators.sampling import (
    group_cap_sample,
    hash_bucket,
    hash_rate_sample,
    hash_split,
)
from high_volume_market_data_pipeline_spark.operators.schema_evolution import (
    SchemaDiff,
    align_to_schema,
    schema_diff,
)
from high_volume_market_data_pipeline_spark.operators.quality import (
    check_expectations,
    check_referential,
    column_stats,
    observed,
    write_observed,
)
from high_volume_market_data_pipeline_spark.operators.layout import (
    compact_output,
    copartition_by,
    ensure_parallelism,
    materialize,
)

__all__ = [
    "SchemaDiff",
    "align_to_schema",
    "anti_join",
    "check_expectations",
    "check_referential",
    "column_stats",
    "observed",
    "write_observed",
    "except_distinct",
    "group_cap_sample",
    "hash_bucket",
    "hash_rate_sample",
    "hash_split",
    "intersect_distinct",
    "broadcast_join",
    "cross_join",
    "dedup_exact",
    "dedup_keep_latest",
    "distinct_values",
    "enrich_ingestion",
    "equi_join",
    "global_sort",
    "grouped_agg",
    "project_cast",
    "rank_top_k_per_group",
    "row_number_top_k_per_group",
    "select_columns",
    "schema_diff",
    "semi_join",
    "top_k_global",
    "union_all",
    "compact_output",
    "copartition_by",
    "ensure_parallelism",
    "materialize",
    "salted_grouped_agg",
    "salted_join",
]
