"""Source operators (SURVEY.md §2.1 S1–S8)."""

from high_volume_market_data_pipeline_spark.sources.readers import (
    json_strings_to_df,
    read_binary_files,
    read_csv,
    read_json,
    read_orc,
    read_xml,
    read_parquet,
    rows_to_df,
)
from high_volume_market_data_pipeline_spark.sources.generator import (
    generate_market_data,
)

__all__ = [
    "generate_market_data",
    "json_strings_to_df",
    "read_binary_files",
    "read_csv",
    "read_json",
    "read_orc",
    "read_xml",
    "read_parquet",
    "rows_to_df",
]
