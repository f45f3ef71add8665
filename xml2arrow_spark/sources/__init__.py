"""Sources: deterministic synthetic token tables + testdata loaders."""

from xml2arrow_spark.sources.tokens import (
    generate_tokens_arrow,
    tokens_dataframe,
    tokenize_documents,
)
from xml2arrow_spark.sources.files import parquet_file_infos, plan_parquet_tasks
from xml2arrow_spark.sources.tables import load_tables

__all__ = [
    "generate_tokens_arrow",
    "tokens_dataframe",
    "tokenize_documents",
    "load_tables",
    "parquet_file_infos",
    "plan_parquet_tasks",
]
