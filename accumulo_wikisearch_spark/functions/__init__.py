from accumulo_wikisearch_spark.functions.normalize import (
    normalize_col,
    normalize_str,
    tokenize_col,
    hash60_col,
    HASH60_DUCKDB,
)

__all__ = [
    "normalize_col",
    "normalize_str",
    "tokenize_col",
    "hash60_col",
    "HASH60_DUCKDB",
]
