from holcstore_spark.functions.scalar import (
    chunk_index_col,
    chunk_index_of,
    eq_null_safe,
    local_ts,
    nan_to_null,
    to_utc_instant,
)

__all__ = [
    "chunk_index_col",
    "chunk_index_of",
    "eq_null_safe",
    "local_ts",
    "nan_to_null",
    "to_utc_instant",
]
