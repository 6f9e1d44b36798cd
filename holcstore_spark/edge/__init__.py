from holcstore_spark.edge.pandas_bridge import long_to_series, series_to_long

__all__ = ["long_to_series", "series_to_long"]
