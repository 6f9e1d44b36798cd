from holcstore_spark.streaming.sync import SyncClient

__all__ = ["SyncClient"]
