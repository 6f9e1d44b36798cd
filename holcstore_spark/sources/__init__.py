from holcstore_spark.sources.chunk_store import ChunkStore, KeyExistsError
from holcstore_spark.sources.kv_store import KeyValueStore
from holcstore_spark.sources.attr_store import AttrStore

__all__ = ["ChunkStore", "KeyValueStore", "AttrStore", "KeyExistsError"]
