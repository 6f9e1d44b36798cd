"""SQL surface: expose stores as temp views so any engine operation can be
written (and verified) in plain ``spark.sql`` (SURVEY §7.1 ``sql/``).

The views carry the same plans the Python API builds, so pruning/pushdown
behave identically — but a temp view is a POINT-IN-TIME snapshot: it pins
the file listing (and cached meta state) resolved at registration. After
any store write, call ``register_*`` again to refresh; querying a stale
view of a rewritten table can fail on deleted files. (The Python API
re-resolves per call and has no such staleness.)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from holcstore_spark.functions.naming import safe_name
from holcstore_spark.sources.attr_store import AttrStore
from holcstore_spark.sources.chunk_store import ChunkStore
from holcstore_spark.sources.kv_store import KeyValueStore


def register_chunk_store(store: ChunkStore, prefix: str) -> list[str]:
    """Create ``{prefix}_data``, ``{prefix}_meta``, ``{prefix}_alive``
    temp views (over-limit names are truncated with a digest suffix —
    F7, reference chunk_timeserie_store.py:54-91). Returns the view
    names actually registered."""
    views = {
        safe_name(f"{prefix}_data"): store.data(),
        safe_name(f"{prefix}_meta"): store.latest_meta(),
        safe_name(f"{prefix}_alive"): store.alive_data(),
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return list(views)


def register_kv_store(store: KeyValueStore, prefix: str) -> list[str]:
    name = safe_name(f"{prefix}_rows")
    store.df().createOrReplaceTempView(name)
    return [name]


def register_attr_store(store: AttrStore, prefix: str) -> list[str]:
    name = safe_name(f"{prefix}_rows")
    store.df().createOrReplaceTempView(name)
    return [name]


def sql(spark: SparkSession, query: str):
    """Convenience passthrough (kept for symmetry/discoverability)."""
    return spark.sql(query)
