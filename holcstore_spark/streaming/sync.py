"""Incremental store-to-store sync — the reference's client↔server CDC
protocol (hostore/utils/ts_sync.py:204-261) re-expressed table-to-table.

Protocol (identical semantics, no HTTP required — a REST shim can wrap the
same three calls):

1. client computes ``since = last_updated_at(filters)`` locally — a
   *per-filter* watermark (reference: ts_sync.py:219; proven per-filter by
   test_chunk_timeserie_sync.py:263-282);
2. server lists chunk states with ``updated_at >= since`` in deterministic
   order, paginated (reference: chunk_timeserie_store.py:545-607);
3. per page: tombstones apply locally first (delete + stamp the *server's*
   updated_at so the watermark advances, ts_sync.py:241-246), then alive
   chunks are fetched in batches and imported atomically;
4. crash-resume is idempotent: the watermark only advances through imported
   rows, and ``>=`` re-fetches the boundary (reference:
   test_chunk_timeserie_sync.py:223-261).
"""

from __future__ import annotations

import pandas as pd

from holcstore_spark.sources.chunk_store import ChunkStore
from holcstore_spark.sources.io_util import safe_local_checkpoint


class SyncCrash(Exception):
    """Injected mid-pull failure for crash-resume tests."""


class SyncClient:
    def __init__(self, server: ChunkStore, client: ChunkStore):
        if server.config.keys != client.config.keys:
            raise ValueError("server and client stores must share key columns")
        if not server.config.allow_sync or not client.config.allow_sync:
            raise ValueError("both stores must be created with allow_sync=True")
        self.server = server
        self.client = client

    def pull(
        self,
        filters: dict | None = None,
        page_size: int = 200,
        crash_after_pages: int | None = None,
    ) -> int:
        """Pull server changes since the client's watermark. Returns the
        number of chunk states applied.

        Only chunk *states* (page_size meta rows) ever reach the driver;
        the data rows travel server→client as one Spark frame per page
        (export semi-join → partition rewrite), so a bootstrap pull does
        O(pages) partition rewrites and the per-page transfer scales with
        the cluster, not the driver."""
        since = self.client.last_updated_at(filters)
        # materialize the ordered feed once (checkpoint cuts the plan to the
        # sorted result) so each page is a cheap slice — offset/limit over
        # the raw plan would re-window and re-sort the whole feed per page
        feed = safe_local_checkpoint(
            self.server.updates(since=since, filters=filters)
        )
        applied = 0
        keys = list(self.server.config.keys)
        page_no = 0
        while True:
            # Spark-side pagination over the deterministic ordering: driver
            # memory is bounded by page_size, matching the reference's
            # server-side pagination (chunk_timeserie_store.py:545-607)
            page = feed.offset(page_no * page_size).limit(page_size).toPandas()
            if len(page) == 0:
                break
            if crash_after_pages is not None and page_no >= crash_after_pages:
                raise SyncCrash(f"injected crash before page {page_no}")
            tombs = page[page["is_deleted"]]
            alive = page[~page["is_deleted"]]
            if len(tombs):
                # apply tombstones with the server's stamps so the watermark
                # advances even when a page is deletes-only
                self.client.import_chunks(tombs.copy(), pd.DataFrame())
                applied += len(tombs)
            if len(alive):
                spec = alive[[*keys, "chunk_index"]].to_dict("records")
                data_sdf = self.server.export_chunks_sdf(spec)
                self.client.import_chunks_sdf(alive.copy(), data_sdf)
                applied += len(alive)
            page_no += 1
        return applied
