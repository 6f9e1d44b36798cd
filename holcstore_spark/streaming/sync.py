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

Two physical strategies, picked automatically:

- **bulk** — when NO incoming (keys, chunk) pair physically exists
  client-side (bootstrap of a fresh replica, or an incremental pull of
  brand-new chunks/keys — the daily-append case), every page's
  partition-rewrite would be a pure append anyway, so the whole backlog
  lands as ONE distributed data append + ONE meta append. A crash
  between the two writes is safe: data without meta is invisible on a
  sync store (``alive_data`` keeps its meta semi-join), and the resume
  pull's overlap probe sees the orphaned physical rows and falls back
  to the rewrite path, which dedupes by (keys, chunk).
- **paged incremental** — the general path. The ordered feed is
  checkpointed once and streamed through ``toLocalIterator`` (one linear
  pass; driver memory bounded by ``page_size``), instead of one
  ``offset(n·p).limit(p)`` job per page, which re-skipped the whole feed
  every page.
"""

from __future__ import annotations

from itertools import islice

import pandas as pd
from pyspark.sql import functions as F

from holcstore_spark.sources.chunk_store import ChunkStore
from holcstore_spark.sources.io_util import has_parquet, safe_local_checkpoint


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
        the data rows travel server→client as Spark frames (export
        semi-join → append/rewrite), so the transfer scales with the
        cluster, not the driver."""
        since = self.client.last_updated_at(filters)
        feed = self.server.updates(since=since, filters=filters)
        # the >= watermark resume re-fetches the boundary states every
        # pull; states the client already holds VERBATIM (same keys,
        # chunk, op_id) need no re-import — dropping them is idempotent
        # (their stamps are already in the client meta, so the watermark
        # is unaffected) and is what lets a daily-append pull see only
        # genuinely-new chunks and take the bulk path below
        if not self.client._meta_empty():  # layout-aware (plain dir / ACID manifest)
            applied = self.client.latest_meta(filters).select(
                *self.server.config.keys, "chunk_index", "op_id"
            )
            # no broadcast hint: the client meta can be store-sized while
            # an incremental feed is tiny (or vice versa on bootstrap) —
            # AQE picks the side to broadcast
            feed = feed.join(
                applied,
                on=[*self.server.config.keys, "chunk_index", "op_id"],
                how="left_anti",
            )
        # re-assert the feed's total order AFTER the anti-join: a shuffle
        # join (AQE's pick when client meta is store-sized) repartitions
        # and would otherwise hand the pager pages in arbitrary order,
        # breaking the prefix property crash-resume depends on
        feed = feed.orderBy(
            "updated_at", *self.server.config.keys, "chunk_index"
        )
        # materialize the ordered feed once (checkpoint cuts the plan to the
        # sorted result); both strategies below then read the frozen frame
        feed = safe_local_checkpoint(feed)
        # Bulk fast path: when NO incoming (keys, chunk) pair physically
        # exists client-side, every per-page partition rewrite would be a
        # pure append — import the whole backlog in one shot. Covers the
        # bootstrap (no client data at all) AND the daily-append
        # replication case (incremental pull of brand-new chunks/keys).
        # Crash injection forces the paged path so the injected page
        # boundary stays meaningful.
        if crash_after_pages is None and not self._any_physical_overlap(feed):
            return self._pull_bulk(feed)
        return self._pull_paged(feed, page_size, crash_after_pages)

    def _any_physical_overlap(self, feed) -> bool:
        """Whether any incoming (keys, chunk) pair already has PHYSICAL
        client rows (data, not meta: orphans from a crashed bulk import
        count, so the resume takes the deduping rewrite path). The probe
        prunes the client scan to the incoming chunk partitions first —
        its cost scales with the touched chunks, not the client store."""
        if not self.client.has_data():
            return False
        keys = list(self.server.config.keys)
        pairs = feed.filter(~F.col("is_deleted")).select(*keys, "chunk_index")
        chunks = [r[0] for r in pairs.select("chunk_index").distinct().collect()]
        if not chunks:
            return False
        probe = (
            self.client.data()
            .filter(F.col("chunk_index").isin(chunks))
            .join(pairs, on=[*keys, "chunk_index"], how="left_semi")
        )
        return bool(probe.limit(1).count())

    def _pull_bulk(self, feed) -> int:
        """One data append + one meta append for the full backlog."""
        keys = list(self.server.config.keys)
        total = feed.count()
        if total == 0:
            return 0
        alive_pairs = feed.filter(~F.col("is_deleted")).select(*keys, "chunk_index")
        # no broadcast hint: a full-bootstrap spec is every alive chunk of
        # the server — let AQE pick the join strategy for the semi-join
        data_sdf = self.server.export_chunks_sdf(alive_pairs, hint_broadcast=False)
        # data first, meta (the watermark carrier) last — see module doc;
        # on ACID clients both land in one atomic commit
        self.client.append_import(data_sdf, feed)
        return total

    def _pull_paged(
        self, feed, page_size: int, crash_after_pages: int | None
    ) -> int:
        applied = 0
        keys = list(self.server.config.keys)
        page_no = 0
        # one linear pass over the checkpointed feed: toLocalIterator
        # streams the globally-sorted result partition by partition, so
        # driver memory stays bounded by page_size without per-page
        # offset/limit jobs (reference's server-side pagination,
        # chunk_timeserie_store.py:545-607)
        rows = feed.toLocalIterator()
        while True:
            batch = list(islice(rows, page_size))
            if not batch:
                break
            page = pd.DataFrame([r.asDict() for r in batch])
            if crash_after_pages is not None and page_no >= crash_after_pages:
                raise SyncCrash(f"injected crash before page {page_no}")
            # apply the page as contiguous same-kind runs IN updated_at
            # order: whatever a crash leaves applied is then a PREFIX of
            # the ordered feed, so the >= watermark resume re-fetches
            # every unapplied row. Splitting into all-tombstones-first
            # would let a tombstone's later stamp advance the watermark
            # past unapplied alive rows (or vice versa) and lose them.
            runs = (page["is_deleted"] != page["is_deleted"].shift()).cumsum()
            for _, run in page.groupby(runs, sort=False):
                if bool(run["is_deleted"].iloc[0]):
                    self.client.import_chunks(run.copy(), pd.DataFrame())
                else:
                    spec = run[[*keys, "chunk_index"]].to_dict("records")
                    data_sdf = self.server.export_chunks_sdf(spec)
                    self.client.import_chunks_sdf(run.copy(), data_sdf)
                applied += len(run)
            page_no += 1
        return applied
