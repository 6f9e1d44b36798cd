"""Shared forget/tombstone machinery for the managed indexes.

The stores got soft delete in round 2 (reference parity: the chunk
store's tombstone contract, /root/reference/hostore/models/
chunk_timeserie_store.py:30-52). The managed indexes
(:class:`~holcstore_spark.sources.band_index.BandIndex`,
:class:`~holcstore_spark.sources.vector_index.VectorIndex`) need the
same capability for a different reason: at 100 TB the index outlives
any single corpus, and a takedown / right-to-erasure request must make
a document stop existing — its bands must stop suppressing new
near-duplicates, its vector must stop being returned as a neighbour,
and its bytes must be physically reclaimable.

Design (Delta-style deletion vectors, at id granularity):

- ``delete(ids)`` commits a tiny TOMBSTONE file (just the ids) into the
  transaction log's ``meta`` table — O(ids), never a data rewrite, and
  idempotent under ``(txn_app, txn_version)`` replay exactly like the
  appends, so a crashed delete replays to nothing.
- every read (``df()``, and therefore every dedup/search built on it)
  anti-joins the tombstone set: deleted ids are invisible from the
  commit on. The mask is broadcast — tombstones are takedown lists,
  metadata-sized by nature.
- ``optimize()`` physically drops masked rows while it binpacks
  (``optimize(min_files=1)`` is the full erasure pass over every
  fragmented-or-not chunk); a repack that dropped rows commits as a
  data change (``compacting=False``), a pure binpack keeps the
  row-preservation proof.
- tombstones are PERMANENT forget markers: they are never dropped, so
  a deleted id can never silently return through a later append (the
  forget applies to future appends too). Re-using a forgotten id
  requires a new index — the semantics a takedown wants.

Interleaving note: a tombstone committed BETWEEN a batch's first
ingest and its crash-replay changes what the replayed kept-set
recomputation sees (the replay still commits nothing — the index
cannot corrupt — but the returned rows can differ). Sequencing deletes
through the same stream as the ingests avoids this, the same
single-writer guidance the blind-append semantics already document.
"""

from __future__ import annotations

import os
# module-level so tests can substitute an instrumented executor
# (the staging-cancellation regression gates on shutdown(cancel_futures))
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ID_TYPES = {"long": T.LongType, "int": T.IntegerType,
             "string": T.StringType}


class ForgetMixin:
    """delete()/tombstones()/_mask_deleted() over a TxLog-managed index.

    Host class contract: ``self.spark``, ``self._txlog``,
    ``self.params["id_col"]`` and ``self.params["id_type"]``
    (long/int/string).
    """

    def _tombstone_schema(self) -> T.StructType:
        p = self.params
        return T.StructType(
            [T.StructField(p["id_col"], _ID_TYPES[p["id_type"]]())]
        )

    def _ids_frame(self, ids) -> DataFrame:
        """Normalize ``ids`` (DataFrame with the id column, or a plain
        iterable of values) to a distinct single-column frame in the
        frozen id type."""
        p = self.params
        if isinstance(ids, DataFrame):
            d = ids.select(
                F.col(p["id_col"]).cast(p["id_type"]).alias(p["id_col"])
            )
        else:
            d = self.spark.createDataFrame(
                [(x,) for x in ids], self._tombstone_schema()
            )
        return d.filter(F.col(p["id_col"]).isNotNull()).distinct()

    def tombstones(self, snap=None) -> DataFrame:
        """The deleted-id set at a snapshot (default latest)."""
        snap = snap if snap is not None else self._txlog.snapshot()
        files = snap.paths("meta", self.path)
        if not files:
            return self.spark.createDataFrame(
                [], self._tombstone_schema()
            )
        return (
            self.spark.read.schema(self._tombstone_schema())
            .parquet(*files)
            .distinct()
        )

    def _mask_deleted(self, df: DataFrame, snap) -> DataFrame:
        """Anti-join the tombstone set — a no-op (zero plan overhead)
        while the index has no deletes. Broadcast by contract:
        tombstones are takedown lists, metadata-sized; an erasure
        workload big enough to overflow a broadcast should rebuild the
        index instead."""
        if not snap.files["meta"]:
            return df
        return df.join(
            F.broadcast(self.tombstones(snap)),
            on=self.params["id_col"], how="left_anti",
        )

    def _map_staged(self, write_one, items, max_workers: int = 8):
        """Run per-chunk staging writes concurrently with FAILURE-ORPHAN
        accounting — the shared fan-out for :meth:`_stage_by_chunk` and
        the :meth:`_optimize_by_chunk` repack. ``write_one(item,
        abs_dir, rel_dir)`` writes one chunk's file and returns its
        manifest entries. On ANY failure, still-QUEUED chunk writes are
        cancelled (advisor r14: a 16-chunk stage used to run every
        queued write to completion after the first error — wasted jobs
        and a larger orphan set), in-flight ones are awaited, and every
        file the attempt managed to stage is noted as an orphan for the
        sidecar-driven vacuum before the error re-raises. Results come
        back in input order."""
        import threading

        attempted = []
        lock = threading.Lock()

        def one(item):
            abs_dir, rel_dir = self._txlog.new_staging_dir()
            with lock:
                attempted.append((abs_dir, rel_dir))
            return write_one(item, abs_dir, rel_dir)

        from concurrent.futures import FIRST_EXCEPTION, wait

        ex = ThreadPoolExecutor(
            max_workers=min(max_workers, max(1, len(items)))
        )
        try:
            futs = [ex.submit(one, item) for item in items]
            # wait on FIRST_EXCEPTION, not result() in submission order:
            # blocking on futs[0] would let workers drain the whole
            # queue before a later chunk's failure ever propagated,
            # defeating the cancellation (review r15)
            wait(futs, return_when=FIRST_EXCEPTION)
            failed = [f for f in futs if f.done() and f.exception()]
            if failed:
                raise failed[0].exception()
            return [f.result() for f in futs]
        except BaseException:
            # drop queued writes, wait out in-flight ones so the
            # orphan walk below sees a quiesced staging area
            ex.shutdown(wait=True, cancel_futures=True)
            rels = []
            for abs_dir, rel_dir in attempted:
                if os.path.isdir(abs_dir):
                    for f in sorted(os.listdir(abs_dir)):
                        rels.append(os.path.join(rel_dir, f))
            try:
                self._txlog.note_orphans(rels)
            except Exception:
                pass  # best-effort; the deep vacuum walk is the backstop
            raise
        finally:
            ex.shutdown(wait=True)

    def _stage_by_chunk(
        self,
        rows_df: DataFrame,
        chunk_col: str,
        *,
        sort_cols: tuple,
        key_cols: tuple,
        chunk_check=None,
    ) -> list:
        """Shared staging for the managed indexes: chunk-PURE files,
        one (or, if ``maxRecordsPerFile`` splits a huge chunk, a few)
        per distinct chunk value (band_id / bucket / list — the
        manifest chunk axis), staged as ONE hash-repartition on the
        chunk value + ONE ``partitionBy`` write. The whole stage is a
        single job running the producing lineage (gram/minhash/
        tokenize/assign) exactly once — no checkpoint pin, no
        per-chunk re-scan. The r15 shape (localCheckpoint, then one
        filtered scan of the WHOLE frame per chunk from a driver
        thread pool) re-read the corpus ``n_chunks`` times —
        O(chunks × corpus), 256 corpus scans per ingest at the
        recommended 256-bucket fan-out; measured 28 → 4.2 s on the
        500k-doc lexical ingest (r16, BASELINE.md).

        Chunk purity holds structurally: hash-repartitioning ON the
        chunk value lands every row of a chunk in exactly one task,
        and the partition-dir split keeps each output file
        single-chunk — a chunk-SPANNING file (which
        binpack_candidates would exclude from every optimize) is
        impossible. ``partitionBy`` drops its column from the data
        files, so the write partitions on a DUPLICATE of the chunk
        column and the real one stays in-file for the read schema.
        ``chunk_check`` validates the chunk values enumerated from the
        written partition dirs — staged files are transactionally
        invisible until commit, so refusing after the write is
        equivalent to refusing before it (the orphan notes cover the
        abandoned files either way). Entry order stays deterministic
        (sorted chunk order).

        The chunk column must be INTEGRAL (all four indexes' chunk
        axes are): chunk values round-trip through Hive partition dir
        names, which is type-lossy for strings (escaping, ''-vs-NULL,
        numeric-looking coercion) — refused loudly rather than parsed
        wrongly.

        ``sort_cols``/``key_cols`` are keyword-only: both are tuples
        of column names, so a positional call site could silently
        transpose them (advisor r14)."""
        import shutil

        ctype = rows_df.schema[chunk_col].dataType
        if not isinstance(ctype, (T.ByteType, T.ShortType,
                                  T.IntegerType, T.LongType)):
            raise ValueError(
                f"_stage_by_chunk: chunk column {chunk_col!r} must be "
                f"an integral type (got {ctype.simpleString()}) — "
                "chunk values round-trip through partition dir names, "
                "which is only lossless for integers"
            )
        tmp_abs, tmp_rel = self._txlog.new_staging_dir()
        chunk_dirs: list = []  # (chunk value, partition dir abs path)
        moved: list = []       # (abs_dir, rel_dir) per chunk
        try:
            (
                rows_df.withColumn("__stage_chunk", F.col(chunk_col))
                .repartition(
                    max(1, min(4096, self.spark.sparkContext.defaultParallelism * 4)),
                    F.col("__stage_chunk"),
                )
                .sortWithinPartitions("__stage_chunk", *sort_cols)
                .write.mode("overwrite")
                .partitionBy("__stage_chunk")
                .parquet(tmp_abs)
            )
            chunks = []
            for d in os.listdir(tmp_abs):
                full = os.path.join(tmp_abs, d)
                if not os.path.isdir(full) or "=" not in d:
                    continue
                raw = d.split("=", 1)[1]
                # integral-only chunk axis (validated above), so the
                # dir-name round-trip is exact; NULL chunks surface as
                # the Hive default partition
                c = (None if raw == "__HIVE_DEFAULT_PARTITION__"
                     else int(raw))
                chunks.append(c)
                chunk_dirs.append((c, full))
            if chunk_check is not None:
                chunk_check(chunks)
            entries = []
            # None sorts LAST defensively; every index's chunk_check
            # raises on NULL chunks before this point anyway
            for c, src in sorted(
                chunk_dirs, key=lambda t: (t[0] is None, t[0] or 0)
            ):
                abs_dir, rel_dir = self._txlog.new_staging_dir()
                os.makedirs(abs_dir, exist_ok=True)
                for f in sorted(os.listdir(src)):
                    if f.endswith(".parquet"):
                        os.rename(os.path.join(src, f),
                                  os.path.join(abs_dir, f))
                moved.append((abs_dir, rel_dir))
                entries.extend(self._txlog.collect_entries(
                    abs_dir, rel_dir, key_cols=key_cols,
                    chunk_col=chunk_col,
                ))
            shutil.rmtree(tmp_abs, ignore_errors=True)
            return entries
        except BaseException:
            # note every file this attempt staged (the scratch root and
            # any already-moved chunk dirs) for the sidecar vacuum
            rels = []
            for base_abs, base_rel in (
                [(tmp_abs, tmp_rel)] + list(moved)
            ):
                if os.path.isdir(base_abs):
                    for root, _dirs, files in os.walk(base_abs):
                        for f in files:
                            rels.append(os.path.join(
                                base_rel,
                                os.path.relpath(os.path.join(root, f),
                                                base_abs),
                            ))
            try:
                self._txlog.note_orphans(rels)
            except Exception:
                pass  # best-effort; the deep vacuum walk is the backstop
            raise

    def _optimize_by_chunk(
        self,
        chunk_col: str,
        *,
        key_cols: tuple,
        sort_cols: tuple,
        min_files: int,
        max_chunks: int,
        exclude_chunks: frozenset = frozenset(),
        extra_adds: list | None = None,
        extra_removes: list | None = None,
        snap=None,
    ) -> int:
        """Shared per-chunk small-file binpack + physical-erasure pass
        for the managed indexes (chunk = band_id for BandIndex, bucket
        for GramIndex): repacks every chunk whose live file count
        reached ``min_files`` into one file, dropping tombstone-masked
        rows, as one commit. Row-count proof: staged rows must equal
        source rows minus independently-counted tombstoned rows — a
        shortfall beyond the known-dead rows is a repack bug and
        raises. A repack that erased rows commits as a data change
        (``compacting=False``); a pure binpack keeps the
        row-preservation proof. Cost O(fragmentation), never O(index).
        Returns the number of chunks repacked.

        ``exclude_chunks`` keeps those chunk ids out of the binpack
        plan, and ``extra_adds``/``extra_removes`` are pre-staged
        manifest entries swapped IN THE SAME COMMIT as the repack —
        the hook :meth:`LexicalIndex.recompute_stats` uses to rewrite
        its stats stripe atomically with the erasure it accounts for
        (two commits would let a crash between them double-subtract on
        retry). Extras are excluded from the row-count proof and force
        the commit to a data change. ``snap`` pins the planning
        snapshot — a caller that derived the extras from a snapshot
        must plan the repack against the SAME one, so its erasure mask
        and the extras describe one consistent state (the optimistic
        commit rebases over non-conflicting interleavings and raises
        on genuine conflicts, exactly as for a fresh snapshot)."""
        from holcstore_spark.sources.txlog import (
            TxLog,
            binpack_candidates,
            exact_rows,
        )

        extra_adds = list(extra_adds or [])
        extra_removes = list(extra_removes or [])
        snap = snap if snap is not None else self._txlog.snapshot()
        entries = snap.files["data"]
        if exclude_chunks:
            # exclude BEFORE the max_chunks cap — an excluded chunk
            # must not occupy a candidate slot and starve a real one
            entries = [
                e for e in entries
                if e.get("chunk_min") not in exclude_chunks
            ]
        cands, by_chunk = binpack_candidates(entries, min_files, max_chunks)
        if not cands and not (extra_adds or extra_removes):
            return 0
        cand_paths = [os.path.join(self.path, e["path"])
                      for b in cands for e in by_chunk[b]]
        dead = 0
        if snap.files["meta"] and cand_paths:
            raw = self.spark.read.schema(self._schema()).parquet(
                *cand_paths)
            dead = raw.join(
                F.broadcast(self.tombstones(snap)),
                on=self.params["id_col"], how="left_semi",
            ).count()
        def repack_one(b, abs_dir, rel_dir):
            paths = [os.path.join(self.path, e["path"])
                     for e in by_chunk[b]]
            src = self.spark.read.schema(self._schema()).parquet(*paths)
            # physical erasure: rows of deleted ids (already masked
            # from every read) are dropped from the repacked files —
            # optimize(min_files=1) is the full erasure pass
            src = self._mask_deleted(src, snap)
            (
                src.coalesce(1).sortWithinPartitions(*sort_cols)
                .write.mode("overwrite").parquet(abs_dir)
            )
            return self._txlog.collect_entries(
                abs_dir, rel_dir, key_cols=key_cols, chunk_col=chunk_col,
            )

        # per-chunk repacks are independent reads+writes: submit them
        # through the shared bounded fan-out (a full erasure pass over
        # 16 buckets costs ~2 sequential single-task jobs instead of
        # 16); entry order stays deterministic (sorted candidate order)
        adds, removes, dropped = [], [], []
        ordered = sorted(cands)
        staged_per_chunk = self._map_staged(repack_one, ordered)
        for b, staged in zip(ordered, staged_per_chunk):
            for e in staged:
                if e["rows"]:
                    adds.append(e)
                else:
                    # a fully-erased chunk stages no live file; note the
                    # empty staged file so the default sidecar-driven
                    # vacuum reclaims it (it is referenced nowhere)
                    dropped.append(e["path"])
            removes.extend(by_chunk[b])
        staged, source = exact_rows(adds), exact_rows(removes)
        if staged != source - dead:
            raise RuntimeError(
                f"optimize repack row mismatch: staged {staged} rows "
                f"for {source} source rows with {dead} tombstoned "
                f"across {chunk_col}s {sorted(cands)}"
            )
        if dropped:
            self._txlog.note_orphans(dropped)
        touched = set(cands)
        for e in extra_adds + extra_removes:
            if e.get("chunk_min") is not None:
                touched.add(int(e["chunk_min"]))
        self._txlog.commit(
            snap.version, "optimize", TxLog.next_op_id(snap),
            {"data": adds + extra_adds}, {"data": removes + extra_removes},
            # a repack that erased rows — or swapped extra entries — is
            # a data change, not a pure layout change — it must not
            # claim compacting
            touched=touched,
            compacting=dead == 0 and not (extra_adds or extra_removes),
        )
        return len(cands)

    def delete(self, ids, txn_app=None, txn_version=None) -> bool:
        """Forget ``ids``: from this commit on they are excluded from
        every read (and therefore from dedup history / search results),
        and their rows are physically dropped by the next
        :meth:`optimize` that touches their files
        (``optimize(min_files=1)`` = full erasure pass). Idempotent
        under ``(txn_app, txn_version)`` replay: returns False and
        commits nothing. Deleting ids the index never held is allowed
        (the tombstone simply pre-forgets them)."""
        from holcstore_spark.sources.txlog import TxLog, resolve_txn

        txn_id = resolve_txn(True, txn_app, txn_version)
        snap = self._txlog.snapshot()
        if txn_id is not None and (
            txn_id[1] <= snap.app_versions.get(txn_id[0], -1)
        ):
            return False
        from holcstore_spark.sources.io_util import safe_local_checkpoint

        p = self.params
        # materialized once: the frame is evaluated by the emptiness
        # probe AND the staging write — a non-deterministic ids source
        # (limit/sample) must not tombstone different ids than were
        # checked, since tombstones are permanent
        ids_df = safe_local_checkpoint(self._ids_frame(ids))
        if not ids_df.take(1):
            # an empty delete commits nothing — a 0-row tombstone file
            # would permanently activate the read-side mask join for a
            # no-op. Skipping the watermark is safe: replaying this
            # batch re-runs the same no-op.
            return False
        abs_dir, rel_dir = self._txlog.new_staging_dir()
        (
            ids_df.coalesce(1)
            .sortWithinPartitions(p["id_col"])
            .write.mode("overwrite").parquet(abs_dir)
        )
        adds = self._txlog.collect_entries(abs_dir, rel_dir)
        committed = self._txlog.commit_idempotent(
            snap.version, "delete", TxLog.next_op_id(snap),
            {"meta": adds}, {},
            # masks are read-time and monotonic: two deletes commute,
            # and delete+append commutes because the mask applies to
            # future appends of the id as well (forget semantics)
            touched=None,
            txn_app=txn_id[0] if txn_id else None,
            txn_version=txn_id[1] if txn_id else None,
        )
        return committed is not None
