"""CSV/ZIP export sink (reference admin actions,
hostore/admin_actions.py:39-124): one ``export_serie_{i}.csv`` per series
plus a ``content_summary.csv``, zipped.

Format parity with the reference golden test
(tests_admin_download.py:86-87): CSVs are ``to_csv(sep=';')`` with the
index column, the series column is named ``data``, and the summary lists
``filename`` plus the series' key attributes.

A zip is inherently a driver-side artifact; the distributed part is the
store scan feeding it (``yield_many_ts`` streams with bounded memory).
"""

from __future__ import annotations

import io
import zipfile

import pandas as pd


def make_zip(entries) -> bytes:
    """entries: iterable of (series, attrs) → zip bytes. Accepts a
    generator so only one decoded series is live at a time."""
    buf = io.BytesIO()
    summary = []
    with zipfile.ZipFile(buf, "a", zipfile.ZIP_DEFLATED, False) as zf:
        for i, (ds, attrs) in enumerate(entries):
            filename = f"export_serie_{i}.csv"
            zf.writestr(filename, ds.to_frame(name="data").to_csv(sep=";"))
            summary.append({"filename": filename, **attrs})
        zf.writestr(
            "content_summary.csv", pd.DataFrame(summary).to_csv(sep=";")
        )
    buf.seek(0)
    return buf.read()


def export_chunk_store(store, filters: dict | None = None,
                       start=None, end=None) -> bytes:
    """ChunkStore → zip (reference download_timeseries_from_chunkstore,
    admin_actions.py:83-124). Streams series via yield_many_ts — the
    generator goes straight into the zip writer, one series in memory at
    a time (the zip buffer itself is the only accumulating state)."""
    return make_zip(store.yield_many_ts(filters, start, end))


def export_attr_store(store, ts_attributes: dict | None = None) -> bytes:
    """AttrStore → zip."""
    got = store.get_ts(ts_attributes or {})
    return make_zip([(e["data"], {k: e[k] for k in store.keys}) for e in got])


def export_kv_store(store, prms: list, client_id: int, **get_kwargs) -> bytes:
    """KeyValueStore → zip (reference download_timeseries_from_store,
    admin_actions.py:39-81): combined view per prm."""
    got = store.get_many_lc(prms, client_id, **get_kwargs)
    entries = []
    for prm, rows in got.items():
        for row in rows:
            meta = {k: v for k, v in row.items() if k != "data"}
            entries.append((row["data"], {"prm": prm, **meta}))
    return make_zip(entries)
