"""REST shim over the store-to-store sync protocol (C3/C5).

The reference exposes its CDC protocol over HTTP — a DRF ViewSet serving
``GET /updates/?since=ISO`` (paginated chunk states with next-links) and a
pack endpoint returning chunk payloads (hostore/utils/ts_sync.py:60-165),
plus a client that retries with exponential backoff and honours 429
Retry-After without counting it as a failure (ts_sync.py:264-296).

Here the same protocol wraps a :class:`ChunkStore` with only the standard
library (the container has no web framework):

* server — ``http.server.ThreadingHTTPServer`` routing
  ``GET /updates`` (JSON page + ``next`` link) and ``POST /pack``
  (JSON spec → long rows). Handlers call the store's public metadata /
  export APIs; Spark actions are thread-safe.
* client — :class:`RestSyncClient` with the same pull loop as the
  table-to-table :class:`~holcstore_spark.streaming.sync.SyncClient`
  (tombstones first, watermark via ``last_updated_at``, idempotent
  resume), urllib transport, exponential backoff, Retry-After support.

The wire format is JSON records (ISO timestamps), so data rows cross the
driver by construction — that is the REST boundary's cost. Same-cluster
replication should use ``SyncClient``, which ships data as one Spark frame
per page; this shim exists for sync across security domains, where only
HTTP crosses the fence.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd

from holcstore_spark.sources.chunk_store import ChunkStore

def _validate_token(auth_token: str | None) -> str | None:
    """Reject tokens that cannot travel in an HTTP header: urllib encodes
    headers as latin-1 (a wider token crashes the CLIENT mid-request) and
    whitespace/control characters corrupt header framing. Printable ASCII
    only — validated at configuration time so misconfiguration fails
    loudly up front, not per-request."""
    if auth_token is None:
        return None
    t = str(auth_token)
    if not t or not all(33 <= ord(c) <= 126 for c in t):
        raise ValueError(
            "auth_token must be non-empty printable ASCII without spaces "
            "(it travels in an HTTP Authorization header)"
        )
    return t


def _coerce_filters(store: ChunkStore, raw: dict[str, str]) -> dict:
    """Query-string filter values arrive as strings; coerce them to the
    store's declared key types so predicates compare correctly."""
    out: dict = {}
    for k, v in raw.items():
        t = store.config.key_types.get(k.split("__")[0], "str")
        if t == "int":
            out[k] = int(v)
        elif t == "float":
            out[k] = float(v)
        else:
            out[k] = v
    return out


def _meta_record(store: ChunkStore, row: pd.Series) -> dict:
    keys = store.config.keys

    def iso(x):
        if pd.isna(x):
            return None
        ts = pd.Timestamp(x)
        ts = ts.tz_localize("UTC") if ts.tzinfo is None else ts.tz_convert("UTC")
        return ts.isoformat()

    return {
        "attrs": {k: (None if pd.isna(row[k]) else row[k].item()
                      if hasattr(row[k], "item") else row[k])
                  for k in keys},
        "chunk_index": int(row["chunk_index"]),
        "start_ts": iso(row["start_ts"]),
        "n_points": int(row["n_points"]),
        "updated_at": iso(row["updated_at"]),
        "op_id": int(row["op_id"]),
        "is_deleted": bool(row["is_deleted"]),
    }


class _SyncHandler(BaseHTTPRequestHandler):
    """Routes /updates (GET) and /pack (POST) onto ``server.store``."""

    # silence per-request stderr logging in tests
    def log_message(self, fmt, *args):  # noqa: D401
        pass

    def _json(self, status: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        if status == 401:
            # RFC 7235 §3.1: a 401 MUST name the expected scheme so
            # generic clients know how to (re-)authenticate
            self.send_header("WWW-Authenticate", "Bearer")
        self.end_headers()
        self.wfile.write(body)

    def _authorized(self) -> bool:
        """Optional shared-token check (``make_sync_server(auth_token=)``).
        None = open, matching the reference's DRF default (ts_sync.py
        ships no auth either); set for any deployment crossing a trust
        boundary. Constant-time compare; the token travels as
        ``Authorization: Bearer <token>``, so pair it with TLS (e.g. a
        reverse proxy terminating HTTPS) — the shim itself is plain HTTP."""
        import hmac

        token = getattr(self.server, "auth_token", None)
        if token is None:
            return True
        got = self.headers.get("Authorization", "")
        # compare BYTES: compare_digest on str raises TypeError for
        # non-ASCII input, so an attacker-sent >0x7f header byte would
        # crash the handler with a traceback (connection reset — which
        # the client then backoff-retries as transient) instead of
        # returning 401. http.server decodes raw header bytes as
        # latin-1, so encoding back as latin-1 recovers them exactly;
        # the configured token is ASCII by _validate_token.
        want = f"Bearer {token}"
        return hmac.compare_digest(
            got.encode("latin-1"), want.encode("latin-1")
        )

    def do_GET(self):  # noqa: N802 (http.server API)
        if not self._authorized():
            return self._json(401, {"detail": "invalid or missing token"})
        url = urllib.parse.urlparse(self.path)
        if url.path.rstrip("/") != "/updates":
            return self._json(404, {"detail": "unknown endpoint"})
        store: ChunkStore = self.server.store  # type: ignore[attr-defined]
        try:
            qs = dict(urllib.parse.parse_qsl(url.query))
            since = qs.pop("since")
            limit = int(qs.pop("limit", 200))
            offset = int(qs.pop("offset", 0))
            after = qs.pop("after", None)
            after = json.loads(after) if after else None
            # typed filters travel as ONE json param: __in lists, bools
            # and numeric keys survive the wire intact (a urlencoded
            # repr of a list would reach lookup_filter as a string)
            fj = qs.pop("filters_json", None)
            filters = json.loads(fj) if fj else _coerce_filters(store, qs)
            page = store.list_updates(
                since=since, filters=filters or None, limit=limit,
                offset=offset, after=after,
            )
            results = [_meta_record(store, row) for _, row in page.iterrows()]
            nxt = None
            if len(page) == limit:
                # KEYSET cursor: the next page starts strictly after this
                # page's last row in the feed's total order — stable under
                # concurrent server writes, unlike offset paging where a
                # re-stamped row shifts every later position and a row can
                # silently fall between two requests
                last = page.iloc[-1]
                cursor = {
                    "updated_at": pd.Timestamp(last["updated_at"]).isoformat(),
                    **{k: (last[k].item() if hasattr(last[k], "item")
                           else last[k]) for k in store.config.keys},
                    "chunk_index": int(last["chunk_index"]),
                }
                nq = urllib.parse.urlencode(
                    {"since": since, "limit": limit,
                     "after": json.dumps(cursor),
                     **({"filters_json": fj} if fj else
                        {k: v for k, v in qs.items()})}
                )
                nxt = f"/updates?{nq}"
            self._json(200, {"results": results, "next": nxt})
        except Exception as exc:  # protocol boundary: report, don't crash
            self._json(500, {"detail": str(exc)})

    def do_POST(self):  # noqa: N802
        if not self._authorized():
            return self._json(401, {"detail": "invalid or missing token"})
        url = urllib.parse.urlparse(self.path)
        if url.path.rstrip("/") != "/pack":
            return self._json(404, {"detail": "unknown endpoint"})
        store: ChunkStore = self.server.store  # type: ignore[attr-defined]
        try:
            n = int(self.headers.get("Content-Length", 0))
            spec = json.loads(self.rfile.read(n) or b"[]")
            flat = [{**s["attrs"], "chunk_index": s["chunk_index"]} for s in spec]
            rows = store.export_chunks(flat)
            recs = []
            for _, r in rows.iterrows():
                rec = {k: (r[k].item() if hasattr(r[k], "item") else r[k])
                       for k in store.config.keys}
                rec["ts"] = pd.Timestamp(r["ts"]).isoformat()
                rec["value"] = None if pd.isna(r["value"]) else float(r["value"])
                rec["chunk_index"] = int(r["chunk_index"])
                recs.append(rec)
            self._json(200, recs)
        except Exception as exc:
            self._json(500, {"detail": str(exc)})


def make_sync_server(store: ChunkStore, host: str = "127.0.0.1",
                     port: int = 0,
                     auth_token: str | None = None) -> ThreadingHTTPServer:
    """HTTP server exposing ``store``'s change feed + pack endpoints
    (reference ViewSet factory: ts_sync.py:146-165). ``port=0`` binds an
    ephemeral port (``server.server_address[1]``); run with
    ``threading.Thread(target=server.serve_forever, daemon=True)``.

    ``auth_token``: optional shared token — when set, every request must
    carry ``Authorization: Bearer <token>`` or is refused with 401
    (give the same token to :class:`RestSyncClient`). The default (None,
    open) matches the reference's DRF server, which also ships without
    auth; NEVER expose an open or token-only-over-plain-HTTP server
    across a trust boundary — terminate TLS in front of it."""
    if not store.config.allow_sync:
        raise ValueError("REST sync requires a store created with allow_sync=True")
    srv = ThreadingHTTPServer((host, port), _SyncHandler)
    srv.store = store  # type: ignore[attr-defined]
    srv.auth_token = _validate_token(auth_token)  # type: ignore[attr-defined]
    return srv


class RestSyncError(Exception):
    """Transport failure that survived every retry."""


class RestSyncClient:
    """Pull client over HTTP with retry/backoff (reference:
    TimeseriesChunkStoreSyncClient, ts_sync.py:168-296).

    Retry policy mirrors the reference's ``backoff.expo`` + 429 handling:
    transient failures back off exponentially up to ``retry_max_tries`` /
    ``retry_max_time``; a 429 with Retry-After sleeps the advertised delay
    and does NOT consume a retry."""

    def __init__(
        self,
        endpoint: str,
        store: ChunkStore,
        retry_max_tries: int = 5,
        retry_max_time: float = 300.0,
        retry_base_delay: float = 0.1,
        timeout: float = 30.0,
        auth_token: str | None = None,
    ):
        if not store.config.allow_sync:
            raise ValueError("REST sync requires a store created with allow_sync=True")
        self.endpoint = endpoint.rstrip("/")
        self.store = store
        self.retry_max_tries = int(retry_max_tries)
        self.retry_max_time = float(retry_max_time)
        self.retry_base_delay = float(retry_base_delay)
        self.timeout = float(timeout)
        #: sent as ``Authorization: Bearer <token>`` on every request
        #: when set (see make_sync_server(auth_token=)). A 401/403 is
        #: terminal — retrying a bad credential cannot heal it.
        self.auth_token = _validate_token(auth_token)

    # ------------------------------------------------------------------
    def _request(self, url: str, payload=None):
        """GET (payload None) or POST JSON with expo backoff + Retry-After."""
        t0 = time.monotonic()
        tries = 0
        while True:
            try:
                headers = {}
                if self.auth_token is not None:
                    headers["Authorization"] = f"Bearer {self.auth_token}"
                if payload is None:
                    req = urllib.request.Request(url, headers=headers)
                else:
                    req = urllib.request.Request(
                        url, data=json.dumps(payload).encode(),
                        headers={"Content-Type": "application/json",
                                 **headers},
                        method="POST",
                    )
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read())
            except urllib.error.HTTPError as exc:
                if exc.code in (401, 403):
                    # a rejected credential is terminal, not transient:
                    # backoff-retrying it just hammers the server
                    raise RestSyncError(
                        f"{url} refused the credential (HTTP {exc.code}); "
                        "check auth_token matches the server's"
                    ) from exc
                if exc.code == 429:
                    # rate limit: honour a NUMERIC Retry-After without
                    # consuming a retry, but never outlive the deadline;
                    # an HTTP-date Retry-After falls through to normal
                    # backoff instead of crashing on int()
                    retry_after = exc.headers.get("Retry-After")
                    if retry_after is not None:
                        try:
                            delay = float(retry_after)
                        except ValueError:
                            delay = None
                        if delay is not None:
                            if time.monotonic() - t0 + delay >= self.retry_max_time:
                                raise RestSyncError(
                                    f"{url} rate-limited past the "
                                    f"{self.retry_max_time:.0f}s deadline"
                                ) from exc
                            time.sleep(delay)
                            continue
                err: Exception = exc
            except (urllib.error.URLError, OSError, json.JSONDecodeError) as exc:
                err = exc
            tries += 1
            elapsed = time.monotonic() - t0
            if tries >= self.retry_max_tries or elapsed >= self.retry_max_time:
                raise RestSyncError(
                    f"{url} failed after {tries} tries ({elapsed:.1f}s): {err}"
                ) from err
            time.sleep(self.retry_base_delay * (2 ** (tries - 1)))

    # ------------------------------------------------------------------
    def pull(
        self,
        filters: dict | None = None,
        page_size: int = 200,
        batch: int = 50,
    ) -> tuple[int, int]:
        """Fetch server changes since the local watermark. Returns
        (chunks_imported, tombstones_applied); crash-resume is idempotent —
        the watermark only advances through imported rows and ``>=``
        re-fetches the boundary."""
        keys = list(self.store.config.keys)
        since = self.store.last_updated_at(filters)
        params: dict = {"since": since.isoformat(), "limit": int(page_size)}
        if filters:
            params["filters_json"] = json.dumps(filters)
        nxt = f"{self.endpoint}/updates?{urllib.parse.urlencode(params)}"
        n_fetch = n_delete = 0
        while nxt:
            page = self._request(nxt)
            results = page.get("results", [])
            if not results:
                break
            meta = pd.DataFrame(
                [{**r["attrs"], "chunk_index": r["chunk_index"],
                  "start_ts": pd.to_datetime(r["start_ts"], utc=True),
                  "n_points": r["n_points"],
                  "updated_at": pd.to_datetime(r["updated_at"], utc=True),
                  "op_id": r["op_id"], "is_deleted": r["is_deleted"]}
                 for r in results]
            )
            # same prefix-order invariant as SyncClient._pull_paged:
            # apply contiguous same-kind runs in updated_at order so a
            # crash can only leave an ordered PREFIX applied and the >=
            # watermark resume re-fetches everything else
            runs = (meta["is_deleted"] != meta["is_deleted"].shift()).cumsum()
            for _, run in meta.groupby(runs, sort=False):
                if bool(run["is_deleted"].iloc[0]):
                    self.store.import_chunks(run.copy(), pd.DataFrame())
                    n_delete += len(run)
                    continue
                for boff in range(0, len(run), batch):
                    part = run.iloc[boff: boff + batch]
                    spec = [
                        # .item() unwraps numpy scalars: int/float-typed
                        # keys would otherwise crash json.dumps
                        {"attrs": {k: (row[k].item()
                                       if hasattr(row[k], "item")
                                       else row[k]) for k in keys},
                         "chunk_index": int(row["chunk_index"])}
                        for _, row in part.iterrows()
                    ]
                    recs = self._request(f"{self.endpoint}/pack", payload=spec)
                    data = pd.DataFrame(recs)
                    if len(data):
                        data["ts"] = pd.to_datetime(data["ts"], utc=True)
                        data["value"] = data["value"].astype("float64")
                        data["chunk_index"] = data["chunk_index"].astype("int32")
                    self.store.import_chunks(part.copy(), data)
                    n_fetch += len(part)
            nxt_path = page.get("next")
            nxt = f"{self.endpoint}{nxt_path}" if nxt_path else None
        return n_fetch, n_delete
