"""REST sync shim (C3) + retry/backoff (C5).

Reference behaviors: paginated /updates with next links, pack export,
tombstone propagation, 429 Retry-After honoured without consuming a retry,
exponential backoff on transient failures
(hostore/utils/ts_sync.py:60-165, 264-296).
"""

from __future__ import annotations

import json
import os
import threading
import urllib.request

import numpy as np
import pandas as pd
import pytest

from holcstore_spark import ChunkStoreConfig
from holcstore_spark.sources.chunk_store import ChunkStore
from holcstore_spark.streaming.rest_sync import (
    RestSyncClient,
    RestSyncError,
    make_sync_server,
)

CFG = dict(keys=("site",), freq="1h", tz="UTC", chunk_axis=("year", "month"),
           allow_sync=True, key_types={"site": "str"})


def hourly(start, n, value=1.0):
    idx = pd.date_range(start, periods=n, freq="1h", tz="UTC")
    return pd.Series(np.full(n, float(value)), index=idx)


@pytest.fixture()
def pair(spark, tmp_store_path):
    server_store = ChunkStore(spark, os.path.join(tmp_store_path, "srv"),
                              ChunkStoreConfig(**CFG))
    client_store = ChunkStore(spark, os.path.join(tmp_store_path, "cli"),
                              ChunkStoreConfig(**CFG))
    srv = make_sync_server(server_store)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
    yield server_store, client_store, endpoint
    srv.shutdown()


def seed(server_store, n_keys=6, n_hours=60):  # Jan 30 + 60h crosses into Feb
    for i in range(n_keys):
        server_store.set_ts({"site": f"s{i}"}, hourly("2024-01-30", n_hours, i + 1),
                            update=True)


class TestRestPull:
    def test_roundtrip_and_pagination(self, pair):
        server_store, client_store, endpoint = pair
        seed(server_store)  # 6 keys x 2 chunks (Jan/Feb) = 12 chunk states
        cli = RestSyncClient(endpoint, client_store)
        n_fetch, n_del = cli.pull(page_size=5, batch=3)  # forces 3 pages
        assert (n_fetch, n_del) == (12, 0)
        for i in range(6):
            a = server_store.get_ts({"site": f"s{i}"})
            b = client_store.get_ts({"site": f"s{i}"})
            pd.testing.assert_series_equal(a, b, check_freq=False)
        # idempotent re-pull: only the >= watermark boundary states are
        # re-fetched (the last write's two chunks), and content is unchanged
        n_fetch2, n_del2 = cli.pull(page_size=5)
        assert n_fetch2 == 2 and n_del2 == 0
        pd.testing.assert_series_equal(
            server_store.get_ts({"site": "s5"}),
            client_store.get_ts({"site": "s5"}),
            check_freq=False,
        )

    def test_tombstone_propagates(self, pair):
        server_store, client_store, endpoint = pair
        seed(server_store, n_keys=3)
        cli = RestSyncClient(endpoint, client_store)
        cli.pull()
        server_store.delete({"site": "s1"})
        n_fetch, n_del = cli.pull()
        # both chunks of s1 tombstoned; the >= boundary re-fetches the
        # previous max-watermark alive states (s2's two chunks)
        assert n_del == 2 and n_fetch == 2
        assert client_store.get_ts({"site": "s1"}) is None
        assert client_store.get_ts({"site": "s0"}) is not None

    def test_filtered_pull(self, pair):
        server_store, client_store, endpoint = pair
        seed(server_store, n_keys=4)
        cli = RestSyncClient(endpoint, client_store)
        n_fetch, _ = cli.pull(filters={"site": "s2"})
        assert n_fetch == 2
        assert client_store.get_ts({"site": "s2"}) is not None
        assert client_store.get_ts({"site": "s0"}) is None

    def test_requires_allow_sync(self, spark, tmp_store_path):
        plain = ChunkStore(
            spark, os.path.join(tmp_store_path, "plain"),
            ChunkStoreConfig(**{**CFG, "allow_sync": False}),
        )
        with pytest.raises(ValueError):
            make_sync_server(plain)
        with pytest.raises(ValueError):
            RestSyncClient("http://x", plain)


class _Flaky:
    """urlopen wrapper: fail the first ``n_fail`` calls, then delegate."""

    def __init__(self, n_fail, code=500):
        self.n_fail, self.code, self.calls = n_fail, code, 0
        self._real = urllib.request.urlopen

    def __call__(self, req, timeout=None):
        self.calls += 1
        if self.calls <= self.n_fail:
            import email.message
            import urllib.error

            url = req if isinstance(req, str) else req.full_url
            hdrs = email.message.Message()
            if self.code == 429:
                hdrs["Retry-After"] = "0"
            raise urllib.error.HTTPError(url, self.code, "boom", hdrs, None)
        return self._real(req, timeout=timeout)


class TestRetryBackoff:
    def test_transient_500_retried(self, pair, monkeypatch):
        server_store, client_store, endpoint = pair
        seed(server_store, n_keys=2)
        flaky = _Flaky(n_fail=2)
        monkeypatch.setattr(urllib.request, "urlopen", flaky)
        cli = RestSyncClient(endpoint, client_store, retry_base_delay=0.01)
        n_fetch, _ = cli.pull()
        assert n_fetch == 4
        assert flaky.calls > 2  # failures were retried, not fatal

    def test_429_does_not_consume_retries(self, pair, monkeypatch):
        server_store, client_store, endpoint = pair
        seed(server_store, n_keys=1)
        # more 429s than retry_max_tries: must still succeed
        flaky = _Flaky(n_fail=4, code=429)
        monkeypatch.setattr(urllib.request, "urlopen", flaky)
        cli = RestSyncClient(endpoint, client_store, retry_max_tries=2,
                             retry_base_delay=0.01)
        n_fetch, _ = cli.pull()
        assert n_fetch == 2

    def test_retries_exhausted_raises(self, pair, monkeypatch):
        server_store, client_store, endpoint = pair
        flaky = _Flaky(n_fail=99)
        monkeypatch.setattr(urllib.request, "urlopen", flaky)
        cli = RestSyncClient(endpoint, client_store, retry_max_tries=3,
                             retry_base_delay=0.01)
        with pytest.raises(RestSyncError):
            cli.pull()
        assert flaky.calls == 3


class TestRestRobustness:
    def test_int_keyed_store_pull(self, spark, tmp_store_path):
        # np.int64 key values must survive the JSON /pack spec
        cfg = dict(keys=("park",), freq="1h", tz="UTC",
                   chunk_axis=("year", "month"), allow_sync=True,
                   key_types={"park": "int"})
        srv_store = ChunkStore(spark, os.path.join(tmp_store_path, "isrv"),
                               ChunkStoreConfig(**cfg))
        cli_store = ChunkStore(spark, os.path.join(tmp_store_path, "icli"),
                               ChunkStoreConfig(**cfg))
        srv_store.set_ts({"park": 7}, hourly("2024-01-01", 24, 3.0), update=True)
        srv = make_sync_server(srv_store)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
            n_fetch, n_del = RestSyncClient(endpoint, cli_store).pull()
            assert n_fetch == 1 and n_del == 0
            got = cli_store.get_ts({"park": 7})
            assert got is not None and (got.dropna() == 3.0).all()
        finally:
            srv.shutdown()

    def test_in_list_filter_survives_the_wire(self, pair):
        server_store, client_store, endpoint = pair
        server_store.set_ts({"site": "a"}, hourly("2024-01-01", 4, 1.0), update=True)
        server_store.set_ts({"site": "b"}, hourly("2024-01-01", 4, 2.0), update=True)
        server_store.set_ts({"site": "c"}, hourly("2024-01-01", 4, 3.0), update=True)
        cli = RestSyncClient(endpoint, client_store)
        n_fetch, _ = cli.pull(filters={"site__in": ["a", "c"]})
        assert n_fetch == 2
        assert client_store.get_ts({"site": "a"}) is not None
        assert client_store.get_ts({"site": "b"}) is None

    def test_http_date_retry_after_falls_back_to_backoff(self, pair, monkeypatch):
        import urllib.error

        server_store, client_store, endpoint = pair
        server_store.set_ts({"site": "x"}, hourly("2024-01-01", 3, 1.0), update=True)
        cli = RestSyncClient(endpoint, client_store,
                             retry_max_tries=3, retry_base_delay=0.01)
        calls = {"n": 0}
        real = urllib.request.urlopen

        def flaky(req, timeout=None):
            calls["n"] += 1
            if calls["n"] == 1:
                raise urllib.error.HTTPError(
                    req.full_url if hasattr(req, "full_url") else str(req),
                    429, "rate limited",
                    {"Retry-After": "Wed, 21 Oct 2026 07:28:00 GMT"}, None,
                )
            return real(req, timeout=timeout)

        monkeypatch.setattr(urllib.request, "urlopen", flaky)
        n_fetch, _ = cli.pull()
        assert n_fetch == 1     # survived the HTTP-date header via backoff

    def test_keyset_pagination_cursor_in_next_link(self, pair):
        server_store, client_store, endpoint = pair
        for i in range(5):
            server_store.set_ts({"site": f"s{i}"}, hourly("2024-01-01", 2, 1.0), update=True)
        since = client_store.last_updated_at().isoformat()
        import urllib.parse
        import urllib.request as ur

        url = f"{endpoint}/updates?" + urllib.parse.urlencode(
            {"since": since, "limit": 2})
        page1 = json.loads(ur.urlopen(url).read())
        assert len(page1["results"]) == 2 and page1["next"]
        assert "after=" in page1["next"] and "offset" not in page1["next"]
        page2 = json.loads(ur.urlopen(f"{endpoint}{page1['next']}").read())
        # no overlap between keyset pages
        k1 = {(r["attrs"]["site"], r["chunk_index"]) for r in page1["results"]}
        k2 = {(r["attrs"]["site"], r["chunk_index"]) for r in page2["results"]}
        assert not (k1 & k2) and len(k2) == 2


class TestRestAuth:
    """Optional shared-token hook (VERDICT r10 ask #7): the shim stays
    dependency-free and open by default (the reference's DRF server also
    ships no auth), but a deployment can require a Bearer token."""

    @pytest.fixture()
    def auth_pair(self, spark, tmp_store_path):
        server_store = ChunkStore(spark, os.path.join(tmp_store_path, "asrv"),
                                  ChunkStoreConfig(**CFG))
        client_store = ChunkStore(spark, os.path.join(tmp_store_path, "acli"),
                                  ChunkStoreConfig(**CFG))
        srv = make_sync_server(server_store, auth_token="s3cret")
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
        yield server_store, client_store, endpoint
        srv.shutdown()

    def test_missing_or_bad_token_is_401_and_terminal(self, auth_pair):
        server_store, client_store, endpoint = auth_pair
        seed(server_store, n_keys=2, n_hours=4)
        # raw request without the header: 401 on both endpoints
        for path, payload in (("/updates?since=1970-01-01T00:00:00", None),
                              ("/pack", [])):
            req = urllib.request.Request(
                endpoint + path,
                data=None if payload is None else json.dumps(payload).encode(),
                headers={} if payload is None
                else {"Content-Type": "application/json"},
                method="GET" if payload is None else "POST",
            )
            try:
                urllib.request.urlopen(req, timeout=10)
                raise AssertionError("expected HTTP 401")
            except urllib.error.HTTPError as exc:
                assert exc.code == 401
        # client with a WRONG token fails FAST (terminal, not retried:
        # retry_max_tries=5 with 10s base delay would take ~2.5 min)
        import time as _time

        bad = RestSyncClient(endpoint, client_store, auth_token="wrong",
                             retry_base_delay=10.0)
        t0 = _time.monotonic()
        with pytest.raises(RestSyncError, match="credential"):
            bad.pull()
        assert _time.monotonic() - t0 < 5.0  # no backoff loop consumed
        # and nothing landed
        assert client_store.count_keys() == 0

    def test_matching_token_pulls_end_to_end(self, auth_pair):
        server_store, client_store, endpoint = auth_pair
        seed(server_store, n_keys=2, n_hours=4)
        cli = RestSyncClient(endpoint, client_store, auth_token="s3cret")
        cli.pull()
        assert client_store.count_keys() == 2
        got = client_store.get_ts({"site": "s0"})
        assert (got.dropna() == 1.0).all()

    def test_non_ascii_header_is_401_not_crash(self, auth_pair):
        # review r11: hmac.compare_digest on str raises TypeError for
        # non-ASCII — an attacker-sent >0x7f header byte must yield a
        # clean 401, never a handler traceback / connection reset
        import http.client

        server_store, client_store, endpoint = auth_pair
        host, port = endpoint.removeprefix("http://").split(":")
        conn = http.client.HTTPConnection(host, int(port), timeout=10)
        conn.putrequest("GET", "/updates?since=1970-01-01T00:00:00")
        conn.putheader("Authorization", "Bearer s\xe9cret")  # latin-1 0xe9
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 401
        conn.close()

    def test_non_header_safe_token_rejected_at_config(
        self, spark, tmp_store_path
    ):
        # review r11: a token urllib cannot encode (or with spaces /
        # control chars) must fail loudly at configuration time, not
        # brick every request at runtime
        store = ChunkStore(spark, os.path.join(tmp_store_path, "tkv"),
                           ChunkStoreConfig(**CFG))
        for bad in ["", "s\xe9cret", "has space", "tab\tchar", "emoji€"]:
            with pytest.raises(ValueError, match="printable ASCII"):
                make_sync_server(store, auth_token=bad)
            with pytest.raises(ValueError, match="printable ASCII"):
                RestSyncClient("http://x", store, auth_token=bad)

    def test_open_server_still_open(self, pair):
        # default unchanged: no token configured, anonymous pull works
        server_store, client_store, endpoint = pair
        seed(server_store, n_keys=1, n_hours=4)
        RestSyncClient(endpoint, client_store).pull()
        assert client_store.count_keys() == 1
