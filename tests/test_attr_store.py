"""AttrStore semantics (reference TimeseriesStore,
tests/tests_timeseries_store.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from holcstore_spark.sources.attr_store import AttrStore


def s(vals, start="2024-01-01"):
    idx = pd.date_range(start, periods=len(vals), freq="1h", tz="UTC")
    return pd.Series([float(v) if v is not None else np.nan for v in vals], index=idx)


@pytest.fixture()
def store(spark, tmp_store_path):
    return AttrStore(spark, tmp_store_path, keys=("year", "kind"))


class TestAttrStore:
    def test_set_get_full_and_partial(self, store):
        store.set_ts({"year": "2024", "kind": "a"}, s([1, 2]))
        store.set_ts({"year": "2024", "kind": "b"}, s([3, 4]))
        full = store.get_ts({"year": "2024", "kind": "a"})
        assert len(full) == 1 and full[0]["kind"] == "a"
        partial = store.get_ts({"year": "2024"})
        assert len(partial) == 2

    def test_flat_errors(self, store):
        store.set_ts({"year": "2024", "kind": "a"}, s([1]))
        store.set_ts({"year": "2024", "kind": "b"}, s([1]))
        with pytest.raises(ValueError):
            store.get_ts({"year": "2024"}, flat=True)       # >1 match
        with pytest.raises(ValueError):
            store.get_ts({"year": "1999"}, flat=True)       # 0 matches
        one = store.get_ts({"year": "2024", "kind": "a"}, flat=True)
        assert isinstance(one, pd.Series)

    def test_set_over_existing_raises(self, store):
        store.set_ts({"year": "2024", "kind": "a"}, s([1]))
        with pytest.raises(ValueError):
            store.set_ts({"year": "2024", "kind": "a"}, s([2]))

    def test_update_is_combine_first(self, store):
        # reference tests_timeseries_store.py:130-149: new wins, old fills
        old = s([1, 1, 1])
        new = s([None, 2, None], start="2024-01-01")
        store.set_ts({"year": "2024", "kind": "a"}, old)
        store.set_ts({"year": "2024", "kind": "a"}, new, update=True)
        got = store.get_ts({"year": "2024", "kind": "a"}, flat=True)
        assert list(got.values) == [1.0, 2.0, 1.0]

    def test_replace(self, store):
        store.set_ts({"year": "2024", "kind": "a"}, s([1, 1, 1]))
        store.set_ts({"year": "2024", "kind": "a"}, s([5]), replace=True)
        got = store.get_ts({"year": "2024", "kind": "a"}, flat=True)
        assert list(got.values) == [5.0]

    def test_delete_and_count(self, store):
        store.set_ts({"year": "2024", "kind": "a"}, s([1]))
        store.set_ts({"year": "2025", "kind": "a"}, s([1]))
        assert store.count() == 2
        store.delete({"year": "2024"})
        assert store.count() == 1

    def test_update_replace_exclusive(self, store):
        with pytest.raises(ValueError):
            store.set_ts({"year": "2024", "kind": "a"}, s([1]), update=True, replace=True)
