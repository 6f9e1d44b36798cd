"""pandas bridge: pd.Series ⇄ long-format rows.

The engine's native currency is the long DataFrame ``(keys…, ts, value)``;
callers of the reference API speak ``pd.Series`` with a DatetimeIndex. This
module is the only place where that translation happens — everything above
it stays distributed.

Contract (mirrors the reference):
- stored timestamps are UTC instants; returned series indexes are rendered
  in the store tz (chunk_timeserie_store.py:832-843 rebuilds the index in
  STORE_TZ);
- naive input indexes are localized to the store tz with a warning
  (:726-727); aware ones are converted;
- pandas NaN ≡ SQL NULL.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd


def normalize_series(
    serie: pd.Series,
    tz: str,
) -> pd.Series:
    """Validate + tz-normalize an input series (reference write path,
    chunk_timeserie_store.py:699-729): must be a pd.Series with a
    DatetimeIndex, numeric values (object coerced), not all-NaN."""
    if not isinstance(serie, pd.Series):
        raise ValueError(f"expected pd.Series, got {type(serie).__name__}")
    if not isinstance(serie.index, pd.DatetimeIndex):
        raise ValueError("series index must be a DatetimeIndex")
    if serie.dtype == object:
        serie = serie.astype("float64")
    if len(serie) == 0 or serie.isna().all():
        raise ValueError("refusing to store an empty or all-NaN series")
    if serie.index.tz is None:
        warnings.warn(f"naive index localized to store tz {tz}")
        serie = serie.tz_localize(tz)
    return serie.tz_convert("UTC").sort_index()


def series_to_long(
    serie: pd.Series,
    attrs: dict,
    ts: str = "ts",
    value: str = "value",
) -> pd.DataFrame:
    """One series + its business-key attrs → long pandas frame (UTC)."""
    pdf = pd.DataFrame({ts: serie.index.tz_convert("UTC"), value: serie.to_numpy(dtype="float64")})
    for k, v in attrs.items():
        pdf[k] = v
    return pdf[[*attrs.keys(), ts, value]]


def long_to_series(
    pdf: pd.DataFrame,
    tz: str,
    ts: str = "ts",
    value: str = "value",
    name=None,
) -> pd.Series | None:
    """Long rows (single key, already filtered) → tz-rendered pd.Series.
    Returns None for empty input (reference get_ts returns None,
    chunk_timeserie_store.py:410-411)."""
    if len(pdf) == 0:
        return None
    idx = pd.DatetimeIndex(pd.to_datetime(pdf[ts], utc=True)).tz_convert(tz)
    idx.name = None  # reference indexes are unnamed (rebuilt from scratch)
    s = pd.Series(pdf[value].to_numpy(dtype="float64"), index=idx, name=name)
    s = s.sort_index()
    if len(s) > 2:
        s.index.freq = pd.infer_freq(s.index)
    return s
