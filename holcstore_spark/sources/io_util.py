"""Shared storage helpers for the store classes."""

from __future__ import annotations

import os


def has_parquet(path: str) -> bool:
    """True when ``path`` holds at least one parquet data file.

    Emptied-by-rewrite tables keep their directory (with only _SUCCESS)
    but have no footers to infer a schema from — stores treat that as the
    empty frame instead of failing inference.
    """
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False
