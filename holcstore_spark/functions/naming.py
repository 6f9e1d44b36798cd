"""Deterministic identifier truncation (SURVEY §2 F7).

The reference derives physical table/index names from user-supplied
signatures and must satisfy RDBMS name-length limits; over-limit names
keep a human-readable prefix and gain a short blake2b digest suffix so
they stay unique (chunk_timeserie_store.py:54-91). The same concern
exists Spark-side for temp-view / catalog-table / export-file names
derived from store prefixes and key values — same rule here.
"""

from __future__ import annotations

from hashlib import blake2b

#: Hive metastore's table-name ceiling (also a safe common denominator
#: for filesystems and most catalogs)
DEFAULT_MAX_NAME = 128


def safe_name(base: str, max_len: int = DEFAULT_MAX_NAME, digest_hex: int = 8) -> str:
    """Return ``base`` unchanged when it fits, else a ``max_len``-bounded
    name: readable prefix + ``_`` + ``digest_hex`` chars of blake2b over
    the FULL original name (so two long names differing only in their
    truncated tails still map to distinct identifiers)."""
    if len(base) <= max_len:
        return base
    digest = blake2b(base.encode(), digest_size=digest_hex // 2).hexdigest()
    prefix = base[: max_len - len(digest) - 1]
    return f"{prefix}_{digest}"
