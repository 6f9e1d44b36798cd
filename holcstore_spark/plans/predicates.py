"""Filter-dict → Column translation.

The reference's whole query surface is attrs/filters dicts fed to the Django
ORM — conjunctive equality plus a small ``__lookup`` dialect
(reference: chunk_timeserie_store.py:889-899, hostore.py:241,292).
Here the same dialect compiles to a single Catalyst predicate, so it is
pushed down to the Parquet scan.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

_LOOKUPS = {
    "gte": operator.ge,
    "gt": operator.gt,
    "lte": operator.le,
    "lt": operator.lt,
}


def lookup_filter(key: str, value) -> Column:
    """One ``field[__lookup]`` pair → Column predicate."""
    field, _, lookup = key.partition("__")
    col = F.col(field)
    if not lookup:
        return col.isNull() if value is None else (col == F.lit(value))
    if lookup in _LOOKUPS:
        return _LOOKUPS[lookup](col, F.lit(value))
    if lookup == "in":
        return col.isin(list(value))
    if lookup == "isnull":
        return col.isNull() if value else col.isNotNull()
    if lookup == "ne":
        return col != F.lit(value)
    if lookup == "contains":
        return col.contains(value)
    if lookup == "startswith":
        return col.startswith(value)
    if lookup == "mod":
        # engine extension (not in the reference dialect): value is
        # ``(divisor, remainder)`` — selects rows where
        # ``field % divisor == remainder``. The scale-safe way to
        # address a deterministic key cohort (e.g. delete every 7th
        # user) without first collecting the key catalog to the driver
        # to build an ``__in`` list.
        divisor, remainder = value
        return (col % F.lit(int(divisor))) == F.lit(int(remainder))
    raise ValueError(f"unsupported lookup: {key!r}")


def attrs_filter(attrs: dict | None) -> Column:
    """AND of per-key predicates; empty/None → lit(True)."""
    if not attrs:
        return F.lit(True)
    return reduce(operator.and_, (lookup_filter(k, v) for k, v in attrs.items()))


def validate_filter_keys(filters: dict | None, allowed: tuple[str, ...]) -> None:
    """Reject lookups on columns that are not store keys
    (reference: chunk_timeserie_store.py:889-899)."""
    for k in filters or {}:
        field = k.partition("__")[0]
        if field not in allowed:
            raise ValueError(
                f"unknown filter field {field!r}; store keys are {list(allowed)}"
            )


def order_cols(order_by: tuple[str, ...]) -> list[Column]:
    """Django-style ordering dialect: '-col' → desc
    (reference: hostore.py:241,292 default ('-version',))."""
    out = []
    for spec in order_by:
        if spec.startswith("-"):
            out.append(F.col(spec[1:]).desc())
        else:
            out.append(F.col(spec).asc())
    return out
