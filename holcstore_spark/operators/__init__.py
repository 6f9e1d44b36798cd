from holcstore_spark.operators.overlay import combine_first, overlay_merge
from holcstore_spark.operators.islands import constant_runs, null_runs
from holcstore_spark.operators.grid import completeness_holes, reindex_to_grid, time_grid
from holcstore_spark.operators.intervals import merge_intervals
from holcstore_spark.operators.slicing import (
    drop_bounds_na,
    slice_with_delay,
    split_at,
    time_slice,
)
from holcstore_spark.operators.resample import (
    disaggregate_by_reference,
    ffill,
    min_step,
    normalize_minmax,
)
from holcstore_spark.operators.versioning import next_version, with_next_version

__all__ = [
    "combine_first",
    "overlay_merge",
    "constant_runs",
    "null_runs",
    "completeness_holes",
    "reindex_to_grid",
    "time_grid",
    "merge_intervals",
    "drop_bounds_na",
    "slice_with_delay",
    "split_at",
    "time_slice",
    "disaggregate_by_reference",
    "ffill",
    "min_step",
    "normalize_minmax",
    "next_version",
    "with_next_version",
]
