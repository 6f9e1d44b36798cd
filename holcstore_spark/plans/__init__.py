from holcstore_spark.plans.predicates import attrs_filter, lookup_filter, order_cols
from holcstore_spark.plans.pruning import chunk_bounds_filter

__all__ = ["attrs_filter", "lookup_filter", "order_cols", "chunk_bounds_filter"]
