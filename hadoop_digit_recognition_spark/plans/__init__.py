"""Physical-plan audit helpers (SURVEY.md §4).

The reference has no optimizer — its program IS the physical plan. This
engine relies on Catalyst for pushdown/pruning/join selection/partial
aggregation (§4 O1-O10), and these helpers make that reliance testable:
every scale-critical plan property is asserted in tests/test_plans.py, so
a regression that silently de-optimizes a plan (e.g. a filter that stops
reaching the parquet scan) fails CI instead of surfacing as a 100x
slowdown at 100 TB.
"""

from .audit import (
    explain_formatted,
    has_broadcast_hash_join,
    has_cartesian_product,
    has_partial_aggregate,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_count,
)

__all__ = [
    "explain_formatted",
    "has_broadcast_hash_join",
    "has_cartesian_product",
    "has_partial_aggregate",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_count",
]
