"""t2-style oracle comparison for every relational query at sf0.01."""

from __future__ import annotations

import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL, SPARK_QUERIES
from hadoop_digit_recognition_spark.operators import relational  # noqa: F401

from .conftest import SF_ORACLE
from .oracle_harness import compare

RELATIONAL = [
    "scan_filter_project", "q1_pricing_summary", "q6_forecast_revenue",
    "q3_shipping_priority", "q13_customer_distribution",
    "window_distribution_ranks", "lateral_topk_per_group",
    "agg_regression_stats", "agg_argmax_conditional",
    "q14_promo_revenue", "q19_disjunctive_join", "variant_semi_structured",
    "ab_test_welch", "histogram_equi_width",
    "sample_deterministic", "sample_stratified", "sample_weighted_topk",
    "sort_global_range_partitioned", "sql_udf_and_params",
    "sql_pivot_unpivot_clause", "sql_lateral_view_explode",
    "sql_distribute_sort_by",
    "join_broadcast_dim", "join_star_nation_revenue", "join_left_outer",
    "join_semi", "join_anti", "join_full_outer", "join_nonequi_band",
    "join_theta_bnl",
    "agg_having", "agg_distinct", "agg_stats", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "distinct_pairs",
    "window_rank_topk", "window_running_sum", "window_lag_lead",
    "window_first_last_nth",
    "sort_limit_topk",
    "set_union", "set_intersect", "set_except",
    "string_funcs", "date_funcs", "math_funcs", "case_when_bucket",
    "json_extract", "map_funcs", "pivot_conditional", "unpivot_measures",
    "scalar_subquery_filter", "exists_subquery", "error_safe_funcs",
    "join_relational_division", "agg_winsorized_stats",
    "events_attribution_last_touch",
]


def test_all_registered():
    missing = [n for n in RELATIONAL if n not in SPARK_QUERIES]
    assert not missing, missing
    no_oracle = [n for n in RELATIONAL if n not in ORACLE_SQL]
    assert not no_oracle, no_oracle


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_vs_duckdb(spark, duck, name):
    df = SPARK_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL[name], name)
