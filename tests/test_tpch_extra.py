"""TPC-H breadth extensions (q4/q13/q18/q22 shapes) — DuckDB oracle
equality via the same harness the driver mirrors, plus plan-shape pins
for the scale claims each docstring makes."""

from __future__ import annotations

import pytest

from datalake_public_spark.driver_queries import (
    Q2_SQL,
    Q4_SQL,
    Q8_SQL,
    Q9_SQL,
    Q10_SQL,
    Q11_SQL,
    Q12_SQL,
    Q13_SQL,
    Q15_SQL,
    Q16_SQL,
    Q17_SQL,
    Q18_SQL,
    Q19_SQL,
    Q20_SQL,
    Q21_SQL,
    Q22_SQL,
    q2_min_cost_supplier,
    q4_late_orders,
    q8_market_share,
    q9_product_profit,
    q10_returned_revenue,
    q11_important_stock,
    q12_late_shipment_priority,
    q13_order_distribution,
    q15_top_supplier,
    q16_supplier_variety,
    q17_small_quantity_revenue,
    q18_big_orders,
    q19_disjunctive_revenue,
    q20_heavy_shippers,
    q21_waiting_suppliers,
    q22_idle_customers,
)
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection

CASES = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q4_late_orders": (q4_late_orders, Q4_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q12_late_shipment_priority": (q12_late_shipment_priority, Q12_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
    "q10_returned_revenue": (q10_returned_revenue, Q10_SQL),
    "q13_order_distribution": (q13_order_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_supplier_variety": (q16_supplier_variety, Q16_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "q18_big_orders": (q18_big_orders, Q18_SQL),
    "q20_heavy_shippers": (q20_heavy_shippers, Q20_SQL),
    "q22_idle_customers": (q22_idle_customers, Q22_SQL),
}


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_oracle(spark, con, name):
    fn, sql = CASES[name]
    compare(fn(spark, SF_SMOKE), con, sql, name)


def test_q4_semi_join_no_wide_shuffle(spark):
    plan = q4_late_orders(spark, SF_SMOKE)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "LeftSemi" in plan and "CartesianProduct" not in plan


def test_q22_anti_join_and_broadcast_scalar(spark):
    plan = q22_idle_customers(spark, SF_SMOKE)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "LeftAnti" in plan and "CartesianProduct" not in plan


def _plan(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_q2_broadcasts_dims_no_cartesian(spark):
    plan = _plan(spark, q2_min_cost_supplier(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrdered" in plan  # top-100 is heap-based, no full sort
    # round 9: the p_size≤10 part-key semi-join must sit BELOW the
    # (partkey, suppkey) rollup — without it the fact shuffle carries 5×
    # the rows only for the final broadcast join to discard them (q2 was
    # the largest tpch_breadth op at ×100, 16.9 s → ~6 s). The semi-join
    # appears under the first HashAggregate in the plan text.
    first_agg = plan.index("HashAggregate")
    semi = plan.index("LeftSemi")
    assert semi > first_agg, "part-key semi-join not below the rollup"
    assert "LeftSemi" in plan


def test_q8_single_fact_shuffle_dims_broadcast(spark):
    plan = _plan(spark, q8_market_share(spark, SF_SMOKE))
    # lineitem⋈orders is the only shuffled join; the four dim joins
    # (customer, both nations, region, supplier) all broadcast
    assert plan.count("SortMergeJoin") <= 1
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_q9_part_filter_before_broadcast(spark):
    plan = _plan(spark, q9_product_profit(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    # the p_name filter must reach the part scan, not evaluate post-join
    assert "PushedFilters" in plan or "Filter" in plan
    assert "CartesianProduct" not in plan


def test_q11_single_rollup_with_broadcast_total(spark):
    plan = _plan(spark, q11_important_stock(spark, SF_SMOKE))
    # the grand total joins back as a broadcast of ONE row, never a
    # shuffled join against the per-part rollup
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q19_disjunction_stays_rowlocal(spark):
    plan = _plan(spark, q19_disjunctive_revenue(spark, SF_SMOKE))
    # one broadcast join + row-local predicate: no shuffle before the
    # final single-row aggregate
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q21_one_pair_rollup_no_correlated_rescans(spark):
    plan = _plan(spark, q21_waiting_suppliers(spark, SF_SMOKE))
    # the EXISTS/NOT-EXISTS pair is ONE (orderkey, suppkey) rollup with
    # the order-level counts as a WINDOW over it — lineitem is scanned
    # exactly once, not once per correlated subquery (the join-back
    # formulation re-evaluated the whole rollup per consumer)
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrdered" in plan
