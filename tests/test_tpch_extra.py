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


def test_q4_one_orders_scan_no_semi_join(spark):
    # round 9: o_orderpriority rides along the one lineitem⋈orders join;
    # the old EXISTS decorrelation re-scanned orders and re-shuffled both
    # sides of a left-semi join (6.5 s of the ×100 tpch_breadth map).
    plan = q4_late_orders(spark, SF_SMOKE)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "LeftSemi" not in plan, "q4 regressed to the two-scan semi join"
    assert plan.count("orders.parquet") == 1
    assert plan.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in plan


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
    # round 9 (second pass): the correlated MIN is a WINDOW over the
    # rollup's own partkey exchange, not a join-back — the join-back
    # sort-merged the pair rollup against its own aggregate (19.1 s of
    # the ×100 map vs 6.2 s). One lineitem scan, one fact exchange
    # (the partkey repartition; the rollup and the window both reuse
    # it), no shuffled join anywhere above it.
    assert "Window" in plan
    assert plan.count("lineitem.parquet") == 1
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_q8_single_fact_shuffle_dims_broadcast(spark):
    plan = _plan(spark, q8_market_share(spark, SF_SMOKE))
    # lineitem⋈orders is the only shuffled join, and it is a
    # SHUFFLED-HASH build over the AMERICA-restricted orders side
    # (round 9: the restriction bounds the build to ~20% of orders;
    # hashing it beats sort-merging 60M lineitem rows, 10.1 → 3.8 s in
    # the ×100 map). The four dim joins (customer, both nations,
    # region, supplier) all broadcast.
    assert plan.count("ShuffledHashJoin") == 1
    assert "SortMergeJoin" not in plan
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


def test_q21_fixed_width_hash_aggregates_no_window(spark):
    plan = _plan(spark, q21_waiting_suppliers(spark, SF_SMOKE))
    # round 9: the EXISTS/NOT-EXISTS pair is a chain of two fixed-width
    # HASH aggregates reusing the join's orderkey partitioning —
    # lineitem is scanned exactly once, there is no window (the old
    # shape sorted the whole rollup, 8.2 s at ×100) and no
    # ObjectHashAggregate/SortAggregate (a collect_set formulation
    # sort-fell-back at 15M groups, 24.8 s measured)
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("orders.parquet") == 1
    assert "Window" not in plan, "q21 regressed to the rollup+window shape"
    assert "ObjectHashAggregate" not in plan
    assert "SortAggregate" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrdered" in plan


def test_q4_hash_dedup_no_sort_aggregate(spark):
    plan = _plan(spark, q4_late_orders(spark, SF_SMOKE))
    # round 9: the per-order dedup carries the priority in the group
    # KEYS, keeping the aggregate hash-based — a max(priority) string
    # buffer planned SortAggregate and sorted ~30M late rows (8.3 s
    # measured at ×100)
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_q17_single_scan_window_average(spark):
    plan = _plan(spark, q17_small_quantity_revenue(spark, SF_SMOKE))
    # round 9: the correlated per-part average is a window over the one
    # partkey exchange the lines ride anyway — the join-back shape
    # scanned lineitem twice and sorted both sides of a sort-merge join
    # (5.1 s of the ×100 map)
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q9_narrow_fact_exchange(spark):
    plan = _plan(spark, q9_product_profit(spark, SF_SMOKE))
    # round 9: the per-line profit and the supplier nationkey must be
    # computed BELOW the lineitem⋈orders exchange so the fact shuffle
    # carries (orderkey, nationkey, profit) only — the raw price /
    # discount / quantity / retailprice columns never shuffle. In the
    # plan text the profit arithmetic appears in a Project on the
    # streamed side, before any Exchange that follows it.
    assert "line_profit" in plan
    # explain prints top-down: the orders join node prints BEFORE its
    # child subtrees, so the profit Project sitting below the orders
    # join means the join's line precedes line_profit's first mention
    orders_join = min(
        i
        for i in (
            plan.find("Join [l_orderkey"),
            plan.find("SortMergeJoin [l_orderkey"),
            plan.find("BroadcastHashJoin [l_orderkey"),
        )
        if i >= 0
    )
    assert orders_join < plan.index("AS line_profit"), (
        "profit projection not below the orders join"
    )
    assert plan.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in plan


def test_q16_no_standalone_pair_distinct(spark):
    plan = _plan(spark, q16_supplier_variety(spark, SF_SMOKE))
    # round 9: countDistinct's own two-phase dedup aggregate covers the
    # pair dedup, so a prior (partkey, suppkey) .distinct() would only
    # add a second full fact shuffle (10.0 s of the ×100 map). Exactly
    # two hash exchanges: the (brand, band, suppkey) dedup and the final
    # (brand, band) rollup — both post-dedup, neither broadcast-sized.
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "CartesianProduct" not in plan


def test_q20_single_scan_shared_partkey_exchange(spark):
    plan = _plan(spark, q20_heavy_shippers(spark, SF_SMOKE))
    # round 9: ONE lineitem scan feeds one partkey exchange that both
    # the (partkey, suppkey) rollup and the per-part window total reuse
    # (the old shape scanned lineitem twice and shuffled three times —
    # 7.0 s of the ×100 map). Exchanges: the partkey repartition + the
    # qualifying-suppkey distinct.
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "CartesianProduct" not in plan
