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
