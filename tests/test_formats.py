"""Format fidelity: CSV and ORC readers round-trip the parquet testdata
exactly (schema + values), and the CSV reader fails fast on malformed
input instead of nulling it."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError

from datalake_public_spark.sources.readers import read_csv_table, read_orc_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip_exact(spark, tmp_path):
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    dest = str(tmp_path / "nation_csv")
    nation.write.option("header", True).csv(dest)
    back = read_csv_table(spark, dest, nation.schema)
    assert back.schema == nation.schema
    assert _rows(back) == _rows(nation)


def test_csv_roundtrip_doubles_lossless(spark, tmp_path):
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    dest = str(tmp_path / "sup_csv")
    sup.write.option("header", True).csv(dest)
    back = read_csv_table(spark, dest, sup.schema)
    # doubles written as shortest-roundtrip text must parse back bit-equal
    assert _rows(back.select("s_suppkey", "s_acctbal")) == _rows(
        sup.select("s_suppkey", "s_acctbal")
    )


def test_csv_failfast_on_malformed(spark, tmp_path):
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    bad = tmp_path / "bad_csv"
    bad.mkdir()
    (bad / "part.csv").write_text(
        "n_nationkey,n_name,n_regionkey\nnot_an_int,FRANCE,zero\n"
    )
    with pytest.raises(Py4JJavaError):
        read_csv_table(spark, str(bad), nation.schema).collect()


def test_orc_roundtrip_exact(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    dest = str(tmp_path / "orders_orc")
    orders.write.orc(dest)
    back = read_orc_table(spark, dest, orders.schema)
    assert back.schema == orders.schema
    assert _rows(back) == _rows(orders)
