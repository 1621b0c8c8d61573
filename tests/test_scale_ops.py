"""Scale-utility tests: salted join correctness, bucketed join planning."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from kafkastreamsproject_spark.operators.skew import salted_join
from kafkastreamsproject_spark.sources.bucketed import materialize_bucketed
from kafkastreamsproject_spark.sources.testdata import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")

    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q")
    ).first()
    salted = salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=4).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q")
    ).first()
    assert plain.n == salted.n
    assert plain.q == salted.q


def test_salted_left_join_preserves_unmatched(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey").distinct()
    plain = orders.join(li, orders.o_orderkey == li.l_orderkey, "left").filter(
        F.col("l_orderkey").isNull()
    ).count()
    salted = salted_join(orders, li, "o_orderkey", "l_orderkey", 4, "left").filter(
        F.col("l_orderkey").isNull()
    ).count()
    assert plain == salted  # 257 orders without lineitems at sf0.01


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    materialize_bucketed(li, "li_bucketed", "l_orderkey", 8)
    materialize_bucketed(orders, "orders_bucketed", "o_orderkey", 8)
    lb, ob = spark.table("li_bucketed"), spark.table("orders_bucketed")

    # disable broadcast so the join must pick a partitioned strategy
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == load_table(spark, "lineitem", sf_dir).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
