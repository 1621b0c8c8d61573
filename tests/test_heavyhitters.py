"""Misra-Gries heavy hitters: superset guarantee + exact-confirm
equivalence with the naive full aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafkastreamsproject_spark.operators.heavyhitters import (
    heavy_hitters_exact,
    mg_candidates,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 1000 'hot' (50%), 600 'warm' (30%), 400 distinct cold singletons
    rows = (
        [("hot",)] * 1000 + [("warm",)] * 600 + [(f"cold{i}",) for i in range(400)]
    )
    return spark.createDataFrame(rows, "v string").repartition(8)


def test_candidates_superset_of_true_heavy_hitters(skewed):
    # phi = 0.2 -> threshold 400: true heavy hitters are hot and warm
    cand = {r.v for r in mg_candidates(skewed, "v", k=5).collect()}
    assert {"hot", "warm"} <= cand


def test_exact_confirm_equals_naive_groupby(skewed):
    phi = 0.2
    n = skewed.count()
    naive = {
        (r.v, r.freq)
        for r in skewed.groupBy("v")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > phi * n)
        .collect()
    }
    got = {(r.v, r.freq) for r in heavy_hitters_exact(skewed, "v", phi).collect()}
    assert got == naive == {("hot", 1000), ("warm", 600)}


def test_no_false_results_below_threshold(skewed):
    # phi = 0.6 -> threshold 1200: nothing qualifies
    assert heavy_hitters_exact(skewed, "v", 0.6).count() == 0


def test_rejects_bad_params(skewed):
    with pytest.raises(ValueError):
        heavy_hitters_exact(skewed, "v", 0.0)
    with pytest.raises(ValueError):
        mg_candidates(skewed, "v", 0)
