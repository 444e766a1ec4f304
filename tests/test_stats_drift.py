"""Profiling, HLL sketches, t-digest, drift detection."""

import pyspark.sql.functions as F
import pytest

from mds_provider_spark.operators import drift as DR
from mds_provider_spark.operators import stats as ST


@pytest.fixture(scope="module")
def num_df(spark):
    rows = [(i, float(i % 100), None if i % 10 == 0 else float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "id long, a double, b double")


def test_profile_single_pass(spark, num_df):
    prof = {r.column_name: r for r in ST.profile(num_df, ["a", "b"]).collect()}
    assert prof["a"].n_rows == 1000
    assert prof["a"].null_count == 0 and prof["b"].null_count == 100
    assert prof["b"].null_rate == pytest.approx(0.1)
    assert prof["a"].min_val == 0.0 and prof["a"].max_val == 99.0
    assert abs(prof["a"].approx_distinct - 100) <= 3
    assert len(prof["a"].quantiles) == len(ST.DEFAULT_PROBS)


def test_profile_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "x double")
    r = ST.profile(empty, ["x"]).collect()[0]
    assert (r.n_rows, r.null_count, r.null_rate) == (0, 0, None)
    allnull = spark.createDataFrame([(None,), (None,)], "x double")
    r = ST.profile(allnull, ["x"]).collect()[0]
    assert (r.n_rows, r.null_count, r.null_rate) == (2, 2, 1.0)
    assert r.min_val is None and r.approx_distinct == 0


def test_profile_is_one_aggregate(spark, num_df):
    plan = ST.profile(num_df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    # exactly one shuffle: partial agg -> final agg
    assert plan.count("Exchange") == 1, plan


def test_hll_sketch_merge_matches_union(spark, num_df):
    half1 = num_df.where("id < 500")
    half2 = num_df.where("id >= 500")
    merged = ST.merge_hll(
        ST.hll_sketches(half1, ["a"]).unionByName(ST.hll_sketches(half2, ["a"]))
    ).collect()[0]
    direct = ST.hll_sketches(num_df, ["a"]).collect()[0]
    assert merged.estimate == direct.estimate  # sketch merge is lossless vs single pass


def test_tdigest_close_to_exact(spark, num_df):
    got = DR.tdigest_quantiles(num_df, "a", probs=[0.5]).collect()[0]
    exact = num_df.agg(F.expr("percentile(a, 0.5)")).collect()[0][0]
    assert got.prob == 0.5
    assert got.quantile == pytest.approx(exact, abs=2.0)


def test_drift_detects_shift(spark):
    base = spark.range(5000).select((F.col("id") % 100).cast("double").alias("x"))
    shifted = spark.range(5000).select(
        ((F.col("id") % 100) + 40).cast("double").alias("x")
    )
    b = DR.snapshot(base, ["x"], "base")
    cur = DR.snapshot(shifted, ["x"], "cur")
    findings = DR.drift_violations(cur, b).collect()
    assert [r.rule_id for r in findings] == ["drift:x"]
    # no drift when identical
    assert DR.drift_violations(b, b).count() == 0


def test_drift_detects_null_rate_change(spark):
    a = spark.range(1000).select(F.col("id").cast("double").alias("x"))
    b = spark.range(1000).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id")).cast("double").alias("x")
    )
    f = DR.drift_violations(DR.snapshot(b, ["x"], "cur"), DR.snapshot(a, ["x"], "base"))
    rows = f.collect()
    assert len(rows) == 1 and rows[0].nr_shift > 0.3


def test_tdigest_two_level_merge_accuracy(spark):
    """Many input partitions + small fanin exercises the bounded
    intermediate merge; the result must stay within the sketch envelope
    of the exact quantiles."""
    df = spark.range(20000).select(
        (F.col("id") % 1000).cast("double").alias("a")
    ).repartition(50)
    got = {r.prob: r.quantile
           for r in DR.tdigest_quantiles(df, "a", probs=[0.25, 0.5, 0.75],
                                         fanin=4).collect()}
    exact = df.agg(F.expr("percentile(a, array(0.25, 0.5, 0.75))")).collect()[0][0]
    for p, e in zip([0.25, 0.5, 0.75], exact):
        assert abs(got[p] - e) <= 0.02 * 1000, (p, got[p], e)
