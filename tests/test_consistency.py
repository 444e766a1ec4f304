"""FD checks, aggregate reconciliation, Benford screen."""
from decimal import Decimal

from pyspark.sql import functions as F

from mds_provider_spark.operators import consistency as CS


def test_fd_violation_detected(spark):
    df = spark.createDataFrame(
        [("c1", 16000), ("c1", 16000), ("c2", 8000), ("c2", 44100)],
        "clip_id string, sr_hz int",
    )
    got = CS.fd_violations(df, ["clip_id"], "sr_hz").collect()
    assert len(got) == 1 and got[0].clip_id == "c2" and got[0].n_variants == 2


def test_fd_holds_empty_result(spark):
    df = spark.createDataFrame(
        [("c1", "wav"), ("c1", "wav"), ("c2", "opus")], "clip_id string, codec string"
    )
    assert CS.fd_violations(df, ["clip_id"], "codec").count() == 0


def _charge():
    return F.sum(F.col("amt").cast("decimal(18,6)"))


def test_reconcile_exact_match(spark):
    rollup = spark.createDataFrame([(1, 30.0), (2, 5.5)], "k int, total double")
    detail = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.5)], "k int, amt double"
    )
    r = CS.reconcile_aggregate(rollup, detail, "k", "total", _charge()).collect()[0]
    assert r.n_mismatch == 0 and r.total_abs_diff == 0.0


def test_reconcile_flags_diff_and_missing_detail(spark):
    rollup = spark.createDataFrame(
        [(1, 30.0), (2, 5.5), (3, 7.0)], "k int, total double"
    )
    detail = spark.createDataFrame(
        [(1, 10.0), (1, 20.5), (2, 5.5)], "k int, amt double"  # k=1 off by .5, k=3 missing
    )
    r = CS.reconcile_aggregate(rollup, detail, "k", "total", _charge()).collect()[0]
    assert r.n_keys == 3 and r.n_mismatch == 2
    assert r.max_abs_diff == 7.0 and r.total_abs_diff == 7.5


def test_benford_natural_vs_uniform(spark):
    # multiplicative process ~ Benford: powers 1.07^i span several decades
    nat = spark.range(1, 5000).select(
        F.pow(F.lit(1.07), F.col("id") % 200).alias("x")
    )
    chi_nat = sum(r.chi2_term for r in CS.benford_screen(nat, "x").collect())
    # uniform integers 10000..99999: flat first digits, wildly non-Benford
    uni = spark.range(10000, 99999).select(F.col("id").cast("double").alias("x"))
    chi_uni = sum(r.chi2_term for r in CS.benford_screen(uni, "x", scale=1).collect())
    assert chi_uni > 1000 and chi_nat < chi_uni / 10


def test_benford_all_digits_present_with_zero_counts(spark):
    df = spark.range(5).select((F.col("id") + 1).cast("double").alias("x"))
    rows = CS.benford_screen(df, "x", scale=1).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert {r.digit: r.n_obs for r in rows}[9] == 0
