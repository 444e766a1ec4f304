"""Structural-integrity operators: hand-computed expectations plus the
physical-plan shapes that back the 100 TB claims (bounded shuffles,
reused partitioning, no Python in the hot path)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mds_provider_spark.operators import integrity as ING


# ------------------------------------------------ sequence_integrity


def test_sequence_integrity_damage_report(spark):
    rows = (
        [("a", 1), ("a", 2), ("a", 2), ("a", 5)]   # dup 2, missing 3,4
        + [("b", 2), ("b", 3)]                      # starts at 2
        + [("c", 1), ("c", 2), ("c", 3)]            # clean -> absent
    )
    df = spark.createDataFrame(rows, "k string, pos int")
    out = {r.k: r for r in ING.sequence_integrity(df, ["k"], "pos").collect()}
    assert set(out) == {"a", "b"}
    a = out["a"]
    assert (a.n_rows, a.n_positions, a.min_pos, a.max_pos) == (4, 3, 1, 5)
    assert (a.n_dup_positions, a.n_extra_rows, a.n_missing) == (1, 1, 2)
    assert a.starts_ok
    b = out["b"]
    assert not b.starts_ok and b.n_missing == 0 and b.n_dup_positions == 0


def test_sequence_integrity_custom_start(spark):
    df = spark.createDataFrame([("a", 0), ("a", 1)], "k string, pos int")
    assert ING.sequence_integrity(df, ["k"], "pos", expected_start=0).count() == 0
    assert ING.sequence_integrity(df, ["k"], "pos", expected_start=1).count() == 1


def test_sequence_integrity_no_distinct_expand(spark):
    # two-phase aggregation, not count(distinct): no Expand node
    df = spark.createDataFrame([("a", 1)], "k string, pos int")
    plan = ING.sequence_integrity(df, ["k"], "pos")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan


# ------------------------------------------------ interval_integrity


def test_interval_integrity_overlap_gap_coverage(spark):
    rows = [("a", 0, 10), ("a", 5, 12), ("a", 20, 25), ("a", 8, 8)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    r = ING.interval_integrity(df, ["k"], "s", "e").collect()[0]
    assert (r.n_intervals, r.n_invalid, r.n_overlaps, r.n_gaps) == (4, 1, 1, 1)
    # union of [0,10) u [5,12) u [20,25) = 12 + 5
    assert r.covered_s == 17.0 and r.span_s == 25.0


def test_interval_integrity_swallowed_intervals_each_count(spark):
    # one long interval swallowing two later ones: running max (not lag)
    # flags BOTH as overlaps and adds zero coverage for them
    rows = [("a", 0, 100), ("a", 10, 20), ("a", 30, 40)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    r = ING.interval_integrity(df, ["k"], "s", "e").collect()[0]
    assert (r.n_overlaps, r.n_gaps) == (2, 0)
    assert r.covered_s == 100.0


def test_interval_integrity_timestamp_inputs_epoch_differences(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [("a", t0, t0 + dt.timedelta(seconds=30)),
            ("a", t0 + dt.timedelta(seconds=45),
             t0 + dt.timedelta(seconds=60))]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    r = ING.interval_integrity(df, ["k"], "s", "e").collect()[0]
    assert (r.n_gaps, r.covered_s, r.span_s) == (1, 45.0, 60.0)


def test_interval_integrity_single_exchange(spark):
    # the window's hash partitioning on the key is reused by the rollup
    df = spark.createDataFrame([("a", 0, 1)], "k string, s long, e long")
    plan = ING.interval_integrity(df, ["k"], "s", "e")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# ------------------------------------------------ sample_per_group


def test_sample_per_group_matches_global_topk(spark):
    import hashlib

    rows = [(f"g{i % 3}", f"id{i:03d}") for i in range(90)]
    df = spark.createDataFrame(rows, "g string, id string").repartition(8)
    out = ING.sample_per_group(
        df.withColumn("h", F.md5("id")), ["g"], ["h", "id"], k=4
    ).collect()
    got = sorted((r.g, r.id) for r in out)
    want = []
    for g in ("g0", "g1", "g2"):
        ids = [f"id{i:03d}" for i in range(90) if f"g{i % 3}" == g]
        ids.sort(key=lambda x: (hashlib.md5(x.encode()).hexdigest(), x))
        want += [(g, i) for i in ids[:4]]
    assert got == sorted(want)


def test_sample_per_group_hot_group_not_partitioned_by_group_alone(spark):
    # stage-1 shuffle key includes the physical partition id: the plan's
    # first window partitions by (_pid, g), never by g alone over raw data
    df = spark.createDataFrame(
        [("hot", f"id{i}") for i in range(100)], "g string, id string"
    ).repartition(8).withColumn("h", F.md5("id"))
    plan = ING.sample_per_group(df, ["g"], ["h", "id"], k=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "__spg_pid" in plan, plan
    out = ING.sample_per_group(df, ["g"], ["h", "id"], k=2).count()
    assert out == 2


def test_sample_per_group_k_validation(spark):
    df = spark.createDataFrame([("a", "x")], "g string, id string")
    with pytest.raises(ValueError):
        ING.sample_per_group(df, ["g"], ["id"], k=0)


# ------------------------------------------------ schema contract drift


def test_schema_drift_findings(spark):
    from mds_provider_spark.operators.diff import enforce_schema, schema_drift

    exp = spark.createDataFrame([], "clip_id string, dur_ms int, codec string")
    act = spark.createDataFrame([], "clip_id string, dur_ms bigint, extra double")
    got = schema_drift(act, exp)
    assert got == [
        {"column": "extra", "status": "added",
         "actual_type": "double", "expected_type": None},
        {"column": "codec", "status": "removed",
         "actual_type": None, "expected_type": "string"},
        {"column": "dur_ms", "status": "type_changed",
         "actual_type": "bigint", "expected_type": "int"},
    ]
    assert schema_drift(exp, exp) == []
    with pytest.raises(ValueError, match="dur_ms"):
        enforce_schema(act, exp)
    # gate passes untouched frames through
    assert enforce_schema(exp, exp.schema) is exp


def test_schema_drift_nested_struct_and_nullability(spark):
    from pyspark.sql.types import (IntegerType, StructField, StructType)

    from mds_provider_spark.operators.diff import schema_drift

    exp = StructType([StructField("a", IntegerType(), nullable=False)])
    act = StructType([StructField("a", IntegerType(), nullable=True)])
    assert schema_drift(act, exp) == []  # nullability off by default
    got = schema_drift(act, exp, check_nullability=True)
    assert got == [{"column": "a", "status": "nullability_changed",
                    "actual_type": "nullable=True",
                    "expected_type": "nullable=False"}]
    nested_e = spark.createDataFrame([], "p struct<x:int,y:int>")
    nested_a = spark.createDataFrame([], "p struct<x:int,y:string>")
    assert schema_drift(nested_a, nested_e)[0]["status"] == "type_changed"


# ------------------------------------------------ monotonicity


def test_monotonicity_inversions_counted_and_located(spark):
    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 15), ("a", 4, 30),
            ("a", 5, 25), ("b", 1, 1), ("b", 2, 2)]
    df = spark.createDataFrame(rows, "k string, ord int, val int")
    out = ING.monotonicity_violations(df, ["k"], "ord", "val").collect()
    assert len(out) == 1
    r = out[0]
    assert r.k == "a" and r.n_rows == 5 and r.n_inversions == 2
    assert r.first_inversion_order == 3


def test_monotonicity_strict_flags_plateaus(spark):
    rows = [("a", 1, 10), ("a", 2, 10)]
    df = spark.createDataFrame(rows, "k string, ord int, val int")
    assert ING.monotonicity_violations(df, ["k"], "ord", "val").count() == 0
    strict = ING.monotonicity_violations(df, ["k"], "ord", "val",
                                         strict=True).collect()
    assert len(strict) == 1 and strict[0].n_inversions == 1


def test_monotonicity_order_ties_no_spurious_inversion(spark):
    # equal order values: ties break by value ascending, so (5,3),(5,7)
    # never reports an inversion regardless of input partitioning
    rows = [("a", 5, 7), ("a", 5, 3), ("a", 6, 9)]
    df = spark.createDataFrame(rows, "k string, ord int, val int").repartition(3)
    assert ING.monotonicity_violations(df, ["k"], "ord", "val").count() == 0


def test_monotonicity_single_exchange(spark):
    df = spark.createDataFrame([("a", 1, 1)], "k string, ord int, val int")
    plan = ING.monotonicity_violations(df, ["k"], "ord", "val")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_sequence_integrity_null_positions_own_finding(spark):
    # NULL positions: counted separately, never skew contiguity math
    rows = [("a", 1), ("a", 2), ("a", None), ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "k string, pos int")
    out = {r.k: r for r in ING.sequence_integrity(df, ["k"], "pos").collect()}
    a = out["a"]
    assert (a.n_null_pos, a.n_missing, a.n_positions) == (1, 0, 2)
    assert a.starts_ok  # contiguous 1..2 aside from the null
    b = out["b"]  # all-null group: nothing present, flagged via n_null_pos
    assert (b.n_null_pos, b.n_positions, b.n_missing) == (2, 0, 0)
    assert not b.starts_ok


def test_sample_per_group_reserved_column_clash_raises(spark):
    df = spark.createDataFrame([("a", "x", 1)], "g string, id string, __spg_r int")
    with pytest.raises(ValueError, match="reserved"):
        ING.sample_per_group(df, ["g"], ["id"], k=1)
