"""Cross-row operators: salted uniqueness, referential orphans, transcript
equality — the duplicate-id / FK semantics the reference delegates to
Postgres ON CONFLICT (mds/db.py)."""

import pyspark.sql.functions as F

from mds_provider_spark.operators import referential as REF
from mds_provider_spark.operators import uniqueness as U


def _clips(spark):
    rows = [
        ("a", "t-a", 0),
        ("b", "t-b", 0),
        ("b", "t-b2", 1),   # duplicate clip_id
        ("c", "t-c", 1),    # orphan (no transcript)
        ("d", "WRONG", 2),  # transcript mismatch
    ]
    return spark.createDataFrame(rows, "clip_id string, transcript string, part_id int")


def _transcripts(spark):
    rows = [
        ("a", "t-a", 0),
        ("b", "t-b", 0),
        ("d", "t-d", 2),
        ("zz", "t-zz", 3),  # orphan transcript (no clip)
    ]
    return spark.createDataFrame(
        rows, "clip_id string, transcript_ref string, part_id int"
    )


def test_duplicate_keys(spark):
    dups = U.duplicate_keys(_clips(spark), ["clip_id"]).collect()
    assert [(r.clip_id, r.n_rows) for r in dups] == [("b", 2)]


def test_duplicate_violations_report_every_conflicting_row(spark):
    v = U.duplicate_violations(_clips(spark), ["clip_id"]).collect()
    assert {r.rule_id for r in v} == {"duplicate_id:clip_id"}
    assert sorted((r.clip_id, r.part_id) for r in v) == [("b", 0), ("b", 1)]


def test_duplicate_keys_is_two_stage(spark):
    """Plan must show the partial/merge shape: a map-side partial_count
    BELOW the single exchange (skew immunity — a hot key ships one
    partial row per input partition, never its raw rows). Exactly ONE
    exchange: the explicit spark_partition_id salt added a second full
    exchange for the same guarantee (round-7 optimization)."""
    df = U.duplicate_keys(_clips(spark), ["clip_id"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_referential_orphans_both_directions(spark):
    v = REF.referential_violations(_clips(spark), _transcripts(spark)).collect()
    got = sorted((r.clip_id, r.column_name) for r in v)
    assert got == [("c", "clips"), ("zz", "transcripts")]
    assert {r.rule_id for r in v} == {"referential_orphan:clip_id"}


def test_transcript_mismatch(spark):
    v = REF.transcript_mismatch_violations(_clips(spark), _transcripts(spark)).collect()
    # 'd' has WRONG text; the duplicated 'b' row carries 't-b2' != ref 't-b'
    assert sorted((r.rule_id, r.clip_id) for r in v) == [
        ("transcript_mismatch:transcript", "b"),
        ("transcript_mismatch:transcript", "d"),
    ]


def test_null_keys_are_not_duplicates(spark):
    """Two rows with NULL clip_id must NOT be a duplicate pair — NULL is
    missing_field's finding (JSON-Schema: required ⊥ uniqueness)."""
    df = spark.createDataFrame(
        [(None, 0), (None, 1), ("x", 0), ("x", 1)],
        "clip_id string, part_id int",
    )
    dups = U.duplicate_keys(df, ["clip_id"]).collect()
    assert [(r.clip_id, r.n_rows) for r in dups] == [("x", 2)]


def test_composite_unique_key(spark):
    df = spark.createDataFrame(
        [(1, 1, "x", 0), (1, 2, "y", 0), (1, 1, "z", 1)],
        "ok long, ln long, clip_id string, part_id int",
    )
    dups = U.duplicate_keys(df, ["ok", "ln"]).collect()
    assert [(r.ok, r.ln, r.n_rows) for r in dups] == [(1, 1, 2)]
