"""Unit tests for the rule compiler — the Spark restatement of
mds-provider's validator tests (tests/schemas_test.py in the reference:
missing-field, bad-enum, out-of-range against hand-built records).

Each case: a micro table with exactly one violating row per rule; assert
the violation set (rule_id, clip_id) matches the golden expectation.
"""

import pyspark.sql.functions as F
import pytest

from mds_provider_spark import rules as R
from mds_provider_spark import schema as S


def _clips_micro(spark):
    rows = [
        # clip_id, sr_hz, dur_ms, codec, transcript
        ("00000000-0000-0000-0000-000000000001", 16000, 100, "pcm_s16le", "hello world"),
        (None, 16000, 100, "pcm_s16le", "null id"),              # missing_field:clip_id
        ("not-a-uuid", 16000, 100, "flac", "bad uuid"),          # bad_format:clip_id
        ("00000000-0000-0000-0000-000000000004", 11025, 100, "opus", "bad sr"),  # bad_enum:sr_hz
        ("00000000-0000-0000-0000-000000000005", 48000, 0, "mp3", "zero dur"),   # out_of_range:dur_ms
        ("00000000-0000-0000-0000-000000000006", 8000, -5, "xyz", "  "),
        # ^ out_of_range:dur_ms + bad_enum:codec + empty_transcript
        ("00000000-0000-0000-0000-000000000007", 22050, 100, "pcm_s16le", None),  # missing_field:transcript
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, sr_hz int, dur_ms int, codec string, transcript string"
    )
    return df.withColumn("part_id", F.lit(0))


@pytest.fixture()
def ruleset():
    rs = R.RuleSet()
    rs.add(
        R.not_null("clip_id"),
        R.matches("clip_id", S.UUID_RE),
        R.not_null("transcript"),
        R.non_empty("transcript"),
        R.is_in("sr_hz", S.SR_HZ_ENUM),
        R.in_range("dur_ms", lo=0, lo_inclusive=False),
        R.is_in("codec", S.CODEC_ENUM),
    )
    return rs


def test_violation_set_matches_golden(spark, ruleset):
    df = _clips_micro(spark)
    got = {
        (r.rule_id, r.clip_id)
        for r in ruleset.violations(df).collect()
    }
    expected = {
        ("missing_field:clip_id", None),
        ("bad_format:clip_id", "not-a-uuid"),
        ("bad_enum:sr_hz", "00000000-0000-0000-0000-000000000004"),
        ("out_of_range:dur_ms", "00000000-0000-0000-0000-000000000005"),
        ("out_of_range:dur_ms", "00000000-0000-0000-0000-000000000006"),
        ("bad_enum:codec", "00000000-0000-0000-0000-000000000006"),
        ("empty_transcript:transcript", "00000000-0000-0000-0000-000000000006"),
        ("missing_field:transcript", "00000000-0000-0000-0000-000000000007"),
    }
    assert got == expected


def test_violations_schema_shape(spark, ruleset):
    v = ruleset.violations(_clips_micro(spark))
    assert [f.name for f in v.schema.fields] == [
        "rule_id", "clip_id", "column_name", "message", "part_id",
    ]


def test_verdicts(spark, ruleset):
    df = _clips_micro(spark)
    v = ruleset.verdicts(df).collect()
    assert len(v) == 1
    row = v[0]
    assert row.status == "fail"
    assert row.n_rows == 7
    assert row.n_violations == 8


def test_clean_table_passes(spark, ruleset):
    df = _clips_micro(spark).where(
        F.col("clip_id") == "00000000-0000-0000-0000-000000000001"
    )
    assert ruleset.violations(df).count() == 0
    verd = ruleset.verdicts(df).collect()[0]
    assert verd.status == "pass" and verd.n_violations == 0


def test_zero_rule_ruleset_is_typed_and_passes(spark):
    """An empty RuleSet must yield a typed empty hit array (F.array() is
    array<void> and used to crash the explode), zero violations, and
    pass verdicts."""
    rs = R.RuleSet()
    df = spark.createDataFrame([("a", 0)], "clip_id string, part_id int")
    assert rs.violations(df).count() == 0
    v = rs.verdicts(df).collect()[0]
    assert (v.status, v.n_rows, v.n_violations) == ("pass", 1, 0)


def test_enum_rule_does_not_fire_on_null(spark):
    rs = R.RuleSet().add(R.is_in("codec", S.CODEC_ENUM))
    df = spark.createDataFrame(
        [("a", None)], "clip_id string, codec string"
    ).withColumn("part_id", F.lit(0))
    assert rs.violations(df).count() == 0


def test_single_projection_plan(spark, ruleset):
    """The row-rule path must stay one codegen'd projection — no shuffle."""
    df = _clips_micro(spark)
    plan = ruleset.violations(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_unique_items_and_required_if(spark):
    rs = R.RuleSet(key_col="k", part_col="part_id").add(
        R.unique_items("tags"),
        R.required_if("reason", "event_type", ["error", "blocked"]),
    )
    df = spark.createDataFrame(
        [
            ("ok", ["a", "b"], "error", "because"),
            ("dupes", ["a", "a"], "click", None),       # bad_shape:tags
            ("needs_reason", ["x"], "error", None),     # missing_field:reason
            ("no_reason_ok", ["y"], "click", None),     # reason not required
        ],
        "k string, tags array<string>, event_type string, reason string",
    ).withColumn("part_id", F.lit(0))
    got = {(r.rule_id, r.clip_id) for r in rs.violations(df).collect()}
    assert got == {
        ("bad_shape:tags", "dupes"),
        ("missing_field:reason", "needs_reason"),
    }


def test_array_and_cast_rules(spark):
    rs = R.RuleSet(key_col="k", part_col="part_id").add(
        R.array_size("arr", min_items=2),
        R.elements_in("arr", ["a", "b"]),
        R.castable("num_str", "double"),
    )
    df = spark.createDataFrame(
        [
            ("ok", ["a", "b"], "1.5"),
            ("short", ["a"], "2.0"),        # bad_shape:arr
            ("badelem", ["a", "z"], "3.0"), # bad_enum:arr
            ("badnum", ["a", "b"], "zzz"),  # bad_type:num_str
        ],
        "k string, arr array<string>, num_str string",
    ).withColumn("part_id", F.lit(0))
    got = {(r.rule_id, r.clip_id) for r in rs.violations(df).collect()}
    assert got == {
        ("bad_shape:arr", "short"),
        ("bad_enum:arr", "badelem"),
        ("bad_type:num_str", "badnum"),
    }


def test_violation_rates_wilson_interval(spark):
    viol = spark.createDataFrame(
        [("r1",)] * 40 + [("r2",)] * 1, "rule_id string"
    )
    out = {r.rule_id: r for r in R.violation_rates(viol, n_rows=1000).collect()}
    import math

    for rid, k in (("r1", 40), ("r2", 1)):
        n, z = 1000.0, 1.959964
        p = k / n
        denom = 1.0 + z * z / n
        center = p + z * z / (2.0 * n)
        half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
        r = out[rid]
        assert r.n_violations == k and r.n_rows == 1000
        assert abs(r.rate - round(p, 6)) < 1e-12
        assert abs(r.ci_low - round(max((center - half) / denom, 0.0), 6)) < 1e-12
        assert abs(r.ci_high - round(min((center + half) / denom, 1.0), 6)) < 1e-12
        assert 0.0 <= r.ci_low <= r.rate <= r.ci_high <= 1.0


def test_violation_rates_rejects_bad_n(spark):
    viol = spark.createDataFrame([("r1",)], "rule_id string")
    with pytest.raises(ValueError):
        R.violation_rates(viol, n_rows=0)
