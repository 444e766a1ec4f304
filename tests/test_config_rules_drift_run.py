"""Config-driven rule sets + drift integrated into the checkpointed run."""

import pyspark.sql.functions as F

from mds_provider_spark import rules as R
from mds_provider_spark.operators import drift as DR
from mds_provider_spark.plans.runner import ValidationRun
from mds_provider_spark.sources import fixtures as FX


def test_from_config_round_trip(spark):
    spec = [
        {"kind": "not_null", "column": "clip_id"},
        {"kind": "is_in", "column": "codec", "values": ["a", "b"]},
        {"kind": "in_range", "column": "dur", "lo": 0, "lo_inclusive": False},
        {"kind": "min_length", "column": "txt", "n": 2},
        {"kind": "unique_key", "columns": ["clip_id"]},
    ]
    rs = R.from_config(spec, key_col="clip_id")
    df = spark.createDataFrame(
        [
            ("x", "a", 5, "hello", 0),
            (None, "a", 5, "hello", 0),   # not_null
            ("y", "z", 5, "hello", 0),    # enum
            ("w", "b", 0, "hello", 0),    # range
            ("v", "b", 5, "h", 0),        # min_length
        ],
        "clip_id string, codec string, dur int, txt string, part_id int",
    )
    got = {(r.rule_id, r.clip_id) for r in rs.violations(df).collect()}
    assert got == {
        ("missing_field:clip_id", None),
        ("bad_enum:codec", "y"),
        ("out_of_range:dur", "w"),
        ("bad_shape:txt", "v"),
    }
    assert [uk.cols for uk in rs.unique_keys] == [("clip_id",)]


def test_from_config_unknown_kind():
    import pytest

    with pytest.raises(ValueError, match="unknown rule kind"):
        R.from_config([{"kind": "nope", "column": "x"}], key_col="x")


def test_drift_on_resumed_and_noop_runs(spark, tmp_path):
    base = FX.generate_clips(spark, 800, n_parts=8, seed=42, dur_choices=[80, 120])
    baseline = DR.snapshot(base, ["dur_ms"], "baseline")
    shifted = FX.generate_clips(spark, 800, n_parts=8, seed=42, dur_choices=[800, 1200])
    out = str(tmp_path / "resume_drift")

    kw = dict(n_parts=8, group_size=4, baseline_snapshot=baseline,
              drift_cols=("dur_ms",))
    ValidationRun(spark, out, **kw).run(shifted, stop_after_groups=1)
    # resume completes the remaining group -> drift computed on resume
    s2 = ValidationRun(spark, out, **kw).run(shifted)
    assert s2["groups_run"] == 1 and s2["drift_findings"] == 1
    # full no-op rerun: groups all skipped, but the caller passed a
    # baseline so drift STILL runs (findings are not part of any
    # committed group — silently returning nothing would be a lie)
    s3 = ValidationRun(spark, out, **kw).run(shifted)
    assert s3["groups_run"] == 0 and s3["drift_findings"] == 1


def test_run_with_drift_detection(spark, tmp_path):
    # baseline from the healthy generator; current with shifted dur_ms
    base = FX.generate_clips(spark, 1200, n_parts=8, seed=42,
                             dur_choices=[80, 120, 160])
    baseline = DR.snapshot(base, ["sr_hz", "dur_ms"], "baseline")

    shifted = FX.generate_clips(spark, 1200, n_parts=8, seed=42,
                                dur_choices=[800, 1200, 1600])
    run = ValidationRun(
        spark, str(tmp_path / "out"), ref_wave_fn=None, n_parts=8,
        group_size=4, baseline_snapshot=baseline,
        drift_cols=("sr_hz", "dur_ms"),
    )
    s = run.run(shifted)
    assert s["drift_findings"] == 1
    f = spark.read.parquet(str(tmp_path / "out/drift")).collect()[0]
    assert f.rule_id == "drift:dur_ms"

    # identical distribution -> no findings
    run2 = ValidationRun(
        spark, str(tmp_path / "out2"), ref_wave_fn=None, n_parts=8,
        group_size=4, baseline_snapshot=baseline,
        drift_cols=("sr_hz", "dur_ms"),
    )
    same = FX.generate_clips(spark, 1200, n_parts=8, seed=43,
                             dur_choices=[80, 120, 160])
    s2 = run2.run(same)
    assert s2["drift_findings"] == 0
