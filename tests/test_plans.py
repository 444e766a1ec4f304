"""Physical-plan assertions: the optimizations we claim must be visible
in the executed plan — column pruning, partition pruning, filter
pushdown, broadcast joins, whole-stage codegen. These are the properties
that decide whether the engine survives 100 TB, so they are tested like
behavior, not left to hope."""

import pyspark.sql.functions as F
import pytest

from mds_provider_spark import rules as R
from mds_provider_spark.operators import uniqueness as U
from mds_provider_spark.sources import fixtures as FX


@pytest.fixture(scope="module")
def clips_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "clips")
    (FX.generate_clips(spark, 400, n_parts=4, seed=5)
        .write.mode("overwrite").partitionBy("part_id").parquet(p))
    return p


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rule_projection_prunes_bytes(spark, clips_path):
    """The rule pass must never read the audio payload: ReadSchema in the
    parquet scan excludes `bytes` (it would dominate I/O at scale)."""
    df = spark.read.parquet(clips_path)
    plan = _plan(R.mds_clip_rules().violations(df))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "bytes" not in read_schema[0], plan


def test_partition_pruning_on_part_id(spark, clips_path):
    """Resume filtering (part_id IN ...) must prune partitions at the
    scan, not post-filter — this is what makes group resume O(group)."""
    df = spark.read.parquet(clips_path).where(F.col("part_id").isin([1, 2]))
    plan = _plan(df.select("clip_id"))
    assert "PartitionFilters" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "part_id" in pf, plan


def test_filter_pushdown_to_parquet(spark, clips_path):
    df = spark.read.parquet(clips_path).where(F.col("sr_hz") == 16000)
    plan = _plan(df.select("clip_id"))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "sr_hz" in pushed[0], plan


def test_duplicate_violations_aqe_broadcasts_small_dup_set(spark, clips_path):
    """uniqueness.py carries NO forced broadcast hint (round-4 fix: a
    forced hint would override size-based planning exactly when the table
    is corrupt and the dup set is huge). On a healthy table AQE must
    still discover the tiny dup set at runtime and convert the semi-join
    to broadcast — assert on the FINAL adaptive plan, post-execution."""
    df = spark.read.parquet(clips_path)
    out = U.duplicate_violations(df, ["clip_id"])
    out.collect()  # materialize so AQE finalizes the plan
    plan = _plan(out)
    assert "isFinalPlan=true" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_rule_path_is_whole_stage_codegen(spark, clips_path):
    df = spark.read.parquet(clips_path)
    plan = _plan(R.mds_clip_rules().violations(df))
    # codegen stages render as "*(n) Operator" in the plan string
    assert "*(1)" in plan or "WholeStageCodegen" in plan, plan
    assert "EvalPython" not in plan  # no Python in the rule path


def test_verdicts_rowcount_scan_is_columnless(spark, clips_path):
    """verdicts_from_violations' n_rows scan must read only the partition
    column (metadata), never data columns."""
    df = spark.read.parquet(clips_path)
    rows = df.groupBy("part_id").agg(F.count(F.lit(1)))
    plan = _plan(rows)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "struct<>" in read_schema, plan


def test_incremental_revalidation_marker_invalidation(spark, tmp_path):
    """Fingerprint delta -> invalidate_parts -> resume revalidates
    EXACTLY the dirty groups: the library flow behind run_validation's
    --manifest mode."""
    from mds_provider_spark.operators import incremental as INC
    from mds_provider_spark.plans.checkpoint import CommitLog
    from mds_provider_spark.plans.runner import ValidationRun
    from mds_provider_spark.sources import fixtures as FX

    n, parts, gsize = 400, 8, 2  # 4 groups of 2 parts
    clips = FX.generate_clips(spark, n, n_parts=parts, seed=42)
    out = str(tmp_path / "out")
    cols = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"]

    run = ValidationRun(spark, out, n_parts=parts, group_size=gsize)
    s1 = run.run(clips)
    assert s1["groups_run"] == 4
    manifest = INC.partition_fingerprints(clips, "part_id", cols)

    # day 2: one partition's rows change (dur_ms bumped on part 3)
    clips2 = clips.withColumn(
        "dur_ms",
        F.when(F.col("part_id") == 3, F.col("dur_ms") + 1)
        .otherwise(F.col("dur_ms")),
    )
    delta = INC.partition_delta(
        INC.partition_fingerprints(clips2, "part_id", cols), manifest
    )
    dirty = [int(r["part"]) for r in
             delta.where("status in ('added','changed')").collect()]
    assert dirty == [3]
    log = CommitLog(out)
    invalidated = log.invalidate_parts(dirty)
    assert invalidated == [1]  # group 1 = parts {2, 3}

    run2 = ValidationRun(spark, out, n_parts=parts, group_size=gsize)
    s2 = run2.run(clips2)
    # only the invalidated group reruns; the other three skip on markers
    assert s2["groups_run"] == 1 and s2["groups_skipped"] == 3
    # idempotent: a third resume with nothing dirty skips everything
    s3 = ValidationRun(spark, out, n_parts=parts, group_size=gsize).run(clips2)
    assert s3["groups_run"] == 0 and s3["groups_skipped"] == 4
