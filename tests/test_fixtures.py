"""Generator determinism: pure function of (seed, i), partition-independent."""

from mds_provider_spark.sources import fixtures as FX


def test_determinism_across_parallelism(spark):
    a = FX.generate_clips(spark, 50, seed=3).orderBy("clip_id").drop("bytes").collect()
    b = (
        FX.generate_clips(spark, 50, seed=3)
        .repartition(7)
        .orderBy("clip_id")
        .drop("bytes")
        .collect()
    )
    assert a == b


def test_bytes_deterministic(spark):
    rows = {
        r.clip_id: bytes(r.bytes)
        for r in FX.generate_clips(spark, 10, seed=5).collect()
    }
    rows2 = {
        r.clip_id: bytes(r.bytes)
        for r in FX.generate_clips(spark, 10, seed=5).repartition(3).collect()
    }
    assert rows == rows2


def test_fault_plan_covers_all_kinds():
    plan = FX.default_fault_plan(1000)
    assert sorted(plan.values()) == sorted(FX.FAULT_KINDS)


def test_hot_codec_skew(spark):
    df = FX.generate_clips(spark, 500, seed=1)
    counts = {r.codec: r["count"] for r in df.groupBy("codec").count().collect()}
    assert counts["pcm_s16le"] > 0.6 * 500  # hot codec for AQE skew handling


def test_transcripts_align_with_clips(spark):
    clips = FX.generate_clips(spark, 30, seed=9)
    ts = FX.generate_transcripts(spark, 30, seed=9)
    joined = clips.join(ts, "clip_id").where("transcript = transcript_ref")
    assert joined.count() == 30
