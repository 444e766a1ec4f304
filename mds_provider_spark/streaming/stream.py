"""Streaming validation — the reference has NO streaming (its "paging" is
synchronous HTTP, mds/api.py ≈L150–250); the north rule is batch over
Iceberg. This module exists for the streaming-arrival case: the SAME rule
compiler applied per micro-batch via foreachBatch, so batch and stream
share one rule path (no semantic drift between modes), plus a native
readStream aggregation for continuous verdict monitoring.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from mds_provider_spark.rules import RuleSet


def validate_stream(
    stream_df: DataFrame,
    ruleset: RuleSet,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """foreachBatch: compile-once rule set, violations per micro-batch.

    ``sink(violations_df, batch_id)`` receives the canonical violation
    rows for each batch; exactly-once delivery is Spark's foreachBatch +
    checkpoint contract (transactional when the sink is idempotent, as
    our dynamic-partition-overwrite writers are).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(ruleset.violations(batch_df), batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_violation_counts(
    stream_df: DataFrame,
    ruleset: RuleSet,
    time_col: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window violation rates — the late-data-safe
    monitoring aggregation (append mode): per (window, part_id), rows and
    rule hits. The watermark bounds state: windows older than the delay
    are finalized and evicted, so state size is O(partitions x windows
    within the watermark), independent of stream length."""
    flagged = (
        stream_df.withWatermark(time_col, watermark_delay)
        .select(
            F.col(time_col),
            F.col(ruleset.part_col).alias("part_id"),
            F.size(ruleset.hits_column()).alias("_n_hits"),
        )
    )
    return (
        flagged.groupBy(F.window(time_col, window_duration), "part_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_n_hits").alias("n_violations"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "part_id",
            "n_rows",
            "n_violations",
        )
    )


def streaming_verdicts(
    stream_df: DataFrame,
    ruleset: RuleSet,
    watermark_col: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Continuous per-partition verdict aggregation as a native streaming
    agg (update mode): running n_rows / n_violations per part_id. With a
    watermark the state store evicts old windows; without one this is a
    complete-mode global aggregate suitable for monitoring dashboards."""
    src = stream_df
    if watermark_col is not None:
        src = src.withWatermark(watermark_col, watermark_delay)
    flagged = src.select(
        F.col(ruleset.part_col).alias("part_id"),
        F.size(ruleset.hits_column()).alias("_n_hits"),
    )
    return flagged.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_n_hits").alias("n_violations"),
    )


def streaming_dedup(
    stream_df: DataFrame,
    text_col: str,
    time_col: str,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming ingestion dedup: keep the FIRST arrival of each content
    digest, drop later duplicates — the continuous twin of the batch
    exact-dedup (same md5-over-normalized-text digest, so batch and
    stream agree on what counts as a duplicate).

    State discipline: ``dropDuplicates`` keyed by the digest alone grows
    state forever. ``dropDuplicatesWithinWatermark`` dedups on the
    digest while the event-time watermark EVICTS digests older than the
    delay — state is bounded by arrival rate x watermark window,
    independent of stream length. A duplicate arriving later than the
    watermark delay is admitted again (the standard streaming-dedup
    tradeoff; the batch operator sweeps those in the nightly pass)."""
    from mds_provider_spark.operators.text import fingerprint

    return (
        stream_df.withColumn("_digest", fingerprint(text_col))
        .withWatermark(time_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["_digest"])
        .drop("_digest")
    )
