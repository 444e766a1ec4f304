"""Gap-based sessionization — the telemetry/training-pipeline operator
that turns a raw event stream into per-user sessions.

The reference has no sessionization (mds-provider is a client/validation
library), but its trip/status_change streams are exactly the kind of
per-device event sequences a session cut applies to; this is the
batch twin of Structured Streaming's ``session_window`` (which
``streaming/stream.py`` can use directly on the same columns).

Spark-first shape — ONE shuffle for the whole operator:

    events
      -> window lag(ts) over (partitionBy key, orderBy ts, tiebreak)
      -> is_new = gap > threshold (or first event)
      -> session_idx = running sum of is_new over the SAME window spec
      -> groupBy(key, session_idx) aggregate

The window's ``hashpartitioning(key)`` satisfies the downstream
group-by's ClusteredDistribution((key, session_idx)) — subset clustering
— so Catalyst plans NO second exchange: lag, running sum, and the final
hash aggregate all run inside the one post-shuffle stage (asserted in
tests/test_sessions_sketches.py on the physical plan). At 100 TB the
operator is therefore scan + one key-hash shuffle; skewed users are the
same risk surface as any key shuffle and ride AQE skew splitting
(session ordering only needs per-key locality, which AQE preserves).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: int = 21600,
) -> DataFrame:
    """Tag every event with its session index (0-based per key).

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_s`` seconds. Ordering ties on ``ts`` break by
    ``order_col`` so the cut is deterministic under any partitioning.
    Rows with NULL key are dropped (a session of nobody is nothing; the
    rule layer's ``not_null`` owns that finding). Rows with NULL ``ts``
    are the rule layer's finding too — they sort first (Spark ASC =
    NULLS FIRST) and fold into the key's first session (a NULL gap
    never cuts); validate timestamps before sessionizing. Gap arithmetic uses epoch SECONDS
    (timestamp cast to long — timezone-independent instant math, and
    exactly reproducible in ANSI SQL oracles).
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(order_col))
    # TIMESTAMP_NTZ has no direct long cast; route through TIMESTAMP.
    # The session-tz offset that cast introduces cancels in every use
    # below (gaps and durations are DIFFERENCES of these values).
    tsu = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(tsu).over(w)
    is_new = F.when(prev.isNull() | ((tsu - prev) > F.lit(gap_s)), 1).otherwise(0)
    # contract: output = input columns + session_idx, nothing else —
    # callers persist/unionByName tagged events (round-5 advice: an
    # internal _ts_unix helper column used to leak here)
    return (
        events.where(F.col(key_col).isNotNull())
        .withColumn(
            "session_idx",
            F.sum(is_new).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.lit(1),
        )
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: int = 21600,
) -> DataFrame:
    """One row per (key, session): size, duration, and the id span.

    Output: (key, session_idx, n_events, duration_s, first_id, last_id)
    — durations instead of absolute epochs so the result is
    timezone-representation-proof across engines. first/last_id are
    min/max of ``order_col`` within the session (deterministic without
    an ordered-aggregate dependency).
    """
    tagged = sessionize(events, key_col, ts_col, order_col, gap_s).withColumn(
        # recomputed here (not exported by sessionize — see its contract);
        # a post-window projection, fuses into the same stage
        "_ts_unix", F.col(ts_col).cast("timestamp").cast("long")
    )
    return tagged.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("_ts_unix") - F.min("_ts_unix")).alias("duration_s"),
        F.min(order_col).alias("first_id"),
        F.max(order_col).alias("last_id"),
    )


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    interval: str = "1 hour",
    keys: Sequence[str] = (),
    sum_cols: Sequence[str] = (),
    sum_decimal: str = "decimal(18,6)",
) -> DataFrame:
    """Tumbling-window rollup (the hypertable/continuous-aggregate shape):
    one row per (time bucket, *keys) with a count and exact sums.

    Pure Catalyst: ``window()`` is a projection (bucket start is integer
    arithmetic on the epoch), the aggregate is the standard partial+final
    hash agg — one shuffle keyed on (bucket, keys), which AQE coalesces.
    Sums route through a decimal cast so results are exact and
    order-independent (double summation drifts with partitioning; a
    rollup feeding a drift baseline must not).

    Output: (bucket_start <timestamp as input>, *keys, n_rows,
    sum_<col>...). This is also the batch twin of a streaming
    ``groupBy(window(...))`` aggregation — same bucket arithmetic.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in sum_cols:
        aggs.append(
            F.sum(F.col(c).cast(sum_decimal)).alias(f"sum_{c}")
        )
    return (
        df.groupBy(F.window(F.col(ts_col), interval).alias("_w"), *keys)
        .agg(*aggs)
        .select(F.col("_w.start").alias("bucket_start"), *keys, "n_rows",
                *[f"sum_{c}" for c in sum_cols])
    )


def anomalous_buckets(
    rollup: DataFrame,
    key_cols: Sequence[str],
    value_col: str = "n_rows",
    z_threshold: float = 2.5,
) -> DataFrame:
    """Flag time buckets whose count is a z-score outlier WITHIN its key
    — the volume-anomaly layer on top of ``time_rollup`` (a provider
    that stops sending, a codec that floods: both show up here hours
    before a quantile drift check would move).

    Determinism discipline: mean/variance come from INTEGER sums
    (sum(x), sum(x^2), count over the bucket counts — exact in any
    engine), combined with one fixed double expression
    ``var = (s2 - s1^2/n) / (n-1)``, so two engines given the same
    buckets produce bit-identical z-scores — this is oracle-replayable
    arithmetic, unlike stddev_samp whose accumulation order varies.
    Plan: one partial/final agg over the (already tiny) rollup, one
    broadcast join back — nothing data-scale.
    """
    keys = list(key_cols)
    x = F.col(value_col).cast("long")
    stats = rollup.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_s1"),
        F.sum(x * x).alias("_s2"),
    )
    j = rollup.join(F.broadcast(stats), keys)
    n = F.col("_n").cast("double")
    mean = F.col("_s1").cast("double") / n
    var = (F.col("_s2").cast("double") - F.col("_s1").cast("double") * mean) / (
        n - F.lit(1.0)
    )
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = (x.cast("double") - mean) / sd
    return (
        j.where((F.col("_n") > 1) & (sd > 0) & (F.abs(z) > F.lit(z_threshold)))
        .select(
            *keys,
            "bucket_start",
            F.col(value_col),
            F.round(z, 6).alias("z"),
        )
    )


def changepoint_mean_shift(
    rollup: DataFrame,
    key_cols: Sequence[str],
    value_col: str = "n_rows",
    time_col: str = "bucket_start",
    score_threshold: float = 0.0,
    min_buckets: int = 4,
) -> DataFrame:
    """Single mean-shift changepoint per key series — the SEQUENTIAL
    member of the drift family (PSI sees shape, z-scores see isolated
    outliers; neither localizes WHEN a level shift happened; binary
    segmentation does, and this is its first split).

    For every candidate split after bucket ``k`` the two-sample
    statistic ``|mean_right - mean_left| / (sd * sqrt(1/k + 1/(n-k)))``
    is computed from cumulative INTEGER sums; the argmax over k is the
    changepoint estimate. Determinism discipline matches
    ``anomalous_buckets``: all accumulations are exact integer window
    sums, combined in one fixed double expression — so an oracle
    replays every score bit-for-bit and the argmax row (tie-broken on
    time) is stable across engines.

    Plan: the input is an already-aggregated rollup (bucket-scale, not
    data-scale). One hash-partition+sort per key serves the cumulative
    sum, the per-key totals, AND the final argmax rank — Catalyst plans
    one exchange for all four window specs (same partitioning; the
    ordered specs share the sort). Nothing here touches raw data.
    """
    keys = list(key_cols)
    x = F.col(value_col).cast("long")
    w_ord = Window.partitionBy(*keys).orderBy(time_col)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy(*keys)
    s = (
        rollup.select(*keys, F.col(time_col), x.alias("_x"))
        .withColumn("_k", F.row_number().over(w_ord))
        .withColumn("_s1", F.sum("_x").over(w_cum))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn("_t1", F.sum("_x").over(w_all))
        .withColumn("_t2", F.sum(F.col("_x") * F.col("_x")).over(w_all))
    )
    k = F.col("_k").cast("double")
    n = F.col("_n").cast("double")
    t1 = F.col("_t1").cast("double")
    mean_l = F.col("_s1").cast("double") / k
    mean_r = (F.col("_t1") - F.col("_s1")).cast("double") / (n - k)
    var = (F.col("_t2").cast("double") - t1 * t1 / n) / (n - F.lit(1.0))
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    score = F.abs(mean_r - mean_l) / (
        sd * F.sqrt(F.lit(1.0) / k + F.lit(1.0) / (n - k))
    )
    cand = (
        s.where(
            (F.col("_k") < F.col("_n"))
            & (F.col("_n") >= F.lit(int(min_buckets)))
        )
        .withColumn("_mean_l", mean_l)
        .withColumn("_mean_r", mean_r)
        .withColumn("_sd", sd)
        .withColumn("_score", score)
        .where(F.col("_sd") > 0)
    )
    best = Window.partitionBy(*keys).orderBy(F.desc("_score"), time_col)
    return (
        cand.withColumn("_rk", F.row_number().over(best))
        .where((F.col("_rk") == 1) & (F.col("_score") > F.lit(score_threshold)))
        .select(
            *keys,
            F.col(time_col).alias("split_after"),
            F.col("_k").cast("long").alias("n_left"),
            (F.col("_n") - F.col("_k")).cast("long").alias("n_right"),
            F.round("_mean_l", 6).alias("mean_left"),
            F.round("_mean_r", 6).alias("mean_right"),
            F.round(F.col("_mean_r") - F.col("_mean_l"), 6).alias("shift"),
            F.round("_score", 6).alias("score"),
        )
    )


def robust_anomalous_buckets(
    rollup: DataFrame,
    key_cols: Sequence[str],
    value_col: str = "n_rows",
    time_col: str = "bucket_start",
    m_threshold: float = 3.5,
) -> DataFrame:
    """MAD-based outlier buckets — the ROBUST twin of
    ``anomalous_buckets``. A z-score screen self-destructs under the
    very anomaly it hunts: one huge spike inflates the sample sd enough
    to hide itself (and everything else). The modified z-score
    ``M = 0.6745 * (x - median) / MAD`` (Iglewicz-Hoaglin) uses rank
    statistics an outlier cannot drag.

    Determinism discipline: NO interpolation. The median is the exact
    LOWER median — the element at rank ceil(n/2) under the total order
    (value, time) — and the MAD is the lower median of the integer
    deviations |x - med| under (deviation, value, time). Both are
    integers picked by rank, so M is one fixed double expression over
    integers and the 0.6745 literal: bit-replayable in any engine,
    which interpolated percentiles are not.

    Plan: the input is an already-aggregated rollup (bucket-scale).
    All four window specs share one hash partitioning on the key —
    ONE Exchange; the two orderings are sorts within it.
    """
    keys = list(key_cols)
    x = F.col(value_col).cast("long")
    w_all = Window.partitionBy(*keys)
    w_val = w_all.orderBy("_x", time_col)
    s = (
        rollup.select(*keys, F.col(time_col), x.alias("_x"))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn("_rn", F.row_number().over(w_val))
    )
    mid = F.floor((F.col("_n") + 1) / 2.0)
    s = s.withColumn(
        "_med", F.max(F.when(F.col("_rn") == mid, F.col("_x"))).over(w_all)
    ).withColumn("_d", F.abs(F.col("_x") - F.col("_med")))
    w_dev = w_all.orderBy("_d", "_x", time_col)
    s = s.withColumn("_rd", F.row_number().over(w_dev)).withColumn(
        "_mad", F.max(F.when(F.col("_rd") == mid, F.col("_d"))).over(w_all)
    )
    m = (
        F.lit(0.6745)
        * (F.col("_x") - F.col("_med")).cast("double")
        / F.col("_mad").cast("double")
    )
    return (
        s.where((F.col("_n") >= 4) & (F.col("_mad") > 0)
                & (F.abs(m) > F.lit(float(m_threshold))))
        .select(
            *keys,
            F.col(time_col),
            F.col("_x").alias(value_col),
            F.col("_med").alias("median"),
            F.col("_mad").alias("mad"),
            F.round(m, 6).alias("m_score"),
        )
    )


def missing_buckets(
    rollup: DataFrame,
    key_cols: Sequence[str],
    time_col: str = "bucket_start",
    interval: str = "1 hour",
) -> DataFrame:
    """Data-COMPLETENESS gaps: expected time buckets with NO data,
    per key — "the provider sent nothing for 3 hours" check that row
    rules (which only see rows that exist) and volume outliers (which
    need a bucket row to score) both miss.

    Per key the expected grid is ``sequence(min bucket, max bucket,
    interval)`` — generated from the ALREADY-AGGREGATED rollup, so the
    explode is bucket-scale, never data-scale — anti-joined against the
    observed buckets. Both sides of the anti-join are keyed the same
    way; AQE broadcasts the observed side per key-group when it fits.

    Output: one row per (key, missing bucket).
    """
    keys = list(key_cols)
    spans = rollup.groupBy(*keys).agg(
        F.min(time_col).alias("_mn"), F.max(time_col).alias("_mx")
    )
    expected = spans.select(
        *keys,
        F.explode(
            F.expr(f"sequence(_mn, _mx, interval {interval})")
        ).alias(time_col),
    )
    return expected.join(
        rollup.select(*keys, time_col), [*keys, time_col], "left_anti"
    )
