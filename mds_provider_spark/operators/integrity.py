"""Structural-integrity checks: position sequences, interval tilings,
and bounded violation examples.

The reference validates each record in isolation (jsonschema walk per
payload — see SURVEY.md §0 reconstruction of mds_provider/validation).
A warehouse validator also needs ORDER-aware structure checks: does a
clip's segment index column run 0..n-1 without holes or repeats, do the
segments tile the clip without overlap, and — at 10^12 rows — can we
show a human K example rows per rule without collecting a violation set
that may itself be billions of rows.

All three operators are pure Catalyst (no Python in the hot path), and
each is designed around one bounded shuffle:

* ``sequence_integrity`` — two-phase aggregation; the second phase
  consumes pre-reduced (key, position) rows.
* ``interval_integrity`` — one hash partition per key serves both the
  running-max window and the final per-key rollup (same partitioning,
  Catalyst plans a single Exchange).
* ``sample_per_group`` — classic distributed top-k: partition-local
  prune to ≤k rows per (input-partition, group), then a global rank
  over the ≤k·P survivors. The group column never hash-partitions the
  full input, so a single hot rule_id cannot skew the job.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def sequence_integrity(
    df: DataFrame,
    key_cols: Sequence[str],
    pos_col: str,
    expected_start: int = 1,
) -> DataFrame:
    """Per-key contiguity audit of an integer position column.

    For every key group the positions are expected to be exactly
    ``expected_start .. expected_start + n - 1``, each once. Emits one
    row per VIOLATING key with the full damage report:

    ``n_rows`` total rows, ``n_positions`` distinct positions,
    ``n_dup_positions`` positions seen more than once, ``n_extra_rows``
    surplus rows beyond one-per-position, ``n_missing`` holes inside
    the observed [min, max] range, ``min_pos``/``max_pos``, and
    ``starts_ok`` (min == expected_start).

    Rows with a NULL position are their own finding (``n_null_pos`` —
    a position that doesn't exist can be neither present nor missing)
    and are excluded from the contiguity math, so they can never skew
    ``n_positions`` into a negative ``n_missing``.

    Scale: phase 1 reduces to one row per (key, position) with map-side
    partial aggregation doing most of the work before the shuffle;
    phase 2 aggregates the already-reduced rows on a prefix of the same
    grouping key. No count(distinct) expand, no window over raw data.
    """
    keys = list(key_cols)
    pos = F.col(pos_col).cast("long")
    per_pos = df.groupBy(*keys, pos.alias("_pos")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    nn = F.col("_pos").isNotNull()
    agg = per_pos.groupBy(*keys).agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.sum(F.when(nn, 1).otherwise(0)).cast("long").alias("n_positions"),
        F.sum(F.when(~nn, F.col("_c")).otherwise(0)).cast("long")
        .alias("n_null_pos"),
        F.min("_pos").alias("min_pos"),
        F.max("_pos").alias("max_pos"),
        F.sum(F.when(nn & (F.col("_c") > 1), 1).otherwise(0)).cast("long")
        .alias("n_dup_positions"),
        F.sum(F.when(nn & (F.col("_c") > 1), F.col("_c") - 1).otherwise(0))
        .cast("long").alias("n_extra_rows"),
    )
    n_missing = F.when(
        F.col("n_positions") > 0,
        F.col("max_pos") - F.col("min_pos") + 1 - F.col("n_positions"),
    ).otherwise(F.lit(0)).cast("long")
    starts_ok = F.coalesce(
        F.col("min_pos") == F.lit(int(expected_start)), F.lit(False)
    )
    return (
        agg.withColumn("n_missing", n_missing)
        .withColumn("starts_ok", starts_ok)
        .where(
            (F.col("n_dup_positions") > 0)
            | (F.col("n_missing") > 0)
            | (F.col("n_null_pos") > 0)
            | (~F.col("starts_ok"))
        )
        .select(
            *keys, "n_rows", "n_positions", "min_pos", "max_pos",
            "n_dup_positions", "n_extra_rows", "n_missing", "n_null_pos",
            "starts_ok",
        )
    )


def interval_integrity(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key overlap/gap audit of half-open [start, end) intervals
    (audio segments tiling a clip, sessions tiling a day, ...).

    Ordered by (start, end), each interval is compared against the
    RUNNING MAX of all previous ends — not just the immediate
    predecessor, so a long interval swallowing several later ones is
    still a single coherent overlap count. Degenerate intervals
    (end <= start) are counted separately and excluded from the
    coverage math. Per key:

    ``n_intervals``, ``n_invalid`` (end <= start), ``n_overlaps``
    (start < running max of prior ends), ``n_gaps`` (start > running
    max), ``covered_s`` (union length, via the running max so doubly
    covered time counts once), ``span_s`` (min start .. max end).

    Start/end may be timestamps or numerics; timestamps are cast to
    epoch seconds and only DIFFERENCES are emitted, so the result is
    timezone-representation-proof. One Exchange total: the window's
    hash partitioning on the key is reused by the final groupBy.
    """
    keys = list(key_cols)

    def _num(c: str):
        col = F.col(c)
        dt = dict(df.dtypes)[c]
        if dt.startswith("timestamp"):
            return col.cast("timestamp").cast("long")
        return col.cast("double")

    s, e = _num(start_col), _num(end_col)
    base = df.select(*keys, s.alias("_s"), e.alias("_e"))
    valid = F.col("_e") > F.col("_s")
    w = Window.partitionBy(*keys).orderBy("_s", "_e")
    prev_max = F.max(F.when(valid, F.col("_e"))).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.when(
        ~valid, F.lit(0.0)
    ).otherwise(
        F.greatest(
            F.col("_e").cast("double")
            - F.greatest(F.col("_s").cast("double"),
                         F.coalesce(prev_max.cast("double"),
                                    F.col("_s").cast("double"))),
            F.lit(0.0),
        )
    )
    flagged = (
        base.withColumn("_pm", prev_max)
        .withColumn("_invalid", (~valid).cast("int"))
        .withColumn(
            "_overlap",
            (valid & F.col("_pm").isNotNull()
             & (F.col("_s") < F.col("_pm"))).cast("int"),
        )
        .withColumn(
            "_gap",
            (valid & F.col("_pm").isNotNull()
             & (F.col("_s") > F.col("_pm"))).cast("int"),
        )
        .withColumn("_cov", contrib)
    )
    return flagged.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("_invalid").cast("long").alias("n_invalid"),
        F.sum("_overlap").cast("long").alias("n_overlaps"),
        F.sum("_gap").cast("long").alias("n_gaps"),
        F.round(F.sum("_cov"), 6).alias("covered_s"),
        F.round(
            F.max(F.when(valid, F.col("_e"))).cast("double")
            - F.min(F.when(valid, F.col("_s"))).cast("double"),
            6,
        ).alias("span_s"),
    )


def sample_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Deterministic top-k example rows per group, at any scale.

    The naive ``row_number() OVER (PARTITION BY group)`` hash-partitions
    the ENTIRE input by the group key — with a handful of hot rule_ids
    over 10^12 violation rows that is one reducer per rule. Instead:

    1. partition-local prune: rank within (spark_partition_id, group)
       and keep ≤k rows. The shuffle key includes the physical
       partition id, so hot groups spread uniformly across reducers.
    2. global rank over the ≤ k·P survivors — a trivially small input.

    Top-k distributes over union (the global top-k is contained in the
    union of per-partition top-k's), so the result is EXACTLY the
    global top-k by ``order_cols``. Callers must pass an order that is
    total on distinct rows (e.g. md5(id), id, value) — identical full
    rows may swap, which is output-invisible.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    clash = {"__spg_pid", "__spg_r", "__spg_rk"} & set(df.columns)
    if clash:
        raise ValueError(f"input already has reserved columns {sorted(clash)}")
    groups = list(group_cols)
    order = [F.col(c) for c in order_cols]
    staged = df.withColumn("__spg_pid", F.spark_partition_id())
    w_local = Window.partitionBy("__spg_pid", *groups).orderBy(*order)
    pruned = (
        staged.withColumn("__spg_r", F.row_number().over(w_local))
        .where(F.col("__spg_r") <= k)
        .drop("__spg_pid", "__spg_r")
    )
    w_global = Window.partitionBy(*groups).orderBy(*order)
    return (
        pruned.withColumn("__spg_rk", F.row_number().over(w_global))
        .where(F.col("__spg_rk") <= k)
        .drop("__spg_rk")
    )


def monotonicity_violations(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    strict: bool = False,
) -> DataFrame:
    """Per-key ORDER-AGREEMENT audit: ``value_col`` must be
    non-decreasing (``strict=True``: strictly increasing) when the
    key's rows are walked in ``order_col`` order — "timestamps must
    move forward with the sequence id", "file offsets must grow with
    chunk index". ``sequence_integrity`` checks positions exist;
    this checks two columns AGREE about the order.

    One window (lag) per key — a single Exchange, reused by the final
    per-key rollup (same partitioning). Ties on ``order_col`` break by
    ``value_col`` so the verdict is deterministic under any input
    partitioning (equal-order rows compare in ascending value order
    and thus never produce a spurious inversion in non-strict mode).

    Emits one row per violating key: ``n_rows``, ``n_inversions``, and
    ``first_inversion_order`` (the smallest order value at which the
    series steps backward) for triage.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(order_col, value_col)
    prev = F.lag(value_col).over(w)
    bad = (
        (F.col(value_col) < prev)
        if not strict
        else (F.col(value_col) <= prev)
    )
    flagged = df.select(*keys, order_col, value_col).withColumn(
        "_inv", (prev.isNotNull() & bad).cast("int")
    )
    return (
        flagged.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_inv").cast("long").alias("n_inversions"),
            F.min(F.when(F.col("_inv") == 1, F.col(order_col)))
            .alias("first_inversion_order"),
        )
        .where(F.col("n_inversions") > 0)
    )
