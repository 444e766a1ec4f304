"""Single-pass per-column profiling (BASELINE.json A1–A3, A5).

The reference has no stats at all (per-record validation only); the north
star mandates per-column null rate, min/max, approx-distinct (HLL) and
quantile sketches. ALL of it is computed in ONE wide aggregate over ONE
scan — Catalyst runs it as a single partial+final hash-agg job whose
shuffle carries exactly one partially-aggregated row per input partition
(sketches included: HLL and the GK/KLL-style percentile_approx buffers are
mergeable, so partial/merge two-stage combination is what the built-in
physical plan already does — the explicit requirement of BASELINE.json).

Output is long format (one row per column) so it feeds the drift
comparator and the snapshot table directly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

DEFAULT_PROBS = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _is_numeric(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, _NUMERIC)


def profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    probs: Sequence[float] = DEFAULT_PROBS,
    rsd: float = 0.02,
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per column: (column_name, n_rows, null_count, null_rate,
    min_val, max_val, approx_distinct, quantiles).

    ``exact_distinct=True`` swaps HLL for count(distinct) — used only by
    the DuckDB oracle path at test scale (HLL estimates are
    engine-specific); production keeps the sketch.

    Single job: wide agg -> 1 row -> explode(array<struct>) back to long.
    """
    cols = list(cols or df.columns)
    aggs: list = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0)).alias(f"_null_{c}")
        )
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"_dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"_dist_{c}"))
        if _is_numeric(df, c):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"_max_{c}"))
            aggs.append(
                F.percentile_approx(F.col(c).cast("double"), list(probs), 10000).alias(
                    f"_q_{c}"
                )
            )
    wide = df.agg(*aggs)

    structs = []
    for c in cols:
        numeric = _is_numeric(df, c)
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("null_count"),
                F.try_divide(F.col(f"_null_{c}"), F.col("_n")).alias("null_rate"),
                (F.col(f"_min_{c}") if numeric else F.lit(None).cast("double")).alias("min_val"),
                (F.col(f"_max_{c}") if numeric else F.lit(None).cast("double")).alias("max_val"),
                F.col(f"_dist_{c}").cast("long").alias("approx_distinct"),
                (F.col(f"_q_{c}") if numeric else F.lit(None).cast("array<double>")).alias("quantiles"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def salted_group_count(
    df: DataFrame, keys: Sequence[str], agg_cols: dict[str, str] | None = None
) -> DataFrame:
    """Explicitly salted groupBy for pathologically hot keys (BASELINE:
    "salted hash-aggregation", hot codecs).

    Stage 1 groups by (input-partition-id, keys) — identical hot keys on
    M input partitions produce M partial rows hashed to M reducers; stage
    2 merges the partials per key. Spark's partial aggregation usually
    does this implicitly for algebraic aggs; the explicit form guarantees
    it for any agg expression and makes the two-stage shape visible in
    the plan (and to the optimizer-skeptical reader).
    """
    keys = list(keys)
    aggs1 = [F.count(F.lit(1)).alias("_cnt")]
    aggs2 = [F.sum("_cnt").alias("n_rows")]
    for col, how in (agg_cols or {}).items():
        if how == "sum":
            aggs1.append(F.sum(col).alias(f"_s_{col}"))
            aggs2.append(F.sum(f"_s_{col}").alias(f"sum_{col}"))
        elif how == "min":
            aggs1.append(F.min(col).alias(f"_m_{col}"))
            aggs2.append(F.min(f"_m_{col}").alias(f"min_{col}"))
        elif how == "max":
            aggs1.append(F.max(col).alias(f"_x_{col}"))
            aggs2.append(F.max(f"_x_{col}").alias(f"max_{col}"))
        else:
            raise ValueError(f"unsupported agg {how!r}")
    partial = df.groupBy(F.spark_partition_id().alias("_salt"), *keys).agg(*aggs1)
    return partial.groupBy(*keys).agg(*aggs2)


def hll_sketches(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Mergeable HLL sketch bytes per column (Spark >= 3.5 Datasketches).

    These are the partial sketches BASELINE.json's "two-stage
    partial/merge aggregation for sketch combination" refers to: sketches
    from independent runs/partitions merge via ``hll_union_agg`` without
    rescanning data — e.g. daily sketches folding into a monthly profile.
    """
    aggs = [F.hll_sketch_agg(F.col(c).cast("string")).alias(c) for c in cols]
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(c).alias("sketch"),
            F.hll_sketch_estimate(F.col(c)).alias("estimate"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def merge_hll(sketches: DataFrame) -> DataFrame:
    """Final merge stage: union sketch rows (e.g. from many runs) by column."""
    return sketches.groupBy("column_name").agg(
        F.hll_union_agg("sketch").alias("sketch")
    ).select(
        "column_name",
        "sketch",
        F.hll_sketch_estimate("sketch").alias("estimate"),
    )
