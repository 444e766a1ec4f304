"""Salted two-stage duplicate-key detection (BASELINE.json A4).

The reference delegates primary-key integrity to Postgres
(``ON CONFLICT (trip_id) DO ...`` in mds/db.py ≈L220–300). At 10^12 rows a
plain ``groupBy(key).count()`` is correct but its stage-1 shuffle can skew
if a pathological key repeats billions of times. We make the partial/merge
explicit:

  stage 1: groupBy(spark_partition_id(), key).count()
           -- map-side only distribution: identical keys living on M input
              partitions produce M partial rows, hashed to M different
              reducers (the input-partition id IS the salt; deterministic,
              no rand()).
  stage 2: groupBy(key).sum(partial) -> filter n > 1
           -- merges at most M small rows per key.

With AQE on, stage-2 skew is additionally split at runtime. The final
duplicate set is tiny relative to input, so every downstream join against
it broadcasts.

Broadcast contract: these operators validate PRIMARY-KEY integrity —
duplicates are faults, so the duplicate-key set is bounded by the fault
volume, not the corpus (and the hint exists because the set comes out of
an aggregation whose static size estimate would otherwise force a second
full shuffle of the input). For dup-HEAVY corpora — where duplicates are
a constant fraction by design — use operators/dedup.py, whose drop-set
joins deliberately carry no hint and let AQE choose.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from mds_provider_spark import schema as S


def duplicate_keys(df: DataFrame, cols: Sequence[str], salt_partitions: int | None = None) -> DataFrame:
    """Return one row per duplicated key: (*cols, n_rows).

    Rows with a NULL key component are EXCLUDED: SQL groupBy would pool
    all NULLs into one group and report them as "duplicates", but
    null-ness is the missing_field rule's finding, not a uniqueness
    violation (JSON-Schema keeps `required` and uniqueness independent).
    """
    cols = list(cols)
    present = df.select(*cols)
    for c in cols:
        present = present.where(F.col(c).isNotNull())
    partial = (
        present
        .groupBy(F.spark_partition_id().alias("_salt"), *cols)
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return (
        partial.groupBy(*cols)
        .agg(F.sum("_partial").alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


def duplicate_exemplars(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str],
    keep: str = "first",
) -> DataFrame:
    """Keep-one dedup picker (SURVEY.md §2.5): for each duplicated key,
    rank conflicting rows deterministically and mark the exemplar.

    Returns the conflicting rows with (dup_rank, is_exemplar). Uses
    ``row_number() over (partition by key order by ...)`` — the window
    only runs over the (tiny, broadcast-joined) duplicate subset, never
    the full table, so no full-data window shuffle.
    """
    from pyspark.sql import Window

    cols = list(cols)
    dup = duplicate_keys(df, cols).select(*cols)
    subset = df.join(F.broadcast(dup), cols, "left_semi")
    ordering = [F.col(c).asc() if keep == "first" else F.col(c).desc() for c in order_by]
    w = Window.partitionBy(*cols).orderBy(*ordering)
    return subset.withColumn("dup_rank", F.row_number().over(w)).withColumn(
        "is_exemplar", F.col("dup_rank") == 1
    )


def duplicate_violations(
    df: DataFrame,
    cols: Sequence[str],
    key_col: str = "clip_id",
    part_col: str = "part_id",
) -> DataFrame:
    """Violation rows for duplicated keys, canonical shape.

    Every row that belongs to a duplicated key is reported (the reference
    semantics: each conflicting record is an error), found by a BROADCAST
    semi-join of the (tiny) duplicate-key set back onto the table — no
    second full shuffle of the input.
    """
    cols = list(cols)
    dup = duplicate_keys(df, cols).select(*cols)
    rid = S.rule_id(S.DUPLICATE_ID, ",".join(cols))
    return (
        df.join(F.broadcast(dup), cols, "left_semi")
        .select(
            F.lit(rid).alias("rule_id"),
            F.col(key_col).alias("clip_id"),
            F.lit(",".join(cols)).alias("column_name"),
            F.lit(f"duplicate key on ({', '.join(cols)})").alias("message"),
            F.col(part_col).alias("part_id"),
        )
    )
