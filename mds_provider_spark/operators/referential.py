"""Bidirectional referential-integrity checks (BASELINE.json J1).

The reference has no relational joins — FK integrity is delegated to
Postgres constraints in Database.load (mds/db.py). Spark-native: two
``left_anti`` equi-joins (orphans each way). ``left_anti`` is the cheapest
possible formulation: it short-circuits on first match, never materializes
matched rows, and Catalyst/AQE picks broadcast-hash when one side is small
(we hint it explicitly when the caller tells us the dim side is small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mds_provider_spark import schema as S


def orphans(
    left: DataFrame,
    right: DataFrame,
    key: str,
    key_right: str | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Rows of ``left`` whose key has no match in ``right``."""
    key_right = key_right or key
    rhs = right.select(F.col(key_right).alias(key)).where(F.col(key).isNotNull())
    if broadcast_right:
        rhs = F.broadcast(rhs)
    return left.join(rhs, key, "left_anti")


def referential_violations(
    clips: DataFrame,
    transcripts: DataFrame,
    key: str = "clip_id",
    part_col: str = "part_id",
) -> DataFrame:
    """Orphans both directions, canonical violation shape.

    rule_id is ``referential_orphan:<key>`` in both directions; the
    ``column_name`` field disambiguates which table the orphan lives in
    (clips vs transcripts), matching FIXTURES.md §2.
    """
    rid = S.rule_id(S.REFERENTIAL_ORPHAN, key)
    a = orphans(clips.select(key, part_col), transcripts, key).select(
        F.lit(rid).alias("rule_id"),
        F.col(key).alias("clip_id"),
        F.lit("clips").alias("column_name"),
        F.lit("clip has no transcript row").alias("message"),
        F.col(part_col).alias("part_id"),
    )
    b = orphans(transcripts.select(key, part_col), clips, key).select(
        F.lit(rid).alias("rule_id"),
        F.col(key).alias("clip_id"),
        F.lit("transcripts").alias("column_name"),
        F.lit("transcript has no clip row").alias("message"),
        F.col(part_col).alias("part_id"),
    )
    return a.unionByName(b)


def transcript_mismatch_violations(
    clips: DataFrame,
    transcripts: DataFrame,
    key: str = "clip_id",
    part_col: str = "part_id",
) -> DataFrame:
    """Per-row transcript equality vs the reference text (BASELINE input_hint).

    Equi-join on the key (sort-merge at scale; both sides are the full
    tables) then a null-safe inequality. ``eqNullSafe`` keeps NULL
    transcripts out of this rule — NULL is missing_field's job.
    """
    rid = S.rule_id(S.TRANSCRIPT_MISMATCH, "transcript")
    t = transcripts.select(key, "transcript_ref")
    return (
        clips.select(key, part_col, "transcript")
        .join(t, key, "inner")
        .where(
            F.col("transcript").isNotNull()
            & ~F.col("transcript").eqNullSafe(F.col("transcript_ref"))
        )
        .select(
            F.lit(rid).alias("rule_id"),
            F.col(key).alias("clip_id"),
            F.lit("transcript").alias("column_name"),
            F.lit("transcript differs from reference").alias("message"),
            F.col(part_col).alias("part_id"),
        )
    )
