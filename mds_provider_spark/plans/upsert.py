"""Keyed MERGE-style upsert over a hash-partitioned parquet table — the
reference's Postgres stage-table + ON CONFLICT load (mds/db.py
≈L180-300, ``Database.load`` with on-conflict-update semantics) restated
for a data lake. In production this is ONE Iceberg ``MERGE INTO`` /
``overwritePartitions`` transaction; the parquet stand-in below keeps
the same two properties that matter:

* **touched-partitions only**: the updates' part ids are collected
  (bounded by the partition count, never by data), the existing table is
  read with a ``part_id IN (...)`` partition-pruned scan, and dynamic
  partition overwrite rewrites exactly those directories. A 10^12-row
  table with a 10^6-row update batch does 10^6-row-scale work.
* **idempotent**: re-running the same upsert produces byte-identical
  partitions (anti-join + union is a pure function of (table, updates)),
  so a retry after a crash mid-write converges instead of duplicating.

Atomicity across multiple partitions is the commit marker's job
(``CommitLog``), exactly like the validation runner: pass ``log`` and a
``batch`` id and readers that trust only marked batches never observe a
half-written multi-partition upsert.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def upsert_parquet(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    part_col: str = "part_id",
    version_col: str | None = None,
    log=None,
    batch: int | None = None,
) -> dict:
    """Upsert ``updates`` into the ``part_col``-partitioned parquet table
    at ``table_path``: rows whose key exists are replaced, new keys are
    inserted, untouched partitions are never read or written.

    ``updates`` must already carry ``part_col`` routed by the SAME
    hash(key) % P convention as the table (the runner/bucketing layout) —
    a mismatched route would strand the old row in another partition, so
    keys in ``updates`` whose partition differs from the table's routing
    are the caller's contract, not checked here.

    Duplicate keys within ``updates``: with ``version_col`` the highest
    version wins (ties break on nothing — equal versions for one key
    raise); without it duplicates raise, because "one of them, dealer's
    choice" is how silent nondeterminism ships.

    Returns ``{"parts": [...], "upserted": n, "existing_kept": m}``.
    """
    keys = list(key_cols)
    if version_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
        ranked = updates.withColumn("_uq_rn", F.row_number().over(w)) \
                        .withColumn("_uq_n", F.count(F.lit(1)).over(
                            Window.partitionBy(*keys, version_col)))
        dup_ver = ranked.where((F.col("_uq_rn") == 1) & (F.col("_uq_n") > 1))
        if dup_ver.take(1):
            raise ValueError(
                f"updates contain equal {version_col!r} values for one key "
                "— the winner would be nondeterministic"
            )
        updates = ranked.where(F.col("_uq_rn") == 1).drop("_uq_rn", "_uq_n")
    else:
        dup = updates.groupBy(*keys).count().where(F.col("count") > 1)
        if dup.take(1):
            raise ValueError(
                "updates contain duplicate keys and no version_col — "
                "the surviving row would be nondeterministic"
            )

    touched = [r[0] for r in updates.select(part_col).distinct().collect()]
    if not touched:
        return {"parts": [], "upserted": 0, "existing_kept": 0}

    import os

    if os.path.isdir(table_path):
        existing = (
            spark.read.parquet(table_path)
            .where(F.col(part_col).isin(touched))
        )
        kept = existing.join(
            updates.select(*keys).distinct(), keys, "left_anti"
        )
        merged = kept.unionByName(updates.select(*existing.columns))
        n_kept = kept.count()
    else:
        merged = updates
        n_kept = 0
    n_up = updates.count()

    (
        merged.repartition(part_col)
        .write.mode("overwrite")
        .partitionBy(part_col)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(table_path)
    )
    if log is not None and batch is not None:
        log.commit_group(batch, [int(p) for p in touched], "upsert",
                         batch=batch,
                         extra={"kind": "upsert", "upserted": n_up,
                                "existing_kept": n_kept})
    return {"parts": sorted(touched), "upserted": n_up,
            "existing_kept": n_kept}
