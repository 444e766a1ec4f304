"""Incremental (partition-delta) validation.

The north-star contract requires a killed run to resume without
revalidating completed partitions (plans/checkpoint.py handles that
WITHIN a run). This module handles the BETWEEN-runs version: on a
10^12-row table where today's load touched 2% of partitions, a full
revalidation is 50x wasted work. Record a per-partition content
fingerprint manifest with each validated snapshot; next run, diff the
manifests and validate ONLY partitions whose content actually changed
(plus added ones), carrying forward the recorded verdicts for the rest.

Fingerprint: bit_xor over rows of a 60-bit md5 slice of the row's
canonical string form. Order-insensitive (shuffle/compaction does not
change it), one scan, map-side combinable — the manifest is one row per
partition. Engine-portable (same arithmetic replays in DuckDB), so the
whole delta protocol is oracle-checkable.

Caveat (documented, standard for xor-folding): a partition whose row
multiset changes by an EVEN number of copies of the same row keeps the
same xor; ``n_rows`` is recorded alongside to catch the common
pair-insert/delete case. Production hardening would add a second
independent fold (e.g. sum mod 2^62 of a different hash slice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NULL = "␀"  # printable sentinel so NULL != '' != absent
_SEP = "|"


def row_hash(cols: list[str]):
    """60-bit engine-portable row content hash (column order matters)."""
    canon = F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    )
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")


def partition_fingerprints(
    df: DataFrame, part_col: str, cols: list[str]
) -> DataFrame:
    """One row per partition: (part, n_rows, fingerprint)."""
    return (
        df.groupBy(F.col(part_col).alias("part"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(row_hash(cols)).alias("fingerprint"),
        )
    )


def partition_delta(current: DataFrame, baseline: DataFrame) -> DataFrame:
    """Diff two fingerprint manifests -> (part, status, n_rows_cur,
    n_rows_base) with status in added/removed/changed/unchanged.

    Both inputs are manifest-scale (one row per partition); the join is
    trivially broadcastable and AQE picks that up on its own.
    """
    c = current.select(
        "part",
        F.col("n_rows").alias("n_rows_cur"),
        F.col("fingerprint").alias("fp_cur"),
    )
    b = baseline.select(
        "part",
        F.col("n_rows").alias("n_rows_base"),
        F.col("fingerprint").alias("fp_base"),
    )
    j = c.join(b, "part", "full_outer")
    status = (
        F.when(F.col("fp_base").isNull(), F.lit("added"))
        .when(F.col("fp_cur").isNull(), F.lit("removed"))
        .when(
            (F.col("fp_cur") == F.col("fp_base"))
            & (F.col("n_rows_cur") == F.col("n_rows_base")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "part",
        status.alias("status"),
        F.coalesce("n_rows_cur", F.lit(0)).alias("n_rows_cur"),
        F.coalesce("n_rows_base", F.lit(0)).alias("n_rows_base"),
    )


def dirty_partitions_filter(
    df: DataFrame, delta: DataFrame, part_col: str
) -> DataFrame:
    """Restrict ``df`` to partitions that need (re)validation.

    Broadcast left-semi join on the manifest-scale delta — on a real
    partitioned table this collapses to partition pruning (the part
    values are the partition keys), so unchanged data is never read.
    """
    dirty = F.broadcast(
        delta.where(F.col("status").isin("added", "changed")).select(
            F.col("part").alias(part_col)
        )
    )
    return df.join(dirty, part_col, "left_semi")
