"""Incremental (partition-delta) validation.

The north-star contract requires a killed run to resume without
revalidating completed partitions (plans/checkpoint.py handles that
WITHIN a run). This module handles the BETWEEN-runs version: on a
10^12-row table where today's load touched 2% of partitions, a full
revalidation is 50x wasted work. Record a per-partition content
fingerprint manifest with each validated snapshot; next run, diff the
manifests and validate ONLY partitions whose content actually changed
(plus added ones), carrying forward the recorded verdicts for the rest.

Fingerprint: TWO independent order-insensitive folds over the row's
canonical string form, one scan, map-side combinable — the manifest is
one row per partition, engine-portable (the same arithmetic replays in
DuckDB), so the whole delta protocol is oracle-checkable.

* ``fingerprint``  — bit_xor of a 60-bit md5 slice (hex chars 1-15).
* ``fingerprint2`` — SUM mod 2^62 of a DIFFERENT 60-bit md5 slice (hex
  chars 17-31), accumulated in decimal(38,0) so 10^12-row partitions
  (~2^100 raw sum) cannot overflow before the mod.

Why two folds: xor alone has an even-multiplicity blind spot — a
partition whose row multiset changes by an EVEN number of copies of the
same row keeps its xor (x ⊕ x = 0). The additive fold counts
multiplicity (k copies contribute k·h₂ mod 2^62), so a pair-insert of
the same row flips ``fingerprint2`` even though ``fingerprint`` and
the common-case guard ``n_rows`` move too; the one change class BOTH
folds miss together is a multiset swap where the xor difference AND the
modular-sum difference cancel simultaneously — adversarial, not
operational. ``n_rows`` still rides along for the cheap count check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NULL = "␀"  # printable sentinel so NULL != '' != absent
_SEP = "|"


_MOD2 = 4611686018427387904  # 2^62 — modulus of the additive fold


def _canon(cols: list[str]):
    return F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    )


def row_hash(cols: list[str]):
    """60-bit engine-portable row content hash (column order matters)."""
    return F.conv(F.substring(F.md5(_canon(cols)), 1, 15), 16, 10).cast(
        "bigint"
    )


def row_hash2(cols: list[str]):
    """Independent second 60-bit hash: a DISJOINT md5 slice (chars
    17-31) of the same canonical form — one md5 per row feeds both
    folds (Catalyst CSEs the shared ``md5(canon)``)."""
    return F.conv(F.substring(F.md5(_canon(cols)), 17, 15), 16, 10).cast(
        "bigint"
    )


def partition_fingerprints(
    df: DataFrame, part_col: str, cols: list[str]
) -> DataFrame:
    """One row per partition: (part, n_rows, fingerprint, fingerprint2).

    ``fingerprint2`` sums in decimal(38,0) (exact, order-independent)
    and reduces mod 2^62 AFTER the aggregate — a bigint sum would wrap
    at ~8 rows of 60-bit values; decimal holds ~10^38 ≈ 2^126, far above
    the 10^12-row design point's ~2^100 worst case.
    """
    return (
        df.groupBy(F.col(part_col).alias("part"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(row_hash(cols)).alias("fingerprint"),
            F.pmod(
                F.sum(row_hash2(cols).cast("decimal(38,0)")),
                F.lit(_MOD2).cast("decimal(38,0)"),
            ).cast("bigint").alias("fingerprint2"),
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
        F.col("fingerprint2").alias("fp2_cur"),
    )
    # Manifests persisted by the pre-round-6 single-fold code lack
    # fingerprint2; degrade gracefully instead of raising on the first
    # incremental run after upgrade — a NULL fp2_base falls through the
    # equality test to 'changed', forcing a safe full revalidation of
    # every partition once, after which the rewritten manifest carries
    # both folds (round-6 advice).
    b = baseline.select(
        "part",
        F.col("n_rows").alias("n_rows_base"),
        F.col("fingerprint").alias("fp_base"),
        (
            F.col("fingerprint2") if "fingerprint2" in baseline.columns
            else F.lit(None).cast("bigint")
        ).alias("fp2_base"),
    )
    j = c.join(b, "part", "full_outer")
    status = (
        F.when(F.col("fp_base").isNull(), F.lit("added"))
        .when(F.col("fp_cur").isNull(), F.lit("removed"))
        .when(
            (F.col("fp_cur") == F.col("fp_base"))
            & (F.col("fp2_cur") == F.col("fp2_base"))
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
