"""Bucketed table layout — the shuffle-free join/aggregate substrate.

The 100 TB story for every keyed operator in this engine (uniqueness,
referential, snapshot diff, dedup materialization) is the same: if both
sides already live hash-bucketed on the key, Catalyst's
EnsureRequirements sees the output partitioning as satisfying the
join/agg distribution and plans NO Exchange — the single biggest cost
on a 10^12-row table simply disappears. Iceberg expresses this as a
`bucket(N, key)` partition transform + storage-partitioned joins; in
the jar-less sandbox the same physics is exercised through Spark's
native bucketed tables (``bucketBy`` + ``saveAsTable``), which is also
the public-Spark mechanism a non-Iceberg deployment would use.

tests/test_sessions_sketches.py asserts the contract on the physical
plan: bucketed-bucketed equi-join -> zero Exchange operators.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: str | Sequence[str],
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) on ``keys``.

    ``sort=True`` additionally sorts within each bucket so downstream
    sort-merge joins skip their Sort as well as their Exchange. Pick
    ``n_buckets`` so one bucket of the LARGER table fits an executor's
    shuffle memory (10^12 rows / 2^14 buckets ≈ 60M rows/bucket); both
    join sides must use the SAME bucket count for the co-location to
    hold (Spark requires equal counts to elide the Exchange).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (a plain
    ``spark.read.parquet`` of the warehouse path would drop the
    bucketing spec and reintroduce the Exchange)."""
    return spark.table(table)
