"""Round-5 late-operator stress: integrity trio + monotonicity +
category_drift + missing_buckets at 5x10^7-row scale, synthesized
deterministically in-executor (spark.range + hash arithmetic — no data
files, no RNG; same discipline as tools/stress_round5.py).

Usage: python tools/stress_integrity.py [n_rows]
Prints one JSON line with per-operator wall seconds and result counts
(pure functions of n and the hash constants — a partitioning bug
changes them).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000

    from mds_provider_spark.session import get_spark
    from mds_provider_spark.operators import drift as DR
    from mds_provider_spark.operators import integrity as ING

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("stress-integrity", parallelism=cpus,
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_rows": n}

    h = F.xxhash64(F.col("id"))
    h2 = F.xxhash64(F.col("id"), F.lit(7))

    def timed(name, df):
        t0 = time.monotonic()
        c = df.count()
        out[name] = {"sec": round(time.monotonic() - t0, 2), "rows": c}

    # --- sequence integrity: n/10 keys x positions 1..10; ~0.1% of rows
    # teleport to position 1 (dup there + hole where they left)
    seq = spark.range(n).select(
        (F.col("id") / 10).cast("long").alias("k"),
        F.when(F.pmod(h, F.lit(1000)) == 0, F.lit(1))
        .otherwise(F.pmod(F.col("id"), F.lit(10)) + 1).alias("pos"),
    )
    timed("sequence_integrity", ING.sequence_integrity(seq, ["k"], "pos"))

    # --- interval integrity: n intervals over 1M keys
    iv = spark.range(n).select(
        F.pmod(h, F.lit(1_000_000)).alias("k"),
        F.pmod(h2, F.lit(1_000_000_000)).alias("s"),
        (F.pmod(h2, F.lit(1_000_000_000)) + 1
         + F.pmod(F.xxhash64("id", F.lit(9)), F.lit(1000))).alias("e"),
    )
    timed("interval_integrity", ING.interval_integrity(iv, ["k"], "s", "e"))

    # --- skew-proof top-k: 90% of rows in ONE group
    samp = spark.range(n).select(
        F.when(F.pmod(h, F.lit(10)) < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), F.pmod(h, F.lit(10)).cast("string")))
        .alias("g"),
        F.md5(F.col("id").cast("string")).alias("hh"),
        F.col("id"),
    )
    timed("sample_per_group_k5",
          ING.sample_per_group(samp, ["g"], ["hh", "id"], k=5))

    # --- monotonicity: 1M keys, 0.1% negated values
    mono = spark.range(n).select(
        F.pmod(h, F.lit(1_000_000)).alias("k"),
        F.col("id").alias("ord"),
        F.when(F.pmod(h2, F.lit(1000)) == 0, -F.col("id"))
        .otherwise(F.col("id")).alias("val"),
    )
    timed("monotonicity",
          ING.monotonicity_violations(mono, ["k"], "ord", "val"))

    # --- category drift: 1000 categories, one renamed on the current side
    base = spark.range(n).select(
        F.concat(F.lit("c"), F.pmod(h, F.lit(1000)).cast("string")).alias("cat"))
    cur = spark.range(n).select(
        F.when(F.pmod(h, F.lit(1000)) == 0, F.lit("c_renamed"))
        .otherwise(F.concat(F.lit("c"), F.pmod(h, F.lit(1000)).cast("string")))
        .alias("cat"))
    timed("category_drift", DR.category_drift(cur, base, "cat"))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
