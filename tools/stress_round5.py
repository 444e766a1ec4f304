"""Round-5 operator stress: sessionize / frequent_items / time_rollup /
anomalous_buckets / snapshot_diff at 10^7-10^8-row scale, synthesized
deterministically in-executor (spark.range + hash arithmetic — no data
files, no RNG state; the same discipline as the clip generator).

Usage: python tools/stress_round5.py [n_events] [n_keys]
Prints one JSON line with per-operator wall seconds and result counts
(counts double as a sanity check — they are pure functions of (n, seed
constants), so a partitioning bug changes them).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_diff = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000

    from mds_provider_spark.session import get_spark
    from mds_provider_spark.operators import diff as DIF
    from mds_provider_spark.operators import sessions as SES
    from mds_provider_spark.operators import stats as ST

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("stress-r5", parallelism=cpus,
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_events": n_events, "n_diff_keys": n_diff}

    # --- synthetic event stream: 30 days, ~500k users with a 1% hot tail
    h = F.xxhash64(F.col("id"))
    ev = (
        spark.range(n_events)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + F.pmod(h, F.lit(30 * 86400))
            ).alias("ts"),
            F.when(
                F.pmod(h, F.lit(100)) < 1,
                F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(5)),
            )
            .otherwise(F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(500_000)))
            .alias("user_id"),
            F.concat(F.lit("type_"), F.pmod(h, F.lit(5)).cast("string"))
            .alias("event_type"),
        )
    )
    ev.write.mode("overwrite").parquet("/tmp/stress_r5_events")
    ev = spark.read.parquet("/tmp/stress_r5_events")

    t0 = time.monotonic()
    out["sessionize_rows"] = SES.session_stats(ev, gap_s=1800).count()
    out["sessionize_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    hh = ST.frequent_items(ev, "user_id", threshold_frac=0.001,
                           mg_capacity=4096)
    out["frequent_items_rows"] = hh.count()
    out["frequent_items_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    roll = SES.time_rollup(ev, interval="1 hour", keys=("event_type",))
    out["rollup_rows"] = roll.count()
    out["rollup_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    out["anomalies_rows"] = SES.anomalous_buckets(
        roll, ["event_type"], z_threshold=3.0
    ).count()
    out["anomalies_sec"] = round(time.monotonic() - t0, 1)

    # --- snapshot diff on n_diff unique keys: 3% removed, 5% changed,
    # 2% re-inserted under shifted keys (the oracle query's derivation)
    old = spark.range(n_diff).select(
        F.col("id").alias("k"),
        (F.col("id") * 7).cast("double").alias("v"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(100)).alias("_b"),
    )
    new = (
        old.where(F.col("_b") >= 3)
        .withColumn("v", F.when(F.col("_b") < 8, F.col("v") + 1).otherwise(F.col("v")))
        .unionByName(
            old.where(F.col("_b") < 2).withColumn("k", F.col("k") + F.lit(n_diff))
        )
    )
    t0 = time.monotonic()
    counts = {
        r["status"]: r["n"]
        for r in DIF.snapshot_diff_counts(
            old.drop("_b"), new.drop("_b"), ["k"]
        ).collect()
    }
    out["diff_sec"] = round(time.monotonic() - t0, 1)
    out["diff_counts"] = counts

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
