"""Acoustic fingerprint family stress: fingerprint extraction ->
banded-LSH near-dup pairing -> keep-one materialization at 10^5-clip
scale (two orders of magnitude past the oracle-gate fixtures),
synthesized deterministically in-executor via the shared clip generator.

K planted byte-identical copies ('zz-' ids) make the core result a pure
function of (n, K, seed): every plant pair MUST appear with
bits_differ=0 (identical audio collides in every band), and keep-one
MUST drop >= K rows including every plant. Natural near-dup pairs add
on top; their count is deterministic too (seeded corpus), so a
partitioning or banding bug changes the printed numbers.

Usage: python tools/stress_fingerprint.py [n_clips] [k_plants]
Prints one JSON line (wall seconds + counts).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000

    from mds_provider_spark.session import get_spark
    from mds_provider_spark.functions import audio
    from mds_provider_spark.operators import dedup as D
    from mds_provider_spark.sources import fixtures as FX

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("stress-fp", parallelism=cpus,
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_clips": n, "k_plants": k}

    # telephony profile (8/16 kHz short clips) — the transfer-bound
    # sandbox envelope; plants derived DISTRIBUTED like the bench queries
    base = FX.generate_clips(
        spark, n, n_parts=64, seed=42,
        sr_choices=[8000, 16000], dur_choices=[250, 375, 500],
    ).select("clip_id", "bytes", "codec", "sr_hz")
    plant_ids = spark.createDataFrame(
        [(FX.clip_id_at(42, i),) for i in range(k)], "clip_id string")
    planted = base.join(F.broadcast(plant_ids), "clip_id").withColumn(
        "clip_id", F.concat(F.lit("zz-"), "clip_id"))
    corpus = base.unionByName(planted.select(*base.columns))

    t0 = time.monotonic()
    fps = audio.fingerprint_clips(corpus)
    from pyspark import StorageLevel

    fps = fps.persist(StorageLevel.MEMORY_AND_DISK)
    out["n_fingerprinted"] = fps.count()
    out["fingerprint_sec"] = round(time.monotonic() - t0, 1)
    out["clips_per_sec"] = round(out["n_fingerprinted"]
                                 / out["fingerprint_sec"], 1)

    t0 = time.monotonic()
    pairs = audio.fingerprint_near_dup(fps, persist_fps=False)
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    out["n_pairs"] = pairs.count()
    out["n_plant_pairs_zero_bits"] = pairs.where(
        (F.col("id_b") == F.concat(F.lit("zz-"), F.col("id_a")))
        & (F.col("bits_differ") == 0)
    ).count()
    out["pairing_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    kept = D.deduplicate(
        corpus.select("clip_id"), pairs.select("id_a", "id_b"), "clip_id")
    out["n_kept"] = kept.count()
    out["n_plants_surviving"] = kept.where(
        F.col("clip_id").startswith("zz-")).count()
    out["materialize_sec"] = round(time.monotonic() - t0, 1)

    ok = (out["n_fingerprinted"] == n + k
          and out["n_plant_pairs_zero_bits"] == k
          and out["n_plants_surviving"] == 0
          and out["n_kept"] <= n)
    out["ok"] = bool(ok)
    print(json.dumps(out))
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
