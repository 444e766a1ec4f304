"""Deterministic sf1-scale synthesis for scale-up evidence (round 4).

No sf1 testdata exists in the sandbox, and /root/testdata is read-only,
so this builds a 10x dataset at ``/root/repo/.scale/sf1`` FROM the
committed sf0.1 parquet — purely derived, seeded, reproducible; used
only for wall-time scaling evidence (BENCH "sf1" section), never as a
correctness input (the driver's own sf0.01 data stays the oracle gate).

Construction (chosen so per-replica similarity structure matches sf0.1
instead of creating artificial cross-replica duplicate explosions):

* documents: 10 replicas, doc_id += r*10_000_000; every whitespace token
  gets a per-replica suffix, so replicas share ZERO shingles — near-dup
  density per replica is exactly sf0.1's, corpus is 10x.
* lineitem:  10 replicas, l_orderkey += r*100_000_000 — duplicate-key
  structure repeats per replica (10x rows, same fault rate).
* events:    10 replicas, event_id/user_id offset per replica.
* embeddings: fresh seeded unit gaussians, 10x count (natural max
  cosine stays ~0.5 like the testdata; ANN queries plant their own
  copies, so derivation from sf0.1 vectors would only risk accidental
  near-dups).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SCALE_SRC_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SCALE_DST_DIR", "/root/repo/.scale/sf1")
REPLICAS = 10


def build(spark) -> str:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    marker = os.path.join(DST, "_done")
    if os.path.exists(marker):
        return DST

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    out = None
    for r in range(REPLICAS):
        suffixed = (
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * 10_000_000))
            .withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit(f"x{r}")),
                    ),
                    " ",
                ),
            )
            .withColumn("n_chars", F.length("text").cast("long"))
        )
        out = suffixed if out is None else out.unionByName(suffixed)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    out = None
    for r in range(REPLICAS):
        rep = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * 100_000_000))
        out = rep if out is None else out.unionByName(rep)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    out = None
    for r in range(REPLICAS):
        rep = ev.withColumn("event_id", F.col("event_id") + F.lit(r * 10_000_000)) \
                .withColumn("user_id", F.col("user_id") + F.lit(r * 10_000_000))
        out = rep if out is None else out.unionByName(rep)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/events.parquet")

    n_vec = spark.read.parquet(f"{SRC}/embeddings.parquet").count() * REPLICAS
    dim = len(
        spark.read.parquet(f"{SRC}/embeddings.parquet").first()["embedding"]
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                lo, hi = int(row["lo"]), int(row["hi"])
                rng = np.random.default_rng(90210 + lo)
                m = rng.standard_normal((hi - lo, dim)).astype(np.float32)
                m /= np.linalg.norm(m, axis=1, keepdims=True)
                yield pd.DataFrame(
                    {
                        "vec_id": np.arange(lo, hi, dtype=np.int64),
                        "embedding": list(m),
                        "label": (np.arange(lo, hi) % 16).astype(np.int32),
                    }
                )

    step = 2000
    ranges = spark.createDataFrame(
        [(i, min(i + step, n_vec)) for i in range(0, n_vec, step)], "lo long, hi long"
    ).repartition(32)
    ranges.mapInPandas(
        gen, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    # small dims pass through via symlink (oracle_check binds views for
    # every table; these queries aren't part of the scale-up evidence)
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        link = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)

    with open(marker, "w") as f:
        f.write("ok")
    return DST


if __name__ == "__main__":
    from mds_provider_spark.session import get_spark

    spark = get_spark(parallelism=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    build(spark)
    for t in ("documents", "lineitem", "events", "embeddings"):
        print(t, spark.read.parquet(f"{DST}/{t}.parquet").count())
    spark.stop()
