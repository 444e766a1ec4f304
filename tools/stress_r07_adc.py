"""Round-7 stress: the two-stage ADC shortlist under EXTREME list skew.

Manufactures the round-6 verdict's scale-killer scenario directly: a
corpus whose coarse quantizer puts ~50% of all vectors into ONE
inverted list (half the vectors cluster tightly around a single
centroid), queries that probe that list, and a bounded shortlist. With
the old single-window shortlist, every one of the hot list's candidates
for a query landed on ONE row_number task; with the two-stage prune the
stage-1 window runs per (input partition, query) and keeps <= shortlist
rows, so no task ever sees more than (partition rows) candidates.

Gates (ok=true required):
  * hot-list fraction actually >= 0.4 of the corpus (the skew is real);
  * planted exact copies of the queries are recovered at rank 1 with
    cosine 1.0 (correctness under skew);
  * wall time for the skewed search is reported, and the executed plan
    contains the two-stage shape (SPARK_PARTITION_ID window below the
    query_id window).

Usage: python tools/stress_r07_adc.py [corpus_n] [dim]

Committed run (round 7, this host — a degraded-bandwidth window, see
OPTIMIZATION_r07.md):
  {"corpus_n": 200000, "dim": 32, "hot_list_fraction": 0.5,
   "list_sizes_top3": [100000, 10299, 9806], "planted_rank1_ok": true,
   "two_stage_plan": true, "skewed_search_sec": 17.0, "ok": true}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from mds_provider_spark.session import get_spark
    from mds_provider_spark.operators import similarity as SIM
    from pyspark.sql import functions as F

    spark = get_spark("stress-r07-adc", parallelism=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    half = n // 2
    # hot cluster: half the corpus at ONE point (degenerate content —
    # the boilerplate-blob case). k-means may drop several centroids
    # into a merely-tight ball and split it; identical points all take
    # the argmin-first centroid, guaranteeing one ~50% list.
    hot = np.tile(np.full((1, dim), 5.0), (half, 1))
    cold = rng.standard_normal((n - half, dim))
    vecs = np.vstack([hot, cold])
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(64).persist()
    corpus.count()

    # queries: 20 exact copies of corpus vectors — 10 from the hot ball
    q_ids = list(range(0, 10)) + list(range(half, half + 10))
    queries = corpus.where(F.col("vec_id").isin(q_ids)).withColumn(
        "vec_id", F.col("vec_id") + F.lit(10_000_000)
    )

    spark.sparkContext.setJobDescription("stress-r07: skewed ivfpq_topk")
    t0 = time.monotonic()
    out = SIM.ivfpq_topk(
        corpus.unionByName(queries), queries, k=3, n_lists=16, nprobe=4,
        m=8, ksub=64, shortlist=64, train_sample=4096,
    )
    got = {r.query_id: (r.neighbor_id, r.cosine_sim)
           for r in out.where(F.col("rank") == 1).collect()}
    wall = time.monotonic() - t0

    plan = out._jdf.queryExecution().executedPlan().toString()
    two_stage = "SPARK_PARTITION_ID" in plan and plan.count("Window") >= 2

    # measure the actual list skew with the same trained quantizer
    cents = SIM.train_ivf_index(corpus, "vec_id", "embedding", 16, 4096, 8, 7)
    assign = SIM.pq_encode(
        corpus, cents,
        SIM.train_pq_codebooks(corpus, cents, "vec_id", "embedding", 8, 64,
                               4096, 8, 1007),
    ).groupBy("list").count().collect()
    sizes = sorted((int(r["count"]) for r in assign), reverse=True)
    hot_frac = sizes[0] / float(n)

    # hot-ball queries: every hot vector is identical, so the exact
    # re-rank's deterministic tie-break (cosine desc, neighbor_id asc)
    # must surface vec_id 0 at cosine 1.0; cold queries must surface
    # their own donor at 1.0.
    rank1_ok = all(
        got.get(qid + 10_000_000, (None, 0.0))
        == ((0 if qid < half else qid), 1.0)
        for qid in q_ids
    )
    res = {
        "corpus_n": n,
        "dim": dim,
        "hot_list_fraction": round(hot_frac, 4),
        "list_sizes_top3": sizes[:3],
        "planted_rank1_ok": rank1_ok,
        "two_stage_plan": two_stage,
        "skewed_search_sec": round(wall, 2),
        "ok": bool(rank1_ok and two_stage and hot_frac >= 0.4),
    }
    print(json.dumps(res))
    spark.stop()
    sys.exit(0 if res["ok"] else 1)


if __name__ == "__main__":
    main()
