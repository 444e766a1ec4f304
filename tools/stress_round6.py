"""Round-6 operator stress: paragraph-level exact dedup and IVF+PQ at
two-plus orders of magnitude past the oracle-gate fixtures, synthesized
deterministically in-executor.

Leg 1 — paragraph_dedup at n_docs (default 2M) documents x 3 paragraphs:
30% of docs carry a PLANTED shared boilerplate paragraph (one ~600k-copy
hot normalized key — exactly the skew case the min-struct-aggregate
winner exists for; a row_number window over `norm` would serialize that
key on one task). The result is a pure function of (n, seed): the plant
must survive in exactly ONE doc (min doc_id carrier), every per-doc
unique paragraph survives, and total kept = n_paras - (carriers - 1).

Leg 2 — IVF+PQ at n_vecs (default 200k) 64-dim vectors with K planted
near-copies of the query vectors: train coarse + PQ codebooks, encode
the corpus (distributed Arrow, single evaluation), run ivfpq_topk at a
scale configuration (nprobe < n_lists, bounded shortlist) for
n_queries, and require every planted copy to be retrieved at rank 1
(the copies are near-identical, so ADC cannot miss them and exact
re-rank must put them first — a deterministic recall-1 gate; the
statistical recall-vs-exact property is pinned at pytest scale).

Usage: python tools/stress_round6.py [n_docs] [n_vecs]
Prints one JSON line (wall seconds + counts + ok flags).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


BOILER = "click here to subscribe to our weekly newsletter and offers"


def paragraph_leg(spark, n_docs: int) -> dict:
    from mds_provider_spark.operators import text as TX

    t0 = time.monotonic()
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("unique lead paragraph "),
                F.md5(F.col("id").cast("string")),
                F.lit("\n\nbody paragraph "),
                F.md5((F.col("id") + 1).cast("string")),
                F.when(
                    F.col("id") % 10 < 3, F.lit("\n\n" + BOILER)
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        .repartition(64)
    )
    out = TX.paragraph_dedup(docs, "doc_id", "text")
    agg = out.agg(
        F.count(F.lit(1)).alias("docs_out"),
        F.sum("n_paras").alias("paras_in"),
        F.sum("n_kept").alias("paras_kept"),
    ).collect()[0]
    wall = round(time.monotonic() - t0, 1)
    carriers = sum(1 for i in range(n_docs) if i % 10 < 3)
    expect_in = 2 * n_docs + carriers
    expect_kept = 2 * n_docs + 1  # plant survives exactly once (doc 0)
    ok = (
        int(agg["docs_out"]) == n_docs
        and int(agg["paras_in"]) == expect_in
        and int(agg["paras_kept"]) == expect_kept
    )
    return {
        "n_docs": n_docs,
        "hot_key_copies": carriers,
        "paras_in": int(agg["paras_in"]),
        "paras_kept": int(agg["paras_kept"]),
        "expected_kept": expect_kept,
        "docs_per_sec": int(n_docs / wall),
        "wall_sec": wall,
        "ok": ok,
    }


def ivfpq_leg(spark, n_vecs: int, n_queries: int = 50) -> dict:
    import numpy as np

    from mds_provider_spark.operators import similarity as SIM

    dim, k = 64, 5
    t0 = time.monotonic()
    # deterministic corpus: 64 md5-derived uniforms per id, centered
    cols = [
        (
            (F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"),
                                               F.lit(f"_{j}"))), 1, 8),
                    16, 10).cast("double") / F.lit(float(16 ** 8)))
            - F.lit(0.5)
        ).cast("float")
        for j in range(dim)
    ]
    corpus = (
        spark.range(n_vecs)
        .select(F.col("id").alias("vec_id"), F.array(*cols).alias("embedding"))
        .repartition(64)
    )
    # plants: ids n..n+n_queries-1 are tiny perturbations of queries 0..n_queries-1
    plants = (
        spark.range(n_queries)
        .select((F.col("id") + n_vecs).alias("vec_id"),
                F.col("id").alias("_src"))
        .join(corpus.select(F.col("vec_id").alias("_src"), "embedding"), "_src")
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda x: (x + F.lit(1e-4)).cast("float")
            ).alias("embedding"),
        )
    )
    full = corpus.unionByName(plants)
    queries = full.where(F.col("vec_id") < n_queries)

    cents = SIM.train_ivf_index(full, n_lists=64, train_sample=4096)
    books = SIM.train_pq_codebooks(full, cents, m=8, ksub=256,
                                   train_sample=4096)
    t_train = round(time.monotonic() - t0, 1)

    t1 = time.monotonic()
    n_codes = SIM.pq_encode(full, cents, books).count()
    t_encode = round(time.monotonic() - t1, 1)

    t2 = time.monotonic()
    got = SIM.ivfpq_topk(
        full, queries, k=k, n_lists=64, nprobe=8, m=8, ksub=256,
        shortlist=64, centroids=cents, codebooks=books,
    ).collect()
    t_query = round(time.monotonic() - t2, 1)

    rank1 = {r.query_id: r.neighbor_id for r in got if r.rank == 1}
    plants_found = sum(
        1 for q in range(n_queries) if rank1.get(q) == q + n_vecs
    )
    ok = plants_found == n_queries and n_codes == n_vecs + n_queries
    return {
        "n_vecs": n_vecs + n_queries,
        "n_queries": n_queries,
        "encode_vecs_per_sec": int((n_vecs + n_queries) / t_encode),
        "train_sec": t_train,
        "encode_sec": t_encode,
        "query_sec": t_query,
        "plants_rank1": plants_found,
        "ok": ok,
    }


def embedding_drift_leg(spark, n_vecs: int) -> dict:
    """Leg 3 — embedding_drift at n_vecs (default 2M) 64-dim vectors in
    10 groups (2 x n x 64 = ~256M exploded rows through the partial
    aggregate — the shuffle after it carries only groups x dim x
    partitions rows, which is the property under test). Current = the
    id%3==0 third (hits every group) with group 3 shifted +0.5 on the
    FIRST 32 dimensions only (a flat shift would not rotate the nearly
    flat centroid — cosine stays 1.0; the half-space shift moves AND
    rotates it). The gate is analytic: group 3's displacement must be
    ~0.5*sqrt(32) = 2.828 and its cosine the strict minimum, while
    every untouched group stays near 0 (two deterministic subsets of
    the same pattern)."""
    from mds_provider_spark.operators import drift as DR

    t0 = time.monotonic()
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda p: ((F.col("id") * 31 + p * 17) % 997).cast("double") / 997.0,
    )
    base = spark.range(n_vecs).select(
        F.col("id"), (F.col("id") % 10).alias("grp"), emb.alias("embedding")
    )
    cur = base.where("id % 3 = 0").withColumn(
        "embedding",
        F.when(
            F.col("grp") == 3,
            F.transform(
                "embedding",
                lambda x, i: x + F.when(i < 32, F.lit(0.5)).otherwise(F.lit(0.0)),
            ),
        ).otherwise(F.col("embedding")),
    ).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    rows = {r.group_value: r for r in DR.embedding_drift(
        cur, base, group_col="grp", dim=64
    ).collect()}
    sec = time.monotonic() - t0
    shifted = rows["3"]
    others = [r for g, r in rows.items() if g != "3"]
    ok = (
        len(rows) == 10
        and abs(shifted.centroid_shift_l2 - 0.5 * 32 ** 0.5) < 0.05
        and all(r.centroid_shift_l2 < 0.1 for r in others)
        and shifted.centroid_cosine < min(r.centroid_cosine for r in others)
        and sum(r.n_base for r in rows.values()) == n_vecs
    )
    return {
        "sec": round(sec, 1),
        "n_vectors": n_vecs,
        "rows_per_sec": int(2 * n_vecs / sec),
        "shifted_l2": shifted.centroid_shift_l2,
        "max_other_l2": max(r.centroid_shift_l2 for r in others),
        "ok": ok,
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from mds_provider_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("stress-r6", parallelism=cpus,
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    n_drift = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
    out = {
        "paragraph_dedup": paragraph_leg(spark, n_docs),
        "ivfpq": ivfpq_leg(spark, n_vecs),
        "embedding_drift": embedding_drift_leg(spark, n_drift),
    }
    out["ok"] = (out["paragraph_dedup"]["ok"] and out["ivfpq"]["ok"]
                 and out["embedding_drift"]["ok"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
