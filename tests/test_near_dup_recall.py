"""Recall of the banded multi-table SRP-LSH near-dup path vs brute force.

Seeded clusters of perturbed vectors give known ground-truth pairs; the
LSH output must find >=90% of them while every emitted pair must also be
a true pair (the exact-cosine verify forbids false positives).
"""

import numpy as np
import pyspark.sql.functions as F

from mds_provider_spark.operators import similarity as SIM

THRESHOLD = 0.9


def _clustered(spark, n_clusters=40, per_cluster=3, dim=16, seed=11):
    """Clusters of near-identical vectors (pairwise cosine ~0.97+) plus
    background noise vectors far from everything."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + 0.05 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(200):
        v = rng.standard_normal(dim)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _true_pairs(df):
    """Exact ground truth via bounded crossJoin."""
    a = df.select(F.col("vec_id").alias("id_a"), SIM.as_double("embedding").alias("_a"))
    b = df.select(F.col("vec_id").alias("id_b"), SIM.as_double("embedding").alias("_b"))
    sim = SIM.dot(F.col("_a"), F.col("_b")) / (
        SIM.l2norm(F.col("_a")) * SIM.l2norm(F.col("_b"))
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(sim, 6) >= THRESHOLD)
        .select("id_a", "id_b")
    )


def test_near_dup_recall_and_precision(spark):
    df = _clustered(spark)
    truth = {(r.id_a, r.id_b) for r in _true_pairs(df).collect()}
    assert len(truth) >= 30  # the fixture actually contains near-dups
    got = {
        (r.id_a, r.id_b)
        for r in SIM.embedding_near_duplicates(df, threshold=THRESHOLD).collect()
    }
    # no false positives, ever (exact verify)
    assert got <= truth
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(truth)} true pairs"


def test_near_dup_bucket_cap_bounds_join(spark):
    """A degenerate corpus (all-identical vectors) must not blow up: with
    a cap of 5 the within-bucket join is bounded and returns few pairs,
    while uncapped it would be quadratic."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = SIM.embedding_near_duplicates(
        df, threshold=0.9, n_planes=4, n_tables=2, max_bucket_size=5
    )
    # every bucket (one per table) exceeds the cap -> dropped entirely
    assert got.count() == 0


def test_lsh_topk_multi_table_finds_planted_neighbor(spark):
    df = _clustered(spark, n_clusters=10, per_cluster=2, dim=16, seed=5)
    q = df.where("vec_id = 0")
    got = SIM.lsh_topk(df, q, k=3).collect()
    assert any(r.neighbor_id == 1 for r in got)  # its cluster twin
