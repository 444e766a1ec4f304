"""Similarity search over embedding columns (array<float>).

Two paths, same contract:

  brute_force_topk : exact cosine top-k. Query side broadcast against the
                     corpus — each corpus partition scores its rows
                     against all queries locally, then a per-query top-k
                     merge. Linear in corpus size; the baseline.
  lsh_topk         : random-hyperplane (sign) LSH — corpus and queries
                     hashed to sign-bit buckets; only same-bucket pairs
                     scored. Approximate; recall grows with probes.
                     Bucket join shuffles (bucket, id, vector) — at 100 TB
                     corpus this is the path (bounded candidate sets per
                     query, no full scan per query).

Dot products run in Catalyst (`zip_with` + `aggregate`, codegen'd); no
Python in the scoring loop. Vectors are cast to double once so scores are
engine-reproducible (float accumulation order would not be).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine_sim), self excluded.

    Rank on the ROUNDED similarity with neighbor-id tiebreak so results
    are stable across engines and summation orders.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_cv")
    ).withColumn("_cn", l2norm(F.col("_cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv")
    ).withColumn("_qn", l2norm(F.col("_qv")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
                    round_digits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from n random hyperplanes (Charikar SRP-LSH)."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec_col, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 2024,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket pairs.

    With 8 planes the corpus splits into 256 buckets — at 10^9 vectors
    each bucket holds ~4M rows and the per-query candidate set drops by
    ~256x vs brute force. Recall is approximate by design; increase
    planes for smaller buckets or union several plane seeds for probes.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_cv")
    )
    c = c.withColumn("_bucket", lsh_signature(F.col("_cv"), planes)).withColumn(
        "_cn", l2norm(F.col("_cv"))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv")
    )
    q = q.withColumn("_bucket", lsh_signature(F.col("_qv"), planes)).withColumn(
        "_qn", l2norm(F.col("_qv"))
    )
    scored = (
        q.join(c, "_bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
                    round_digits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _kmeans_centroids(sample: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (the IVF
    coarse quantizer is always trained on a sample in practice)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(cent)):
            m = sample[assign == j]
            if len(m):
                cent[j] = m.mean(0)
    return cent


def _nearest_centroids_expr(vec: Column, cents: np.ndarray, nprobe: int) -> Column:
    """array of the nprobe nearest centroid ids (squared-L2), pure
    Catalyst: distances as an array of expressions, ranked via sort of
    (dist, id) structs."""
    dists = []
    for i, c in enumerate(cents):
        lit = F.array(*[F.lit(float(x)) for x in c])
        diff = F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b))
        d2 = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
        dists.append(F.struct(d2.alias("d"), F.lit(i).alias("cid")))
    ranked = F.array_sort(F.array(*dists))
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cid"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 3,
    train_sample: int = 2048,
    kmeans_iters: int = 8,
    seed: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Train a coarse quantizer (k-means on a driver sample — deterministic
    seed), assign each corpus vector to its nearest list (one Catalyst
    projection; centroids are plan literals, no shuffle), probe the
    ``nprobe`` nearest lists per query, score only same-list pairs.
    Candidate set per query ≈ nprobe/n_lists of the corpus — at 10^9
    vectors with 4096 lists and nprobe=8 that's a 512x scan reduction
    with the recall knob explicit (nprobe).
    """
    # deterministic training sample: ordered by id so centroids (and thus
    # results) are identical across runs and partitionings
    sample_rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(id_col)
        .limit(train_sample)
        .select(vec_col)
        .collect()
    )
    sample = np.asarray([list(r[0]) for r in sample_rows], dtype=np.float64)
    cents = _kmeans_centroids(sample, n_lists, kmeans_iters, seed)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_cv")
    )
    c = c.withColumn("_list", _nearest_centroids_expr(F.col("_cv"), cents, 1)[0])
    c = c.withColumn("_cn", l2norm(F.col("_cv")))

    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv"))
    q = q.withColumn(
        "_list", F.explode(_nearest_centroids_expr(F.col("_qv"), cents, nprobe))
    ).withColumn("_qn", l2norm(F.col("_qv")))

    scored = (
        q.join(c, "_list")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
                    round_digits).alias("cosine_sim"),
        )
        .distinct()  # a neighbor can appear via several probed lists
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 2024,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, sim >= threshold).

    LSH-bucketed: near-identical vectors collide in sign buckets with
    high probability, so the quadratic blowup stays within buckets.
    """
    dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    v = df.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("_v"))
    v = v.withColumn("_bucket", lsh_signature(F.col("_v"), planes)).withColumn(
        "_n", l2norm(F.col("_v"))
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, "_bucket")
        .where(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(
                dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n")), 6
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
        .distinct()
    )
