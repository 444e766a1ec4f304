"""Deduplication operators for training-data pipelines.

All candidate generation is JVM-side (xxhash64 + higher-order array
functions inside whole-stage codegen); Python never touches row data.
Shapes:

  exact        : hash-groupBy on a normalized-content digest. One shuffle
                 of (digest, id) pairs only.
  minhash LSH  : shingle -> k minhashes -> band buckets -> self-join on
                 (band, bucket) -> exact-Jaccard verify. The self-join
                 shuffles only (band_hash, id, signature) rows — never
                 documents; at 100 TB the band table is ~bands x n rows of
                 ~50 bytes. Candidate verification re-joins the (small)
                 candidate set to the shingle-hash arrays.
  simhash      : 64-bit signature; Hamming<=d candidates via the
                 pigeonhole split into d+1 chunks (equal-chunk self-join),
                 verified with bit_count(xor).
  ngram Jaccard: exact all-pairs version for small candidate universes /
                 oracle checking (quadratic — the LSH paths are the scale
                 story; this one is the ground truth they are tested
                 against).

References: Broder, "On the resemblance and containment of documents"
(1997); Charikar, "Similarity estimation techniques from rounding
algorithms" (2002) — public papers; implementations from scratch.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, functions as F

# Mersenne prime 2^31-1 for minhash permutations. Shingle hashes are
# first folded into [0, 2^31) so a*h+b stays < 2^63 — ANSI mode (Spark 4
# default) makes long overflow an ERROR, so the arithmetic must genuinely
# fit rather than rely on wrap-around.
_PRIME = (1 << 31) - 1


# ------------------------------------------------------------- normalize


def norm_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace — the canonical content form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    return F.filter(F.split(norm_text(col), " "), lambda x: x != "")


def shingles(col: Column | str, w: int = 3) -> Column:
    """Word w-gram shingles; documents shorter than w words get one
    whole-document shingle so they can still exact-duplicate-match."""
    t = tokens(col)
    n = F.size(t)
    idx = F.sequence(F.lit(1), n - F.lit(w - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, w)))
    return F.when(n >= w, grams).otherwise(F.array(F.concat_ws(" ", t)))


def shingle_hashes(col: Column | str, w: int = 3) -> Column:
    """Distinct xxhash64 of shingles — the document's feature set."""
    return F.array_distinct(F.transform(shingles(col, w), lambda s: F.xxhash64(s)))


# ----------------------------------------------------------- exact dedup


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents.

    Returns (content_hash, n_rows, doc_ids array, exemplar_id) for groups
    with n_rows > 1. Exemplar = min id (deterministic keep-one policy).
    """
    h = F.md5(norm_text(text_col)).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
            F.min(id_col).alias("exemplar_id"),
        )
        .where(F.col("n_rows") > 1)
    )


# ------------------------------------------------------------ minhash/LSH


def _perm_coeffs(n_hashes: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, _PRIME), rng.randrange(0, _PRIME)) for _ in range(n_hashes)]


def minhash_signature_from_hashes(hs_col: Column, n_hashes: int, seed: int) -> Column:
    """array<bigint> of n minhashes over a MATERIALIZED hash-array column.

    The input must be a plain column reference (not an expression): each
    permutation references it, and Catalyst duplicates non-column
    subexpressions per reference — with n=64 that made the shingle
    pipeline run 64x (measured: 57s -> <2s after splitting the
    projection). Callers materialize the hash array in a prior select.

    ONE ``aggregate`` fold instead of n unrolled
    ``array_min(transform(...))`` loops: the permutation coefficients
    live in a single literal struct array and the fold updates all n
    running minima per element (``least`` over integers — associative,
    commutative, exact, so the result is bit-identical to the per-
    permutation array_min for any non-empty hash array; shingle_hashes
    never yields an empty array — short/empty docs get one whole-doc
    shingle). The unrolled form generated n separate codegen loops whose
    Janino compile dominated the query's first execution (measured ~4 s
    compile at n=64); this form is one small nested loop.
    """
    coeffs = _perm_coeffs(n_hashes, seed)
    ab = F.array(
        *[F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in coeffs]
    )
    return F.aggregate(
        hs_col,
        F.array_repeat(F.lit(_PRIME).cast("bigint"), n_hashes),
        lambda acc, h: F.zip_with(
            acc, ab, lambda m, c: F.least(m, F.pmod(c["a"] * h + c["b"], F.lit(_PRIME)))
        ),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    w: int = 3,
    seed: int = 1337,
) -> DataFrame:
    """(_id, _sig array<bigint>): two projections — shingle hashes
    materialized once, then n permutation-mins over the bound column."""
    hashed = df.select(
        F.col(id_col).alias("_id"),
        F.transform(shingle_hashes(text_col, w), lambda h: F.pmod(h, F.lit(1 << 31))).alias("_hs"),
    )
    return hashed.select(
        "_id", minhash_signature_from_hashes(F.col("_hs"), n_hashes, seed).alias("_sig")
    )


def _cap_buckets(band_rows: DataFrame, keys: list[str], max_bucket_size: int | None) -> DataFrame:
    """Web-scale guard: drop degenerate buckets before the self-join.

    A bucket of size s contributes s^2 candidate pairs — one
    boilerplate-heavy bucket of 10^6 docs is 10^12 pairs. Buckets larger
    than the cap are almost always shingle-degenerate (empty docs,
    templates); their members still pair up through their OTHER bands,
    so recall loss is confined to pathological content.

    Scale note: we broadcast the HOT set (buckets > cap) and anti-join.
    Each hot key accounts for >cap rows, so the hot set is bounded by
    corpus*bands/cap keys — and in any real corpus far smaller (hot
    buckets are degenerate content; typical hot fractions are <<1%).
    The keep set, by contrast, is O(#distinct buckets) ~ O(corpus x
    bands) — broadcasting THAT was the guaranteed OOM at the 10^12-row
    design point (round-2 verdict item 1). The broadcast hint is
    deliberate: the hot side comes out of an aggregation whose static
    size estimate would otherwise force a sort-merge pass over the full
    band table. The only input that breaks the hint is one where >~40%
    of ALL band rows sit in over-cap buckets (~10^9 hot keys at 10^12
    rows / cap 10^4) — a corpus that needs exact dedup before LSH is
    even meaningful.
    """
    if max_bucket_size is None:
        return band_rows
    sizes = band_rows.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bsz"))
    hot = sizes.where(F.col("_bsz") > max_bucket_size).select(*keys)
    return band_rows.join(F.broadcast(hot), keys, "left_anti")


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    w: int = 3,
    seed: int = 1337,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded minhash (id_a < id_b).

    ``max_bucket_size`` bounds the per-bucket quadratic blowup (see
    _cap_buckets); None disables the guard.
    """
    assert n_hashes % bands == 0
    r = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, w, seed)
    band_rows = sig.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(",", F.slice("_sig", b * r + 1, r)), b).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    # Persist the band table: the plan references it THREE times (the
    # bucket-size aggregation inside _cap_buckets and both self-join
    # sides), and each reference would otherwise re-run the whole
    # shingle -> 64-permutation signature pipeline over the corpus —
    # measured as three full signature passes at sf0.1 (the
    # fingerprint_near_dup persist_fps rationale). The band table is
    # (id, band, bucket) ~ 24 bytes x bands per document — far narrower
    # than the text it derives from; MEMORY_AND_DISK spills instead of
    # evicting at scale.
    from pyspark import StorageLevel

    band_rows = band_rows.persist(StorageLevel.MEMORY_AND_DISK)
    band_rows = _cap_buckets(band_rows, ["band", "bucket"], max_bucket_size)
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_hashes: int = 64,
    bands: int = 16,
    w: int = 3,
    seed: int = 1337,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """LSH candidates verified with EXACT Jaccard over shingle-hash sets.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    The verify join touches only candidate ids — broadcast when small.
    """
    from pyspark import StorageLevel

    cands = minhash_lsh_candidates(
        df, id_col, text_col, n_hashes, bands, w, seed, max_bucket_size
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # ^ the candidate set is referenced three times below (both arms of
    # the candidate-id union and the verify join); unpersisted, each
    # reference re-runs the banded self-join. Candidate-proportional
    # rows only — the same bound the verify join relies on.
    # Compute shingle features ONLY for rows that appear in a candidate
    # pair (semi-join first): feature cost is proportional to the
    # candidate set, not the corpus — without this, each side of the
    # verify join re-shingled the full table (measured 2 extra full
    # passes at sf0.1; at 100 TB it would dominate the whole job).
    # No forced broadcast: on dup-heavy corpora the candidate-id set is
    # unbounded; AQE/autoBroadcastJoinThreshold picks the strategy.
    cand_ids = (
        cands.select(F.col("id_a").alias(id_col))
        .unionByName(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    feats = (
        df.join(cand_ids, id_col, "left_semi")
        .select(F.col(id_col).alias("_fid"), shingle_hashes(text_col, w).alias("_feat"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        # ^ both verify-join sides read the feature table; unpersisted,
        # the semi-join + shingling of candidate documents runs twice.
    )
    ja = (
        cands.join(feats.withColumnRenamed("_fid", "id_a"), "id_a")
        .withColumnRenamed("_feat", "_fa")
        .join(
            feats.withColumnRenamed("_fid", "id_b").withColumnRenamed("_feat", "_fb"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_fa", "_fb"))
            / F.size(F.array_union("_fa", "_fb")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return ja


# --------------------------------------------------------------- simhash


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Charikar 64-bit simhash over token xxhash64s, pure Catalyst.

    Two projections (no shuffle): (1) one ``aggregate`` over the token
    array accumulating a 64-long vote vector — per bit, the count of
    tokens with that bit set (``getbit`` over a sequence: one codegen
    loop, measured ~1.5x faster than 64 unrolled shiftrights); (2) pack
    ``2*ones > n`` majority bits into one bigint with 64 chained
    ``when``s over the BOUND ``_votes`` column.

    The pack is DELIBERATELY lambda-free: higher-order functions are
    excluded from Spark's subexpression elimination, so a lambda-based
    pack lets CollapseProject inline the whole votes aggregate into
    every downstream reference of ``_sh`` — measured 10x slower
    (101s vs 6.8s at sf0.1) inside simhash_dedup's self-join, where
    ``_sh`` is referenced once per chunk key.
    Returns (_id, _sh) — bit-identical across both formulations.
    """
    th = F.transform(tokens(text_col), lambda t: F.xxhash64(t))
    bit_idx = F.sequence(F.lit(0), F.lit(63))

    def bits_of(h: Column) -> Column:
        # getbit(h, i) == (h >> i) & 1 on the two's-complement value
        return F.transform(bit_idx, lambda i: F.getbit(h, i).cast("long"))

    votes = F.aggregate(
        th,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(acc, bits_of(h), lambda a, b: a + b),
    )
    step = df.select(
        F.col(id_col).alias("_id"), F.size(th).alias("_n"), votes.alias("_votes")
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.col("_votes")[i] * 2 > F.col("_n"),
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
        )
    return step.select("_id", sig.alias("_sh"))


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Pigeonhole banding: split 64 bits into (max_hamming+1) chunks; any
    pair within distance d agrees on >=1 chunk, so an equal-chunk
    self-join finds all true pairs; verify with bit_count(xor).
    ``max_bucket_size`` caps degenerate chunk buckets (see _cap_buckets).
    """
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    sig = simhash_signatures(df, id_col, text_col)
    chunk_rows = sig.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("_sh"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("_id", "_sh", "ck.chunk", "ck.key")
    # Same three-reference pattern as the minhash band table (cap
    # aggregation + both self-join sides): persist so the token-hash ->
    # 64-bit-vote signature pipeline runs ONCE per corpus instead of
    # three times. (id, sh, chunk, key) is ~32 bytes x (d+1) per doc.
    from pyspark import StorageLevel

    chunk_rows = chunk_rows.persist(StorageLevel.MEMORY_AND_DISK)
    chunk_rows = _cap_buckets(chunk_rows, ["chunk", "key"], max_bucket_size)
    a, b = chunk_rows.alias("a"), chunk_rows.alias("b")
    return (
        a.join(b, ["chunk", "key"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------- duplicate-group resolution


def resolve_duplicate_groups(
    pairs: DataFrame,
    max_iters: int = 40,
    reliable_checkpoint_dir: str | None = None,
    reliable_every: int = 4,
    local_threshold: int = 100_000,
) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, group_id).

    group_id = min id reachable through the pair graph (a chain a~b,
    b~c collapses to group a even if (a, c) was never emitted).

    Algorithm: alternating LARGE-STAR / SMALL-STAR edge contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014 — public). Each round rewrites the EDGE SET itself:
    large-star hangs every higher neighbor of u onto min(N(u) ∪ u),
    small-star re-points u and its lower neighbors at their minimum.
    Components contract geometrically until each is a star rooted at
    its minimum id; termination is the exact structural test "the edge
    set is a star forest": no child is also a root AND every child has
    exactly one edge. (The first half alone is NOT sufficient — a child
    can point at two distinct roots while children ∩ roots = ∅; see the
    loop body for the measured counterexample.) Not an estimate.

    WHY edge contraction and not min-label propagation: the previous
    implementation (pull min neighbor label + one pointer-doubling hop
    per round) is O(log d) on paths but degrades toward O(d) on dense
    blob graphs where the label forest keeps reforming — measured on a
    real corpus: a 200k-clip near-dup graph (1.9M pairs, parameter-space
    blob components) was still churning labels after 40 rounds while
    the component count had been stable since round 20. Star
    contraction converged the same graph in a handful of rounds, and
    the edge table SHRINKS every round (a star forest has one edge per
    non-root node), so per-round cost falls as it converges. Rounds are
    O(log^2 n) worst-case, ~10 in practice; ``max_iters=40`` is a
    safety bound, and the loop exits the moment the star test passes.

    Non-convergence is LOUD: if the bound is exhausted before the edge
    set is a star forest the function raises instead of returning
    partially-merged groups — a silent under-merge would let keep-one
    retain extra "exemplars" with no signal (round-4 fix).

    Edge tables are O(pairs), never O(corpus): only ids that appear in
    a pair get a row; everything else is its own group by definition.

    Spark 4.x stats footgun (measured, fixed here): Dataset.checkpoint
    propagates the pre-checkpoint plan's ESTIMATED statistics onto the
    new LogicalRDD (LogicalRDD$.rewriteStatsAndConstraints), and join
    size estimates are PRODUCTS of child sizeInBytes — so an iterative
    checkpoint-per-round algorithm compounds the estimate, doubling its
    BigInt bit length every round (measured 38 -> 2364 bits in 7 toy
    rounds) until java.math.BigInteger overflows its 2^31-bit cap
    ("BigInteger would overflow supported range" from
    SizeInBytesOnlyStatsPlanVisitor, ~round 25 on the 1.9M-pair graph)
    — and poisons broadcast decisions long before that. Every round
    therefore rebuilds its DataFrame over the checkpointed RDD
    (internalCreateDataFrame over queryExecution().toRdd()), which
    keeps the lineage cut but resets stats to defaults; AQE re-plans
    from RUNTIME sizes anyway.

    Fault tolerance vs plan hygiene (SCALE.md §Dedup): each round cuts
    lineage with ``localCheckpoint`` — executor-LOCAL, non-replicated
    blocks, so on a real cluster an executor loss mid-resolve kills the
    job instead of recomputing. Right default here (the analyzer
    blow-up it prevents is measured, and a dedup resolve is cheap to
    rerun), but for 10^12-row pair graphs pass
    ``reliable_checkpoint_dir`` (a cluster-visible path, e.g. HDFS/S3).
    In that mode ``localCheckpoint`` never runs: every
    ``reliable_every``-th round cuts lineage with a RELIABLE
    ``checkpoint()`` to that directory, and the rounds BETWEEN cuts
    keep their lineage INTACT (``persist()`` there is only a cost
    cache, not a recovery point), so an executor loss recomputes at
    most ``reliable_every - 1`` rounds from the last durable
    checkpoint. Files of a superseded checkpoint are swept best-effort
    once the next one lands; the FINAL checkpoint's files back the
    returned DataFrame — the caller owns the directory and deletes it
    after consuming the result.
    """
    sc = pairs.sparkSession.sparkContext
    if reliable_checkpoint_dir is not None:
        sc.setCheckpointDir(reliable_checkpoint_dir)
    rounds_done = [0]
    _reliable = {"seen": set(), "prev": set(), "warned": False}

    def _sweep_superseded() -> None:
        """After a new reliable checkpoint materializes, nothing
        references the PREVIOUS one (every live plan roots at the new
        cut or later) — delete its rdd-* files so a long resolve holds
        at most two checkpoints of FS footprint."""
        import os
        import shutil

        try:
            base = sc.getCheckpointDir()
            if not base:
                return
            if base.startswith("file:"):
                # getCheckpointDir returns a Hadoop URI; os needs a path
                from urllib.parse import urlparse

                base = urlparse(base).path
            current = {d for d in os.listdir(base) if d.startswith("rdd-")}
            for d in _reliable["prev"]:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
            _reliable["prev"] = current - _reliable["seen"]
            _reliable["seen"] = current
        except Exception as exc:  # noqa: BLE001 — e.g. non-POSIX object store
            if not _reliable["warned"]:
                _reliable["warned"] = True
                import logging

                logging.getLogger(__name__).warning(
                    "resolve_duplicate_groups: superseded-checkpoint sweep "
                    "failed (%s: %s) — checkpoint files will accumulate for "
                    "the duration of the resolve; rely on the checkpoint "
                    "directory's own lifecycle",
                    type(exc).__name__, exc,
                )

    def rebuild_from_checkpoint(ck: DataFrame) -> DataFrame:
        """Fresh LogicalRDD over the checkpointed RDD — lineage stays
        cut, inherited stats estimate is DROPPED (see docstring)."""
        sess = ck.sparkSession
        jdf = sess._jsparkSession.internalCreateDataFrame(
            ck._jdf.queryExecution().toRdd(), ck._jdf.schema(), False)
        return DataFrame(jdf, sess)

    free_blocks_warned = [False]

    def free_blocks(df: DataFrame) -> None:
        """Release a checkpointed round's blocks NOW instead of waiting
        for JVM GC + ContextCleaner. The checkpoint RDD has no public
        Python handle (``df.rdd`` wraps a DIFFERENT conversion RDD), so
        this reaches the LogicalRDD via py4j; if a Spark version changes
        the analyzed-plan shape the failure is LOGGED once — block
        buildup stays observable instead of silently returning."""
        try:
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception as exc:  # noqa: BLE001 — best-effort, but loud once
            if not free_blocks_warned[0]:
                free_blocks_warned[0] = True
                import logging

                logging.getLogger(__name__).warning(
                    "resolve_duplicate_groups: eager release of a round's "
                    "localCheckpoint blocks failed (%s: %s) — falling back "
                    "to JVM GC/ContextCleaner; expect block-manager growth "
                    "across rounds on this Spark version",
                    type(exc).__name__,
                    exc,
                )

    def release(handle: DataFrame) -> None:
        if reliable_checkpoint_dir is not None:
            handle.unpersist()
        else:
            free_blocks(handle)

    def cut(df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Materialize a round's edge set and cut lineage. Returns
        (usable DataFrame, storage handle for release())."""
        rounds_done[0] += 1
        if reliable_checkpoint_dir is not None:
            if rounds_done[0] % reliable_every == 0:
                handle = df.checkpoint(eager=True)
                _sweep_superseded()
                return rebuild_from_checkpoint(handle), handle
            handle = df.persist()
            return handle, handle
        handle = df.localCheckpoint(eager=True)
        return rebuild_from_checkpoint(handle), handle

    def canon(df: DataFrame) -> DataFrame:
        """Canonical undirected edges: (a=greater, b=smaller), no self
        loops, distinct."""
        return (
            df.where(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
            )
            .distinct()
        )

    def large_star(e: DataFrame) -> DataFrame:
        """For every node u: hang each HIGHER neighbor v onto
        m = min(N(u) ∪ {u}). Strictly decreases component height."""
        nb = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m = nb.groupBy("u").agg(F.min("v").alias("_mn")).select(
            "u", F.least("u", "_mn").alias("_m")
        )
        out = (
            nb.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("_m").alias("b"))
        )
        return canon(out)

    def small_star(e: DataFrame) -> DataFrame:
        """For every node u: re-point u and ALL its lower neighbors at
        m = min of the lower neighborhood. Flattens local minima into
        stars. Canonical edges already have a > b, so the lower
        neighborhood of a is exactly its b-side."""
        m = e.groupBy("a").agg(F.min("b").alias("_m"))
        out = (
            e.join(m, "a")
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .unionByName(m.select(F.col("a"), F.col("_m").alias("b")))
        )
        return canon(out)

    def is_star_forest(e: DataFrame) -> bool:
        """Exact structural termination: the edge set is a star forest
        iff (i) no child (a-side) ever appears as a root (b-side) AND
        (ii) no child carries edges to two roots. (i) alone is NOT
        sufficient: on pairs {1-3, 3-4, 4-5, 2-5} one round yields
        {(3,1),(4,1),(3,2),(5,2)} — children ∩ roots = ∅, yet child 3
        points at roots 1 AND 2; stopping there splits one component
        into two groups and keep-one silently under-merges
        (regression: tests/test_pipeline_ops.py bridge-graph case).
        Both conditions in ONE aggregation job over the (shrinking)
        edge set: per node, child-degree and a root flag."""
        nodes = e.select(
            F.col("a").alias("n"),
            F.lit(1).alias("_c"),
            F.lit(0).alias("_r"),
        ).unionByName(
            e.select(
                F.col("b").alias("n"),
                F.lit(0).alias("_c"),
                F.lit(1).alias("_r"),
            )
        )
        non_star = (
            nodes.groupBy("n")
            .agg(F.sum("_c").alias("_c"), F.max("_r").alias("_r"))
            .where(
                (F.col("_c") > 1)
                | ((F.col("_c") >= 1) & (F.col("_r") == 1))
            )
            .limit(1)
            .count()
        )
        return non_star == 0

    edges = canon(
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    edges, handle = cut(edges)
    # Hybrid cutoff (the quicksort-insertion-sort discipline): below
    # ``local_threshold`` edges the distributed contraction's per-round
    # fixed cost (a checkpoint materialization + four shuffles + a
    # termination-test job, times O(log^2) rounds) dominates by orders
    # of magnitude, so solve the graph with a driver-side union-find
    # instead — ONE bounded collect (<= threshold edges, ~5 MB at the
    # default) replacing every round. The mapping is identical by
    # construction: union-by-min-id root gives group_id = min reachable
    # id, the same fixpoint the star contraction converges to (string
    # comparison agrees between Python and Spark — UTF-8 byte order
    # preserves code-point order). The count is a metadata-cheap job
    # over the just-checkpointed edge set; graphs over the threshold
    # take the unchanged distributed path, so the 100 TB story is
    # untouched.
    n_edges = edges.count()
    if n_edges <= local_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        rows = edges.collect()
        for row in rows:
            a, b = row[0], row[1]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
        out = [(x, find(x)) for x in parent]
        release(handle)
        id_type = edges.schema["a"].dataType
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField("doc_id", id_type, True),
                StructField("group_id", id_type, True),
            ]
        )
        return pairs.sparkSession.createDataFrame(out, schema)
    prev_handle: DataFrame | None = handle
    converged = False
    # Test-BEFORE-contract: the canonical input edge set of a dedup
    # corpus is very often already a star forest (disjoint duplicate
    # pairs — e.g. planted copies, or singleton near-dup groups), and
    # each contraction round costs a checkpoint materialization plus
    # four shuffles. Checking first skips the whole contraction loop in
    # that case at the price of one aggregation job — the SAME job the
    # per-round termination test already paid. Graphs that do need
    # contraction run exactly the rounds they ran before (the test is
    # the unchanged exact structural condition, so the returned mapping
    # is identical).
    for it in range(max_iters + 1):
        if is_star_forest(edges):
            converged = True
            break
        if it == max_iters:
            break
        new_edges, h1 = cut(small_star(large_star(edges)))
        release(prev_handle)
        prev_handle, edges = h1, new_edges
    if not converged:
        raise RuntimeError(
            f"resolve_duplicate_groups did not converge in {max_iters} "
            "rounds (large-star/small-star contraction still finds "
            "non-star structure); raise max_iters — returning "
            "partially-merged groups would silently under-deduplicate"
        )
    # star forest: (child, root) edges with root = component min; roots
    # map to themselves. The final handle's storage backs the result.
    return edges.select(
        F.col("a").alias("doc_id"), F.col("b").alias("group_id")
    ).unionByName(
        edges.select("b").distinct().select(
            F.col("b").alias("doc_id"), F.col("b").alias("group_id")
        )
    )


def deduplicate(
    df: DataFrame, pairs: DataFrame, id_col: str, max_iters: int = 40
) -> DataFrame:
    """Keep-one materializer: drop every near-duplicate except the
    minimum-id exemplar of its connected group. Rows never seen in a
    pair pass through untouched (anti-join against the drop set).

    The drop set is NOT broadcast-hinted: on dedup-heavy corpora (the
    whole point of the operator) it is a constant fraction of the
    corpus — tens of billions of ids at 10^12 rows. AQE's size-based
    planning picks broadcast when it genuinely fits and a shuffled
    anti-join otherwise (see SCALE.md §Dedup)."""
    groups = resolve_duplicate_groups(pairs, max_iters)
    drop = groups.where(F.col("doc_id") != F.col("group_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


# ------------------------------------------------- exact n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.2,
    distinct_tokens: bool = True,
) -> DataFrame:
    """ALL-pairs token-set Jaccard (quadratic; ground truth / oracle path).

    Self cross-join pruned by id ordering. Use only on bounded inputs —
    the LSH operators above are the 100 TB path; this one validates them.
    """
    feat = tokens(text_col)
    if distinct_tokens:
        feat = F.array_distinct(feat)
    t = df.select(F.col(id_col).alias("_id"), feat.alias("_t"))
    a, b = t.alias("a"), t.alias("b")
    return (
        a.crossJoin(b)
        .where(F.col("a._id") < F.col("b._id"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("a._t", "b._t"))
            / F.size(F.array_union("a._t", "b._t")),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
