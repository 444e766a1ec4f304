"""Partition-delta incremental validation."""
from pyspark.sql import functions as F

from mds_provider_spark.operators import incremental as INC

COLS = ["k", "v"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "part int, k long, v string")


def test_delta_statuses(spark):
    base = _df(spark, [(0, 1, "a"), (0, 2, "b"), (1, 3, "c"), (2, 4, "d")])
    cur = _df(spark, [(0, 1, "a"), (0, 2, "b"),          # unchanged
                      (1, 3, "CHANGED"),                 # changed
                      (3, 9, "new")])                    # added; part 2 removed
    d = {r.part: r.status for r in INC.partition_delta(
        INC.partition_fingerprints(cur, "part", COLS),
        INC.partition_fingerprints(base, "part", COLS)).collect()}
    assert d == {0: "unchanged", 1: "changed", 2: "removed", 3: "added"}


def test_legacy_manifest_without_fingerprint2_degrades_to_changed(spark):
    """A manifest persisted by the pre-round-6 single-fold code has no
    fingerprint2 column. The delta must not raise — it treats fp2_base
    as NULL, the equality falls through, and every surviving partition
    reports 'changed' (one safe full revalidation, after which the
    rewritten manifest carries both folds). Round-6 advice."""
    data = _df(spark, [(0, 1, "a"), (1, 2, "b")])
    cur = INC.partition_fingerprints(data, "part", COLS)
    legacy = cur.drop("fingerprint2")
    d = {r.part: r.status for r in INC.partition_delta(cur, legacy).collect()}
    assert d == {0: "changed", 1: "changed"}


def test_row_count_change_detected_even_when_xor_cancels(spark):
    """Two identical copies of a row xor to zero — the n_rows guard
    still flags the partition as changed."""
    base = _df(spark, [(0, 1, "a")])
    cur = _df(spark, [(0, 1, "a"), (0, 1, "a"), (0, 1, "a")])
    d = INC.partition_delta(
        INC.partition_fingerprints(cur, "part", COLS),
        INC.partition_fingerprints(base, "part", COLS)).collect()
    assert d[0].status == "changed"


def test_even_multiplicity_swap_detected_by_second_fold(spark):
    """The xor fold's documented blind spot: swap 2 copies of row B for
    2 more copies of row A — xor cancels (x ⊕ x = 0 on both sides) AND
    n_rows is unchanged, so before the additive second fold this
    partition read 'unchanged'. fingerprint2 counts multiplicity and
    must flip it to 'changed'."""
    base = _df(spark, [(0, 1, "a"), (0, 1, "a"), (0, 2, "b"), (0, 2, "b")])
    cur = _df(spark, [(0, 1, "a")] * 4)
    fb = INC.partition_fingerprints(base, "part", COLS).collect()[0]
    fc = INC.partition_fingerprints(cur, "part", COLS).collect()[0]
    # pin that this IS the xor blind spot (otherwise the test is vacuous)
    assert fb.fingerprint == fc.fingerprint and fb.n_rows == fc.n_rows
    assert fb.fingerprint2 != fc.fingerprint2
    d = INC.partition_delta(
        INC.partition_fingerprints(cur, "part", COLS),
        INC.partition_fingerprints(base, "part", COLS)).collect()
    assert d[0].status == "changed"


def test_reorder_is_unchanged(spark):
    """Fingerprints are order-insensitive: compaction/shuffle of the
    same row multiset must not trigger revalidation."""
    base = _df(spark, [(0, 1, "a"), (0, 2, "b"), (0, 3, "c")])
    cur = _df(spark, [(0, 3, "c"), (0, 1, "a"), (0, 2, "b")]).repartition(3)
    d = INC.partition_delta(
        INC.partition_fingerprints(cur, "part", COLS),
        INC.partition_fingerprints(base, "part", COLS)).collect()
    assert d[0].status == "unchanged"


def test_null_vs_empty_vs_sentinel_distinct(spark):
    a = _df(spark, [(0, 1, None)])
    b = _df(spark, [(0, 1, "")])
    c = _df(spark, [(0, 1, "␀")])
    fps = [INC.partition_fingerprints(x, "part", COLS).collect()[0].fingerprint
           for x in (a, b, c)]
    assert fps[0] != fps[1]
    # the sentinel itself collides with NULL by construction — documented
    assert fps[0] == fps[2]


def test_dirty_filter_prunes_unchanged(spark):
    base = _df(spark, [(0, 1, "a"), (1, 2, "b"), (2, 3, "c")])
    cur = _df(spark, [(0, 1, "a"), (1, 2, "XX"), (2, 3, "c"), (3, 4, "d")])
    delta = INC.partition_delta(
        INC.partition_fingerprints(cur, "part", COLS),
        INC.partition_fingerprints(base, "part", COLS))
    dirty = INC.dirty_partitions_filter(cur, delta, "part")
    assert sorted(r.part for r in dirty.collect()) == [1, 3]
