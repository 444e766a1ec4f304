"""Adversarial checkpoint-protocol tests (Iceberg stand-in hardening).

Covers the crash windows the atomic-marker protocol must survive:
  1. crash BETWEEN data write and marker write — the group's data exists
     on disk but is untrusted; a resume must rewrite it, including the
     case where the retry produces FEWER partitions than the crashed
     attempt (stale-partition poisoning, ADVICE r1).
  2. concurrent second writer racing the first — markers are written via
     tempfile + os.replace, so the last writer wins atomically and the
     committed state is one writer's consistent output, never a blend.
"""

import json
import os

import pyspark.sql.functions as F
import pytest

from mds_provider_spark.plans.checkpoint import CommitLog
from mds_provider_spark.plans.runner import ValidationRun
from mds_provider_spark.sources import fixtures as FX

N = 600
PARTS = 4


@pytest.fixture(scope="module")
def data(spark):
    clips = FX.generate_clips(
        spark, N, n_parts=PARTS, seed=42, faults=FX.default_fault_plan(N)
    ).cache()
    ts = FX.generate_transcripts(spark, N, n_parts=PARTS, seed=42).cache()
    clips.count(), ts.count()
    return clips, ts


def _run(spark, out, **kw):
    return ValidationRun(
        spark, out_dir=str(out), ref_wave_fn=FX.ref_waveform,
        n_parts=PARTS, group_size=2, **kw,
    )


def test_crash_between_data_and_marker(spark, tmp_path, data):
    """Simulate the worst crash window: group data fully written, marker
    missing. The resume must rerun the group and end bit-identical to an
    uninterrupted run."""
    clips, ts = data
    out = tmp_path / "crashwin"
    r1 = _run(spark, out)
    r1.run(clips, ts, stop_after_groups=1)
    log = CommitLog(str(out))
    # delete the marker: data for group 0 is now an uncommitted attempt
    markers = sorted(os.listdir(log.commits_dir))
    os.remove(os.path.join(log.commits_dir, markers[0]))
    assert log.committed_parts() == set()

    r2 = _run(spark, out)
    summary = r2.run(clips, ts)
    assert summary["groups_skipped"] == 0 and summary["groups_run"] == 2

    ref_out = tmp_path / "ref"
    _run(spark, ref_out).run(clips, ts)
    got = sorted(map(tuple, _run(spark, out).violations().collect()), key=repr)
    want = sorted(map(tuple, _run(spark, ref_out).violations().collect()), key=repr)
    assert got == want


def test_stale_partition_cleared_when_retry_writes_nothing(spark, tmp_path, data):
    """A crashed attempt left violation rows for a part whose retry input
    is clean: the retry must CLEAR them (clear_parts), or verdicts would
    read fail for a passing part."""
    clips, ts = data
    out = tmp_path / "stale"
    # attempt 1: faulty clips, crash before marker
    r1 = _run(spark, out)
    r1.run(clips, ts, stop_after_groups=1)
    log = CommitLog(str(out))
    for m in os.listdir(log.commits_dir):
        os.remove(os.path.join(log.commits_dir, m))
    # attempt 2: the same table arrives CLEAN (faults fixed upstream)
    clean = FX.generate_clips(spark, N, n_parts=PARTS, seed=42)
    clean_ts = FX.generate_transcripts(spark, N, n_parts=PARTS, seed=42)
    r2 = _run(spark, out)
    r2.run(clean, clean_ts)
    v = r2.violations()
    assert v.count() == 0, [tuple(r) for r in v.collect()[:5]]
    verd = r2.verdicts()
    assert verd.where(F.col("status") != "pass").count() == 0


def test_concurrent_marker_write_is_atomic(tmp_path):
    """Two writers committing the same group: os.replace is atomic, so
    the marker is always exactly one writer's JSON (never torn)."""
    log = CommitLog(str(tmp_path))
    log.commit_group(0, [0, 1], run_id="writer_a", batch=0, extra={"rows": 10})
    log.commit_group(0, [0, 1], run_id="writer_b", batch=0, extra={"rows": 99})
    metas = log.committed_groups()
    assert set(metas) == {0}
    assert metas[0]["run_id"] == "writer_b"  # last writer wins, whole file
    with open(os.path.join(log.commits_dir, "00000.json")) as f:
        assert json.load(f)["rows"] == 99


def test_concurrent_runners_converge(spark, tmp_path, data):
    """Two ValidationRuns over the same out_dir (a retry racing a zombie):
    each group commit is atomic, the final violation set equals a clean
    single run regardless of interleaving."""
    clips, ts = data
    out = tmp_path / "race"
    a = _run(spark, out)
    b = _run(spark, out)
    a.run(clips, ts, stop_after_groups=1)   # zombie got one group in
    b.run(clips, ts)                        # retry completes the rest
    summary_tail = a.run(clips, ts)         # zombie wakes up: all committed
    assert summary_tail["groups_run"] == 0
    assert summary_tail["groups_skipped"] == 2

    ref_out = tmp_path / "race_ref"
    _run(spark, ref_out).run(clips, ts)
    got = sorted(map(tuple, a.violations().collect()), key=repr)
    want = sorted(map(tuple, _run(spark, ref_out).violations().collect()), key=repr)
    assert got == want


def test_zombie_clear_respects_fresh_commits(spark, tmp_path, data, monkeypatch):
    """A zombie runner holding a STALE commit-log snapshot must not
    clear (and then skip re-writing) a group another runner committed
    after the snapshot: the pre-clear re-read of the log is the guard.
    Without it, the zombie rmtree's committed data, crashes, and the
    marker silently poisons every later resume."""
    clips, ts = data
    out = tmp_path / "zombie"
    _run(spark, out).run(clips, ts)  # healthy runner commits everything
    v_before = sorted(map(tuple, _run(spark, out).violations().collect()), key=repr)
    assert v_before  # the fault plan guarantees violations exist

    orig = CommitLog.committed_parts
    calls = {"n": 0}

    def stale_first(self):
        # first read (run()'s start-of-run snapshot) sees the PRE-commit
        # world; every later read (the pre-clear guard) sees the truth
        calls["n"] += 1
        return set() if calls["n"] == 1 else orig(self)

    monkeypatch.setattr(CommitLog, "committed_parts", stale_first)
    summary = _run(spark, out).run(clips, ts)
    monkeypatch.undo()

    # the guard re-read the log immediately before clearing: no group was
    # cleared or re-run, and the committed data is untouched
    assert summary["groups_run"] == 0
    assert summary["groups_skipped"] == 2
    v_after = sorted(map(tuple, _run(spark, out).violations().collect()), key=repr)
    assert v_after == v_before
