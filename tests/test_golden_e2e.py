"""Golden end-to-end fixture (SURVEY.md §5.2 #2; BASELINE.json: output
must match "same rule IDs, same offending clip_ids" EXACTLY).

The committed fixtures in tests/golden/ were produced by the seeded
generator (seed=42, N=2000, default_fault_plan, transcripts missing row
77 + 1 orphan). Any change to rule semantics, the generator, or the
fault plan that alters a single rule_id or clip_id fails this test.
"""

import json
import os

import pytest

from mds_provider_spark.api import Validator
from mds_provider_spark.sources import fixtures as FX

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
N = 2000


@pytest.fixture(scope="module")
def result(spark):
    clips = FX.generate_clips(spark, N, n_parts=8, seed=42,
                              faults=FX.default_fault_plan(N))
    ts = FX.generate_transcripts(spark, N, n_parts=8, seed=42,
                                 missing_idx={77}, orphan_count=1)
    return Validator.clips(ref_wave_fn=FX.ref_waveform).validate(clips, ts)


def test_violations_match_golden_exactly(result):
    with open(os.path.join(GOLDEN_DIR, "violations_n2000.json")) as f:
        want = [tuple(r) for r in json.load(f)]
    got = sorted(
        [(r.rule_id, r.clip_id, r.column_name, r.part_id)
         for r in result.violations.collect()],
        key=lambda t: (t[0], t[1] or "", t[2]),
    )
    assert got == want


def test_verdicts_match_golden_exactly(result):
    with open(os.path.join(GOLDEN_DIR, "verdicts_n2000.json")) as f:
        want = [tuple(r) for r in json.load(f)]
    got = sorted(
        (r.part_id, r.status, r.n_rows, r.n_violations)
        for r in result.verdicts.collect()
    )
    assert got == want
