"""Driver-contract guards for __spark_entry__.

The driver canonicalizes query output through pandas (sort_values +
factorize), which cannot hash list/map/binary cells — CORRECTNESS_r01's
tdigest crash. Every queries() entry must therefore return only scalar
columns, and every oracle_sql() key must name a real query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.BinaryType, T.StructType)


def test_oracle_keys_subset_of_queries():
    extra = set(E.oracle_sql()) - set(E.queries())
    assert not extra, f"oracle_sql keys without a query: {sorted(extra)}"


def test_driver_queries_return_scalar_columns(spark):
    bad: dict[str, list[str]] = {}
    for name, fn in E.queries().items():
        df = fn(spark, SF)
        cols = [f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)]
        if cols:
            bad[name] = cols
    assert not bad, f"non-scalar output columns (driver cannot hash): {bad}"


def test_entry_runs_and_has_stable_schema(spark):
    df = E.entry(spark)
    assert df.columns == ["rule_id", "clip_id", "column_name", "message", "part_id"]
    assert df.count() >= 0


def test_skip_ledger_times_engine_only(spark, monkeypatch, tmp_path):
    """SPARK_GRAFT_SKIP_LEDGER=1 (set by bench.py) must change WHAT IS
    TIMED, never WHAT IS COMPUTED: the engine result is identical with
    the flag on, and the .oracle/ ledger is not rewritten (so a bench
    run can never clobber the gate's fresh ledgers with stale ones —
    it does not touch them at all)."""
    import os

    monkeypatch.delenv("SPARK_GRAFT_SKIP_LEDGER", raising=False)
    assert E._ledgers_on()
    on = sorted(map(str, E.queries()["label_noise_clips"](spark, SF).collect()))
    ledger = os.path.join(E._ORACLE_DIR, "label_noise_pairs_ledger")
    stamp = max(
        os.path.getmtime(os.path.join(ledger, f)) for f in os.listdir(ledger)
    )

    monkeypatch.setenv("SPARK_GRAFT_SKIP_LEDGER", "1")
    assert not E._ledgers_on()
    off = sorted(map(str, E.queries()["label_noise_clips"](spark, SF).collect()))
    assert on == off
    assert max(
        os.path.getmtime(os.path.join(ledger, f)) for f in os.listdir(ledger)
    ) == stamp
