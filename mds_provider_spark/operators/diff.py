"""Snapshot diff — added / removed / changed rows between two versions
of a keyed table.

The validation-engine use: mds-provider's stage-table + upsert load
(mds/db.py ≈L100–250, ``Database.load`` with ``before_load``/on-conflict
semantics) never tells you WHAT an upsert changed; at 10^12-row scale,
"what moved between yesterday's snapshot and today's" IS the drift/audit
question (Iceberg exposes the file-level delta; this computes the
row-level one over any two readable versions).

Spark-first shape: ONE full outer join on the key columns — the single
unavoidable shuffle — with change detection as a null-safe column
comparison (``eqNullSafe`` per compared column, no row serialization, no
fingerprint stringification: float/decimal/timestamp compare in their
own types, so engine-specific casts can never lie about a change).
Unchanged rows are dropped BEFORE the result materializes. At 100 TB the
join co-locates for free when both snapshots are bucketed by the key
(the Iceberg layout the checkpoint runner writes); otherwise it is a
standard shuffled hash/sort-merge join that AQE sizes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff: one row per key whose presence or content differs.

    Output: (*keys, status) with status in {'added', 'removed',
    'changed'}. ``compare_cols`` defaults to every shared non-key
    column. Rows identical on all compared columns are absent from the
    result (the overwhelmingly common case — the filter runs inside the
    join's output projection, so only differences survive the stage).

    Keys are assumed unique per side (it is a snapshot of a keyed
    table); duplicate keys join multiplicatively like in any SQL diff —
    run the uniqueness operator first if that invariant is in doubt.
    """
    keys = list(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    compare_cols = list(compare_cols)

    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_o_present"),  # robust even if a key is NULL
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_n_present"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")

    old_present = F.col("_o_present").isNotNull()
    new_present = F.col("_n_present").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(~old_present, F.lit("added"))
        .when(~new_present, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )  # NULL (identical) rows are filtered below
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
                for k in keys
            ],
            "status",
        )
    )


def snapshot_diff_counts(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """The audit summary: (status, n) over the row-level diff."""
    return (
        snapshot_diff(old, new, keys, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def schema_drift(
    actual,
    expected,
    check_nullability: bool = False,
) -> list[dict]:
    """Schema CONTRACT drift — added / removed / type-changed columns
    between a live table and the expected contract. This is the check
    that runs BEFORE any row rule: a renamed or retyped column fails
    here in milliseconds instead of surfacing as a million spurious
    row violations (or worse, as rules silently evaluating NULL).

    Pure driver-side metadata (StructType comparison; pass DataFrames
    or StructTypes) — zero jobs, zero scans, so it is free to run at
    every pipeline hop at any data scale. Nested structs compare by
    their full simpleString, so a changed field inside a struct column
    reports as a type change on that column.

    Returns findings ``{column, status, actual_type, expected_type}``
    with status in {'added', 'removed', 'type_changed',
    'nullability_changed'} — empty list == contract holds.
    """
    def _fields(s):
        st = s.schema if hasattr(s, "schema") else s
        return {f.name: f for f in st.fields}

    act, exp = _fields(actual), _fields(expected)
    out: list[dict] = []
    for name in act.keys() - exp.keys():
        out.append({"column": name, "status": "added",
                    "actual_type": act[name].dataType.simpleString(),
                    "expected_type": None})
    for name in exp.keys() - act.keys():
        out.append({"column": name, "status": "removed",
                    "actual_type": None,
                    "expected_type": exp[name].dataType.simpleString()})
    for name in act.keys() & exp.keys():
        a, e = act[name], exp[name]
        if a.dataType.simpleString() != e.dataType.simpleString():
            out.append({"column": name, "status": "type_changed",
                        "actual_type": a.dataType.simpleString(),
                        "expected_type": e.dataType.simpleString()})
        elif check_nullability and a.nullable != e.nullable:
            out.append({"column": name, "status": "nullability_changed",
                        "actual_type": f"nullable={a.nullable}",
                        "expected_type": f"nullable={e.nullable}"})
    return sorted(out, key=lambda d: (d["status"], d["column"]))


def enforce_schema(df: DataFrame, expected, check_nullability: bool = False) -> DataFrame:
    """Gate form of ``schema_drift``: returns ``df`` untouched when the
    contract holds, raises with the full finding list otherwise."""
    findings = schema_drift(df, expected, check_nullability=check_nullability)
    if findings:
        raise ValueError(f"schema contract drift: {findings}")
    return df
