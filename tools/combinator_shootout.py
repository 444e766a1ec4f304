"""Combinator shootout: jsonschema's per-record combinator walk vs the
compiled oneOf/anyOf/dependencies predicates — SAME conditional schema
(the real MDS status_changes pattern: event_type gates
event_type_reason, user pick-up/drop-off requires associated_trip),
same seeded records, full per-record VALIDITY parity plus rows/sec.

jsonschema evaluates every oneOf branch by recursively validating the
instance against each subschema per record; the engine compiles the
whole construct into nested CASE WHENs inside the one rule projection
(PLANS.md §Combinator-laden), so conditional depth costs nothing.

    python tools/combinator_shootout.py [n_rows]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REASONS = {
    "available": ["service_start", "user_drop_off", "rebalance_drop_off",
                  "maintenance_drop_off", "agency_drop_off"],
    "reserved": ["user_pick_up"],
    "unavailable": ["maintenance", "low_battery"],
    "removed": ["service_end", "rebalance_pick_up", "maintenance_pick_up",
                "agency_pick_up", "compliance_pick_up", "decommissioned"],
}
ALL_REASONS = sorted({r for v in REASONS.values() for r in v})

SCHEMA = {
    "type": "object",
    "required": ["event_type"],
    "properties": {
        "event_type": {"type": "string", "enum": sorted(REASONS)},
        "event_type_reason": {"type": "string", "enum": ALL_REASONS},
        "associated_trip": {"type": "string"},
        "battery_pct": {"type": "number", "minimum": 0, "maximum": 1},
    },
    "oneOf": [
        {"properties": {"event_type": {"enum": [et]},
                        "event_type_reason": {"enum": rs}}}
        for et, rs in sorted(REASONS.items())
    ],
    "anyOf": [
        {"not": {"properties": {"event_type_reason":
                                {"enum": ["user_pick_up", "user_drop_off"]}}}},
        {"required": ["associated_trip"]},
    ],
    "dependencies": {"battery_pct": ["event_type_reason"]},
}

DDL = (
    "k string, event_type string, event_type_reason string, "
    "associated_trip string, battery_pct double"
)


def _h(i: int, salt: str) -> int:
    return int.from_bytes(hashlib.md5(f"{i}:{salt}".encode()).digest()[:4], "big")


def make_record(i: int) -> dict:
    rec: dict = {"k": str(i)}
    ets = sorted(REASONS)
    if _h(i, "et") % 50 != 0:  # 2%: event_type missing
        rec["event_type"] = ets[_h(i, "etv") % len(ets)]
    if _h(i, "rs") % 20 != 0:  # 5%: reason missing
        if _h(i, "cross") % 25 == 0 and "event_type" in rec:
            # cross-wired reason: valid enum value but for ANOTHER type
            other = ets[(ets.index(rec["event_type"]) + 1) % len(ets)]
            rec["event_type_reason"] = REASONS[other][0]
        elif "event_type" in rec:
            rs = REASONS[rec["event_type"]]
            rec["event_type_reason"] = rs[_h(i, "rsv") % len(rs)]
        else:
            rec["event_type_reason"] = ALL_REASONS[_h(i, "rsv") % len(ALL_REASONS)]
    if rec.get("event_type_reason") in ("user_pick_up", "user_drop_off"):
        if _h(i, "trip") % 30 != 0:  # 1-in-30 of these: trip missing (anyOf fires)
            rec["associated_trip"] = f"trip-{i}"
    if _h(i, "bat") % 10 == 0:
        rec["battery_pct"] = 1.5 if _h(i, "batv") % 40 == 0 else 0.5
    return rec


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    import jsonschema

    from mds_provider_spark.schema_compiler import from_json_schema
    from mds_provider_spark.session import get_spark

    records = [make_record(i) for i in range(n)]

    validator = jsonschema.Draft6Validator(SCHEMA)
    t0 = time.monotonic()
    ref_invalid = {r["k"] for r in records if not validator.is_valid(r)}
    ref_sec = time.monotonic() - t0

    spark = get_spark("combinator-shootout", parallelism=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F

    rs, unsupported = from_json_schema(SCHEMA, key_col="k")
    assert unsupported == [], unsupported
    rows = [
        (r["k"], r.get("event_type"), r.get("event_type_reason"),
         r.get("associated_trip"), r.get("battery_pct"))
        for r in records
    ]
    df = (
        spark.createDataFrame(rows, DDL)
        .withColumn("part_id", F.lit(0))
        .repartition(8)
        .persist()
    )
    df.count()  # materialize input outside the timed window

    def run_engine():
        return {
            r.clip_id
            for r in rs.violations(df).select("clip_id").distinct().collect()
        }

    run_engine()  # warmup: whole-stage codegen compile + JIT, amortized on a cluster
    t0 = time.monotonic()
    got_invalid = run_engine()
    eng_sec = time.monotonic() - t0

    missing = ref_invalid - got_invalid
    extra = got_invalid - ref_invalid
    print(f"rows: {n}  conditional MDS schema (oneOf x4 + anyOf/not + dependencies)")
    print(f"reference (jsonschema combinator walk, 1 thread): {ref_sec:7.2f}s "
          f"{n / ref_sec:11.0f} rows/s  invalid={len(ref_invalid)}")
    print(f"engine    (compiled combinators, local[8]):       {eng_sec:7.2f}s "
          f"{n / eng_sec:11.0f} rows/s  invalid={len(got_invalid)}")
    print(f"parity: missing={len(missing)} extra={len(extra)}")
    print(f"speedup local[8]: {ref_sec / eng_sec:5.1f}x, per-record validity identical")
    if missing or extra:
        raise SystemExit(f"PARITY FAILURE missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}")
    spark.stop()


if __name__ == "__main__":
    main()
