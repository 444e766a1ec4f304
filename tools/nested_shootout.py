"""Nested-schema shootout: jsonschema's recursive instance walk vs the
compiled dotted-path/element rules — SAME nested GeoJSON schema, same
records, full per-record parity on violated paths plus rows/sec.

The reference validates nested MDS payloads (event_location GeoJSON) by
recursing ``jsonschema.Draft6Validator.iter_errors`` through the instance
(mds/schemas.py ≈L150-220). The engine compiles the identical schema into
ONE Catalyst projection where nested access is struct-field addressing —
this harness proves both the parity and the throughput gap survive
nesting.

    python tools/nested_shootout.py [n_rows]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMA = {
    "type": "object",
    "required": ["clip_id"],
    "properties": {
        "clip_id": {"type": "string", "format": "uuid"},
        "event_location": {
            "type": "object",
            "required": ["type", "geometry", "properties"],
            "properties": {
                "type": {"type": "string", "const": "Feature"},
                "properties": {
                    "type": "object",
                    "required": ["timestamp"],
                    "properties": {"timestamp": {"type": "integer", "minimum": 0}},
                },
                "geometry": {
                    "type": "object",
                    "required": ["type", "coordinates"],
                    "properties": {
                        "type": {"type": "string", "enum": ["Point"]},
                        "coordinates": {"type": "array", "minItems": 2, "maxItems": 3},
                    },
                },
            },
        },
    },
}

DDL = (
    "k string, clip_id string, "
    "event_location struct<type:string, properties:struct<timestamp:long>, "
    "geometry:struct<type:string, coordinates:array<double>>>"
)


def _h(i: int, salt: str) -> int:
    return int.from_bytes(hashlib.md5(f"{i}:{salt}".encode()).digest()[:4], "big")


def make_record(i: int) -> dict:
    """Deterministic record with seeded nested faults (~1 in N each)."""
    rec: dict = {"k": str(i)}
    if _h(i, "cid") % 100 == 0:
        rec["clip_id"] = f"bad-{i}"
    elif _h(i, "cid") % 100 != 1:  # 1%: missing entirely (required fires)
        d = hashlib.md5(f"uuid:{i}".encode()).hexdigest()
        rec["clip_id"] = f"{d[:8]}-{d[8:12]}-{d[12:16]}-{d[16:20]}-{d[20:32]}"
    if _h(i, "loc") % 10 == 0:
        return rec  # event_location absent (it is optional)
    loc: dict = {"type": "Oops" if _h(i, "ft") % 50 == 0 else "Feature"}
    if _h(i, "geom") % 70 != 0:
        coords = [1.0, 2.0]
        if _h(i, "coords") % 40 == 0:
            coords = [1.0]
        loc["geometry"] = {
            "type": "Polygon" if _h(i, "gt") % 50 == 0 else "Point",
            "coordinates": coords,
        }
    if _h(i, "props") % 80 != 0:
        loc["properties"] = {
            "timestamp": -5 if _h(i, "ts") % 60 == 0 else 1_700_000_000_000
        }
    rec["event_location"] = loc
    return rec


def to_row(rec: dict) -> tuple:
    loc = rec.get("event_location")
    loc_t = None
    if loc is not None:
        geom = loc.get("geometry")
        props = loc.get("properties")
        loc_t = (
            loc.get("type"),
            (props["timestamp"],) if props else None,
            (geom["type"], geom["coordinates"]) if geom else None,
        )
    return (rec["k"], rec.get("clip_id"), loc_t)


def norm_paths(err) -> str:
    parts = []
    for p in err.absolute_path:
        parts.append(str(p))
    if err.validator == "required":
        parts.append(err.message.split("'")[1])
    return ".".join(parts)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    import jsonschema

    from mds_provider_spark.schema_compiler import from_json_schema
    from mds_provider_spark.session import get_spark

    records = [make_record(i) for i in range(n)]

    # ---- reference mechanism: recursive draft-6 walk (timed) ----------
    validator = jsonschema.Draft6Validator(
        SCHEMA, format_checker=jsonschema.FormatChecker()
    )
    t0 = time.monotonic()
    ref_pairs = set()
    for rec in records:
        for err in validator.iter_errors(rec):
            ref_pairs.add((rec["k"], norm_paths(err)))
    ref_sec = time.monotonic() - t0

    # ---- engine: compiled nested rules, one projection -----------------
    spark = get_spark("nested-shootout", parallelism=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F

    df = (
        spark.createDataFrame([to_row(r) for r in records], DDL)
        .withColumn("part_id", F.lit(0))
        .cache()
    )
    df.count()
    rs, unsupported = from_json_schema(SCHEMA, key_col="k")
    assert unsupported == []
    rs.violations(df).count()  # warm
    t0 = time.monotonic()
    eng_count = rs.violations(df).count()
    eng_sec = time.monotonic() - t0
    eng_pairs = {
        (r.clip_id, r.column_name) for r in rs.violations(df).collect()
    }
    spark.stop()

    missing = ref_pairs - eng_pairs
    extra = eng_pairs - ref_pairs
    print(f"rows: {n}  nested GeoJSON schema")
    print(f"reference (jsonschema recursive walk, 1 thread): "
          f"{ref_sec:7.2f}s  {n/ref_sec:10.0f} rows/s  violations={len(ref_pairs)}")
    print(f"engine    (compiled nested rules, local[8]):     "
          f"{eng_sec:7.2f}s  {n/eng_sec:10.0f} rows/s  violations={eng_count}")
    print(f"parity: missing={len(missing)} extra={len(extra)}")
    assert not missing and not extra, (list(missing)[:3], list(extra)[:3])
    print(f"speedup local[8]: {ref_sec/eng_sec:5.1f}x, violated paths identical")


if __name__ == "__main__":
    main()
