"""Compile the COMMITTED MDS schema documents (reconstructed from the
public MDS 0.4 provider spec) and differentially check the resulting
RuleSets against jsonschema's Draft6 validator — the reference's exact
mechanism (mds/schemas.py ≈L170-220) — on seeded records."""

import json
import pathlib
import random

import jsonschema
import pyspark.sql.functions as F

from mds_provider_spark.schema_compiler import from_json_schema

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "mds_schemas"


def _load(name):
    with open(FIXTURES / f"{name}.json") as f:
        return json.load(f)


def _violated_props(schema, record):
    v = jsonschema.Draft6Validator(schema, format_checker=jsonschema.FormatChecker())
    out = set()
    for err in v.iter_errors(record):
        if err.absolute_path:
            out.add(str(list(err.absolute_path)[0]))
        elif err.validator == "required":
            out.update(p for p in schema["required"] if p not in record)
    return out


def test_trips_schema_compiles_with_only_geo_unsupported(spark):
    rs, unsupported = from_json_schema(_load("trips"), key_col="trip_id", strict=False)
    # the GeoJSON route property carries only type/description — both
    # structural/annotation, so nothing is unsupported (geometry content
    # checks are functions/geometry.py's job, not row rules)
    assert unsupported == []
    assert len(rs.rules) > 15


def test_status_changes_schema_compiles(spark):
    rs, unsupported = from_json_schema(
        _load("status_changes"), key_col="device_id", strict=False
    )
    assert unsupported == []
    assert len(rs.rules) > 12


def test_status_changes_differential_vs_jsonschema(spark):
    schema = _load("status_changes")
    # drop the geo property (no rules compile from it) and the optional
    # publication_time (not in the test table; compiled rules are bound
    # to table columns, so every schema property must exist as a column)
    schema = dict(schema, properties={k: v for k, v in schema["properties"].items()
                                      if k not in ("event_location", "publication_time")})
    rng = random.Random(42)
    uuids = [f"{i:08x}-0000-4000-8000-{i:012x}" for i in range(300)]
    event_types = ["available", "reserved", "unavailable", "removed", "warp"]
    reasons = ["service_start", "maintenance", "low_battery", "not_a_reason"]

    records = []
    for i in range(200):
        rec = {"k": f"r{i}"}
        rec["provider_id"] = rng.choice([uuids[i], "nope", None])
        rec["provider_name"] = rng.choice(["Acme Mobility", "", None])
        rec["device_id"] = rng.choice([uuids[i + 50], "bad", None])
        rec["vehicle_id"] = rng.choice(["veh-1", "", None])
        rec["vehicle_type"] = rng.choice(["scooter", "bicycle", "hoverboard", None])
        rec["propulsion_type"] = rng.choice(
            [["electric"], ["human", "electric"], [], ["human", "human"], ["warp"], None]
        )
        rec["event_type"] = rng.choice(event_types + [None])
        rec["event_type_reason"] = rng.choice(reasons + [None])
        rec["event_time"] = rng.choice([0, 1700000000000, -5, None])
        rec["battery_pct"] = rng.choice([0.0, 0.5, 1.0, 1.5, -0.1, None])
        rec["associated_trip"] = rng.choice([uuids[i + 100], "xx", None])
        records.append(rec)

    cols = ["k", "provider_id", "provider_name", "device_id", "vehicle_id",
            "vehicle_type", "propulsion_type", "event_type",
            "event_type_reason", "event_time", "battery_pct", "associated_trip"]
    rows = [tuple(r[c] for c in cols) for r in records]
    df = spark.createDataFrame(
        rows,
        "k string, provider_id string, provider_name string, device_id string, "
        "vehicle_id string, vehicle_type string, propulsion_type array<string>, "
        "event_type string, event_type_reason string, event_time long, "
        "battery_pct double, associated_trip string",
    ).withColumn("part_id", F.lit(0))

    rs, _ = from_json_schema(schema, key_col="k", strict=False)
    mine: dict[str, set] = {}
    for v in rs.violations(df).collect():
        mine.setdefault(v.clip_id, set()).add(v.column_name)

    for r in records:
        rec = {k: v for k, v in r.items() if k != "k" and v is not None}
        want = _violated_props(schema, rec)
        got = mine.get(r["k"], set())
        assert got == want, (r["k"], got, want, rec)
