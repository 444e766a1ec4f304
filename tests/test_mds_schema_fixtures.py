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
        elif err.validator in ("oneOf", "anyOf", "not"):
            # record-level combinators: this engine names them $.<kw>
            out.add(f"$.{err.validator}")
        elif err.validator == "dependencies":
            # "'q' is a dependency of 'p'" -> engine reports column q
            out.add(err.message.split("'")[1])
    return out


def test_trips_schema_compiles_with_only_geo_unsupported(spark):
    rs, unsupported = from_json_schema(_load("trips"), key_col="trip_id", strict=False)
    # the full nested GeoJSON route spec (FeatureCollection -> features[]
    # -> geometry) compiles to element rules; nothing is unsupported
    assert unsupported == []
    assert len(rs.rules) > 25
    assert any("route.features[].geometry.type" == r.column for r in rs.rules)


def test_status_changes_schema_compiles(spark):
    rs, unsupported = from_json_schema(
        _load("status_changes"), key_col="device_id", strict=False
    )
    assert unsupported == []
    assert len(rs.rules) > 20
    assert any("event_location.geometry.type" == r.column for r in rs.rules)


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


# ------------------------------------------------ nested GeoJSON parity


def _violated_paths(schema, record) -> set:
    """Full dotted-path normalizer: jsonschema error paths -> this
    engine's column names (ints in the path mark array elements ->
    '[]' suffix on the array segment; required errors append the
    missing property to the object's path)."""
    v = jsonschema.Draft6Validator(schema, format_checker=jsonschema.FormatChecker())
    out = set()
    for err in v.iter_errors(record):
        parts: list[str] = []
        for p in err.absolute_path:
            if isinstance(p, int):
                parts[-1] = parts[-1] + "[]"
            else:
                parts.append(str(p))
        if err.validator == "required":
            parts.append(err.message.split("'")[1])
        if parts:
            out.add(".".join(parts))
    return out


_GEO_OK = ("Point", [1.0, 2.0])


def _loc(typ="Feature", geom=_GEO_OK, props_ts=1700000000000, omit_geom=False,
         omit_props=False):
    loc = {"type": typ}
    if not omit_geom:
        loc["geometry"] = {"type": geom[0], "coordinates": geom[1]}
    if not omit_props:
        loc["properties"] = {"timestamp": props_ts}
    return loc


def test_status_changes_nested_event_location_differential(spark):
    """Nested-object compilation vs jsonschema on FULL dotted paths —
    the reference walks the whole instance (mds/schemas.py ≈L150-220),
    so nested GeoJSON violations must match path-for-path."""
    schema = _load("status_changes")
    base = {
        "provider_id": "00000001-0000-4000-8000-000000000001",
        "provider_name": "Acme",
        "device_id": "00000002-0000-4000-8000-000000000002",
        "vehicle_id": "veh-1",
        "vehicle_type": "scooter",
        "propulsion_type": ["electric"],
        "event_type": "available",
        "event_type_reason": "service_start",
        "event_time": 1700000000000,
    }
    cases = {
        "valid": _loc(),
        "omitted": None,  # event_location is optional
        "bad_feature_type": _loc(typ="NotAFeature"),
        "missing_geometry": _loc(omit_geom=True),
        "missing_properties": _loc(omit_props=True),
        "bad_geom_type": _loc(geom=("Polygon", [1.0, 2.0])),
        "too_few_coords": _loc(geom=("Point", [1.0])),
        "too_many_coords": _loc(geom=("Point", [1.0, 2.0, 3.0, 4.0])),
        "neg_timestamp": _loc(props_ts=-5),
    }
    records = []
    for k, loc in cases.items():
        rec = dict(base, k=k)
        if loc is not None:
            rec["event_location"] = loc
        records.append(rec)

    def loc_tuple(loc):
        if loc is None:
            return None
        geom = loc.get("geometry")
        props = loc.get("properties")
        return (
            loc.get("type"),
            (props["timestamp"],) if props else None,
            (geom["type"], [float(x) for x in geom["coordinates"]]) if geom else None,
        )

    # every schema property must exist as a column (rules bind to all of
    # them); the ones not under test ride along as nulls
    rows = [
        tuple(r.get(c) for c in base)
        + (None, None, None)  # publication_time, battery_pct, associated_trip
        + (r["k"], loc_tuple(r.get("event_location")))
        for r in records
    ]
    ddl = (
        "provider_id string, provider_name string, device_id string, "
        "vehicle_id string, vehicle_type string, propulsion_type array<string>, "
        "event_type string, event_type_reason string, event_time long, "
        "publication_time long, battery_pct double, associated_trip string, "
        "k string, "
        "event_location struct<type:string, properties:struct<timestamp:long>, "
        "geometry:struct<type:string, coordinates:array<double>>>"
    )
    df = spark.createDataFrame(rows, ddl).withColumn("part_id", F.lit(0))

    rs, unsupported = from_json_schema(schema, key_col="k", strict=False)
    assert unsupported == []
    mine: dict[str, set] = {}
    for v in rs.violations(df).collect():
        mine.setdefault(v.clip_id, set()).add(v.column_name)

    for r in records:
        rec = {k: v for k, v in r.items() if k != "k" and v is not None}
        want = _violated_paths(schema, rec)
        got = mine.get(r["k"], set())
        assert got == want, (r["k"], got, want)
    assert mine["bad_geom_type"] == {"event_location.geometry.type"}
    assert mine["missing_geometry"] == {"event_location.geometry"}


def test_trips_route_items_differential(spark):
    """items.properties compilation (array<struct> element rules) vs
    jsonschema on full dotted paths, including nested objects INSIDE
    array elements (features[].geometry.*)."""
    schema = _load("trips")
    base = {
        "provider_id": "00000001-0000-4000-8000-000000000001",
        "device_id": "00000002-0000-4000-8000-000000000002",
        "vehicle_id": "veh-1",
        "vehicle_type": "bicycle",
        "propulsion_type": ["human"],
        "trip_id": "00000003-0000-4000-8000-000000000003",
        "trip_duration": 600,
        "trip_distance": 1500,
        "start_time": 1700000000000,
        "end_time": 1700000600000,
    }

    def feat(typ="Feature", gtyp="Point", coords=(1.0, 2.0), ts=1700000000000,
             omit_geom=False, omit_props=False):
        f = {"type": typ}
        if not omit_geom:
            f["geometry"] = {"type": gtyp, "coordinates": list(coords)}
        if not omit_props:
            f["properties"] = {"timestamp": ts}
        return f

    cases = {
        "valid": {"type": "FeatureCollection", "features": [feat(), feat()]},
        "omitted": None,  # route is optional
        "bad_fc_type": {"type": "Nope", "features": [feat(), feat()]},
        "missing_features": {"type": "FeatureCollection"},
        "too_few_features": {"type": "FeatureCollection", "features": [feat()]},
        "elem_bad_type": {"type": "FeatureCollection",
                          "features": [feat(typ="NotAFeature"), feat()]},
        "elem_missing_geom": {"type": "FeatureCollection",
                              "features": [feat(), feat(omit_geom=True)]},
        "elem_bad_geom_type": {"type": "FeatureCollection",
                               "features": [feat(gtyp="LineString"), feat()]},
        "elem_short_coords": {"type": "FeatureCollection",
                              "features": [feat(coords=(1.0,)), feat()]},
        "elem_neg_ts": {"type": "FeatureCollection",
                        "features": [feat(ts=-1), feat()]},
        "elem_missing_props": {"type": "FeatureCollection",
                               "features": [feat(omit_props=True), feat()]},
    }
    records = []
    for k, route in cases.items():
        rec = dict(base, k=k)
        if route is not None:
            rec["route"] = route
        records.append(rec)

    def feat_tuple(f):
        geom = f.get("geometry")
        props = f.get("properties")
        return (
            f.get("type"),
            (props["timestamp"],) if props else None,
            (geom["type"], [float(x) for x in geom["coordinates"]]) if geom else None,
        )

    def route_tuple(route):
        if route is None:
            return None
        feats = route.get("features")
        return (
            route.get("type"),
            [feat_tuple(f) for f in feats] if feats is not None else None,
        )

    # ride-along nulls for the schema properties not under test
    rows = [
        tuple(r.get(c) for c in base)
        + (None,) * 7  # provider_name, accuracy, publication_time,
                       # parking_verification_url, standard_cost,
                       # actual_cost, currency
        + (r["k"], route_tuple(r.get("route")))
        for r in records
    ]
    ddl = (
        "provider_id string, device_id string, vehicle_id string, "
        "vehicle_type string, propulsion_type array<string>, trip_id string, "
        "trip_duration long, trip_distance long, start_time long, end_time long, "
        "provider_name string, accuracy long, publication_time long, "
        "parking_verification_url string, standard_cost long, actual_cost long, "
        "currency string, "
        "k string, route struct<type:string, features:array<struct<type:string, "
        "properties:struct<timestamp:long>, "
        "geometry:struct<type:string, coordinates:array<double>>>>>"
    )
    df = spark.createDataFrame(rows, ddl).withColumn("part_id", F.lit(0))

    rs, unsupported = from_json_schema(schema, key_col="k", strict=False)
    assert unsupported == []
    mine: dict[str, set] = {}
    for v in rs.violations(df).collect():
        mine.setdefault(v.clip_id, set()).add(v.column_name)

    for r in records:
        rec = {k: v for k, v in r.items() if k != "k" and v is not None}
        want = _violated_paths(schema, rec)
        got = mine.get(r["k"], set())
        assert got == want, (r["k"], got, want)
    assert mine["elem_bad_geom_type"] == {"route.features[].geometry.type"}
    assert mine["elem_missing_geom"] == {"route.features[].geometry"}
    assert mine["elem_short_coords"] == {"route.features[].geometry.coordinates"}


def test_validator_from_schema_facade(spark):
    """DataValidator(schema_doc) parity surface: a committed nested MDS
    schema compiles straight into a Validator; violations and verdicts
    come back in one call."""
    from mds_provider_spark.api import Validator

    schema = _load("status_changes")
    v = Validator.from_schema(schema, key_col="k", unique=[["device_id"]])
    rows = [
        ("ok", "00000002-0000-4000-8000-000000000002", "scooter",
         ("Feature", (1700000000000,), ("Point", [1.0, 2.0]))),
        ("badgeo", "00000003-0000-4000-8000-000000000003", "scooter",
         ("Feature", (1700000000000,), ("Polygon", [1.0, 2.0]))),
    ]
    ddl = (
        "k string, device_id string, vehicle_type string, "
        "event_location struct<type:string, properties:struct<timestamp:long>, "
        "geometry:struct<type:string, coordinates:array<double>>>"
    )
    import pyspark.sql.functions as F

    # only the columns under test; drop rules bound to absent columns
    present = {"k", "device_id", "vehicle_type", "event_location"}
    v.ruleset.rules = [
        r for r in v.ruleset.rules if r.column.split(".")[0] in present
    ]
    df = spark.createDataFrame(rows, ddl).withColumn("part_id", F.lit(0))
    res = v.validate(df)
    assert not res.is_valid()
    got = {(r.clip_id, r.column_name) for r in res.violations.collect()}
    assert got == {("badgeo", "event_location.geometry.type")}
    verd = {r.part_id: r.status for r in res.verdicts.collect()}
    assert verd == {0: "fail"}
