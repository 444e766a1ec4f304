"""Round-5 schema-compiler surface, differentially tested against the
reference mechanism (``jsonschema.Draft6Validator``, what mds-provider
runs per record in mds/schemas.py ≈L170-220):

1. ``type`` inside combinator branches — the round-4 bug: a branch like
   {type: "string"} compiled to zero rules and counted as always
   satisfied, so the very common nullable idiom oneOf:[string, null]
   flagged every present value and not:{type:...} always fired.
2. ``$ref``/``definitions`` resolution — the raw MDS schema documents
   the reference fetches carry a definitions section addressed with
   internal ``#/definitions/...`` pointers.
3. Remaining draft-06 structural keywords: items-as-list (tuple
   validation) + additionalItems, patternProperties, propertyNames,
   minProperties/maxProperties.
"""

import json
import random

import jsonschema
import pytest
import pyspark.sql.functions as F

from mds_provider_spark.schema_compiler import from_json_schema, resolve_refs


def _ref_valid(schema, record):
    return jsonschema.Draft6Validator(
        schema, format_checker=jsonschema.FormatChecker()
    ).is_valid(record)


def _spark_invalid(spark, schema, rows, ddl, strict=True):
    rs, unsupported = from_json_schema(schema, key_col="clip_id", strict=False)
    if strict:
        assert unsupported == [], unsupported
    df = spark.createDataFrame(rows, ddl).withColumn("part_id", F.lit(0))
    return {
        r.clip_id
        for r in rs.violations(df).select("clip_id").distinct().collect()
    }


# ------------------------------------------------------- type in branches


def test_nullable_via_oneof_does_not_flag_valid_records(spark):
    """The canonical nullable idiom (MDS 1.x uses it): oneOf over a typed
    branch and a null branch must pass present values of the right type
    AND absent values."""
    schema = {
        "type": "object",
        "properties": {
            "name": {"oneOf": [{"type": "string"}, {"type": "null"}]},
            "n": {"oneOf": [{"type": "integer"}, {"type": "null"}]},
        },
    }
    rows = [("a", "hello", 7), ("b", None, None), ("c", "x", 0)]
    got = _spark_invalid(spark, schema, rows, "clip_id string, name string, n long")
    assert got == set()


def test_not_type_fires_only_on_matching_type(spark):
    schema = {
        "type": "object",
        "properties": {
            "x": {"not": {"type": "integer"}},
            "s": {"not": {"type": "boolean"}},
        },
    }
    rows = [("a", 5, "ok"), ("b", None, None)]
    got = _spark_invalid(spark, schema, rows, "clip_id string, x long, s string")
    # x is a long (JSON integer) -> not fires for 'a'; s is a string, the
    # not:{type: boolean} branch never matches -> no violation
    assert got == {"a"}


def test_type_discriminated_oneof_counts_branches(spark):
    schema = {
        "type": "object",
        "properties": {
            "v": {
                "oneOf": [
                    {"type": "string", "minLength": 2},
                    {"type": "number", "minimum": 10},
                ]
            }
        },
    }
    for rows, ddl, expect in [
        ([("ok", "ab"), ("bad", "a")], "clip_id string, v string", {"bad"}),
        ([("ok", 11.0), ("bad", 5.0)], "clip_id string, v double", {"bad"}),
    ]:
        got = _spark_invalid(spark, schema, rows, ddl)
        assert got == expect, (ddl, got)
        for key, v in rows:
            assert _ref_valid(schema, {"v": v}) == (key == "ok")


def test_object_position_type_branch(spark):
    """An object-position branch with a non-object type is never
    satisfied by a record (constant fold)."""
    schema = {
        "type": "object",
        "properties": {"a": {"type": "number"}},
        "anyOf": [{"type": "string"}, {"properties": {"a": {"minimum": 5}}}],
    }
    rows = [("ok", 7.0), ("bad", 1.0)]
    got = _spark_invalid(spark, schema, rows, "clip_id string, a double")
    assert got == {"bad"}
    assert not _ref_valid(schema, {"a": 1.0})
    assert _ref_valid(schema, {"a": 7.0})


def test_randomized_type_branch_differential_vs_jsonschema(spark):
    """150 seeded-random schemas whose combinator branches mix ``type``
    with value keywords; per-record validity must match jsonschema.
    Columns: i (long / JSON integer), x (double / JSON number),
    s (string), t (array<string>). ``integer`` branches are only
    generated for the long column — the documented divergence is that a
    double column holding 2.0 is not accepted as integer (column-typed
    reading)."""
    rng = random.Random(55_155)
    cols = {"i": "integer", "x": "number", "s": "string", "t": "array"}

    def leaf(p):
        jt = cols[p]
        opts = [{"type": jt}, {"type": [jt, "null"]}, {"type": "null"}]
        if p == "i":
            opts += [{"type": "integer", "minimum": rng.randint(0, 3)},
                     {"type": "number"}]
        if p == "x":
            opts += [{"type": "number", "maximum": float(rng.randint(2, 5))}]
        if p == "s":
            opts += [{"type": "string", "minLength": rng.randint(1, 2)},
                     {"type": "boolean"}]
        if p == "t":
            opts += [{"type": "array", "minItems": rng.randint(1, 2)},
                     {"type": "object"}]
        return rng.choice(opts)

    def schema():
        out = {"type": "object", "properties": {
            "i": {}, "x": {}, "s": {}, "t": {}}}
        for p in out["properties"]:
            kind = rng.choice(["oneOf", "anyOf", "not", "plain"])
            if kind == "plain":
                continue
            if kind == "not":
                out["properties"][p] = {"not": leaf(p)}
            else:
                out["properties"][p] = {
                    kind: [leaf(p) for _ in range(rng.randint(2, 3))]
                }
        return out

    def record():
        rec = {}
        if rng.random() < 0.75:
            rec["i"] = rng.randint(0, 5)
        if rng.random() < 0.75:
            rec["x"] = float(rng.randint(0, 5))
        if rng.random() < 0.75:
            rec["s"] = rng.choice(["", "a", "ab", "abc"])
        if rng.random() < 0.75:
            rec["t"] = ["e"] * rng.randint(0, 3)
        return rec

    mismatches = []
    for si in range(150):
        sch = schema()
        recs = [record() for _ in range(20)]
        rows = [
            (f"r{k}", r.get("i"), r.get("x"), r.get("s"), r.get("t"))
            for k, r in enumerate(recs)
        ]
        rs, unsup = from_json_schema(sch, key_col="clip_id")
        df = spark.createDataFrame(
            rows, "clip_id string, i long, x double, s string, t array<string>"
        ).withColumn("part_id", F.lit(0))
        bad = {
            r.clip_id
            for r in rs.violations(df).select("clip_id").distinct().collect()
        }
        v = jsonschema.Draft6Validator(sch)
        for k, rec in enumerate(recs):
            if v.is_valid(rec) != (f"r{k}" not in bad):
                mismatches.append((si, sch, rec))
    assert not mismatches, mismatches[:3]


# ----------------------------------------------------------------- $ref


REF_SCHEMA = {
    "type": "object",
    "definitions": {
        "uuid": {"type": "string",
                 "pattern": "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-"
                            "[0-9a-f]{4}-[0-9a-f]{12}$"},
        "nonneg": {"type": "integer", "minimum": 0},
        # chained ref, exercising recursive resolution
        "ts": {"$ref": "#/definitions/nonneg"},
        "geo": {
            "type": "object",
            "required": ["lat"],
            "properties": {"lat": {"minimum": -90, "maximum": 90}},
        },
    },
    "required": ["id"],
    "properties": {
        "id": {"$ref": "#/definitions/uuid"},
        "t": {"$ref": "#/definitions/ts"},
        "loc": {"$ref": "#/definitions/geo"},
    },
}


def test_ref_resolution_matches_jsonschema(spark):
    rows = [
        ("ok", "01234567-0123-0123-0123-0123456789ab", 5, (45.0,)),
        ("bad-id", "nope", 5, None),
        ("bad-t", "01234567-0123-0123-0123-0123456789ab", -1, None),
        ("bad-lat", "01234567-0123-0123-0123-0123456789ab", 0, (99.0,)),
        ("bad-missing", None, None, None),
    ]
    ddl = "clip_id string, id string, t long, loc struct<lat: double>"
    got = _spark_invalid(spark, REF_SCHEMA, rows, ddl)
    for key, i, t, loc in rows:
        rec = {}
        if i is not None:
            rec["id"] = i
        if t is not None:
            rec["t"] = t
        if loc is not None:
            rec["loc"] = {"lat": loc[0]}
        assert _ref_valid(REF_SCHEMA, rec) == (key not in got), key
    assert got == {"bad-id", "bad-t", "bad-lat", "bad-missing"}


def test_ref_sibling_keywords_ignored():
    """Draft-06: a schema object with $ref IS the referenced schema —
    siblings are ignored (jsonschema does the same)."""
    doc = {
        "definitions": {"pos": {"type": "integer", "minimum": 1}},
        "properties": {"n": {"$ref": "#/definitions/pos", "maximum": 2}},
    }
    resolved = resolve_refs(doc)
    assert resolved["properties"]["n"] == {"type": "integer", "minimum": 1}


def test_ref_cycle_and_external_raise():
    with pytest.raises(ValueError, match="cyclic"):
        resolve_refs({
            "definitions": {"a": {"$ref": "#/definitions/b"},
                            "b": {"$ref": "#/definitions/a"}},
            "properties": {"x": {"$ref": "#/definitions/a"}},
        })
    with pytest.raises(ValueError, match="external"):
        resolve_refs({"properties": {"x": {"$ref": "https://e.invalid/s.json"}}})
    with pytest.raises(ValueError, match="not found"):
        resolve_refs({"properties": {"x": {"$ref": "#/definitions/nope"}}})


def test_property_literally_named_ref_is_not_dereferenced():
    doc = {"properties": {"$ref": {"type": "string"}}}
    assert resolve_refs(doc) == doc


def test_ref_pointer_escapes():
    doc = {
        "definitions": {"a/b": {"const": 1}, "c~d": {"const": 2}},
        "properties": {"x": {"$ref": "#/definitions/a~1b"},
                       "y": {"$ref": "#/definitions/c~0d"}},
    }
    r = resolve_refs(doc)
    assert r["properties"]["x"] == {"const": 1}
    assert r["properties"]["y"] == {"const": 2}


def test_enum_values_are_data_not_schemas():
    doc = {
        "definitions": {"a": {"const": 1}},
        "properties": {"x": {"enum": [{"$ref": "#/definitions/a"}, "lit"]}},
    }
    r = resolve_refs(doc)
    assert r["properties"]["x"]["enum"][0] == {"$ref": "#/definitions/a"}


def test_committed_mds_fixtures_carry_refs(spark):
    """The committed fixtures are the RAW $ref'd form (what a fetch of
    the real MDS schema documents looks like), not pre-inlined — and
    they still compile clean through from_json_schema."""
    import pathlib

    fix = pathlib.Path(__file__).parent / "fixtures" / "mds_schemas"
    for name, key in (("trips", "trip_id"), ("status_changes", "device_id")):
        doc = json.loads((fix / f"{name}.json").read_text())
        assert "definitions" in doc and '"$ref"' in json.dumps(doc), name
        rs, unsup = from_json_schema(doc, key_col=key, strict=False)
        assert unsup == [] and len(rs.rules) > 25, (name, unsup)


def test_randomized_ref_differential_vs_jsonschema(spark):
    """80 seeded-random schemas drawing every leaf through
    #/definitions/... pointers (including one chained pointer);
    per-record validity must match jsonschema, which resolves internal
    refs natively."""
    rng = random.Random(909_909)
    defs = {
        "short": {"type": "string", "maxLength": 2},
        "pos": {"minimum": 1},
        "small": {"maximum": 3},
        "posnum": {"$ref": "#/definitions/pos"},
        "yz": {"enum": ["y", "z"]},
    }
    by_col = {"a": ["pos", "small", "posnum"], "s": ["short", "yz"]}

    def schema():
        out = {"type": "object", "definitions": defs, "properties": {}}
        for p in ("a", "s"):
            r = rng.random()
            if r < 0.4:
                out["properties"][p] = {"$ref": f"#/definitions/{rng.choice(by_col[p])}"}
            elif r < 0.7:
                out["properties"][p] = {
                    "anyOf": [
                        {"$ref": f"#/definitions/{rng.choice(by_col[p])}"},
                        {"$ref": f"#/definitions/{rng.choice(by_col[p])}"},
                    ]
                }
        if rng.random() < 0.4:
            out["required"] = [rng.choice(["a", "s"])]
        return out

    mismatches = []
    for si in range(80):
        sch = schema()
        recs = []
        for _ in range(20):
            rec = {}
            if rng.random() < 0.8:
                rec["a"] = float(rng.randint(0, 5))
            if rng.random() < 0.8:
                rec["s"] = rng.choice(["x", "y", "z", "long-string"])
            recs.append(rec)
        rows = [(f"r{k}", r.get("a"), r.get("s")) for k, r in enumerate(recs)]
        rs, unsup = from_json_schema(sch, key_col="clip_id")
        df = spark.createDataFrame(
            rows, "clip_id string, a double, s string"
        ).withColumn("part_id", F.lit(0))
        bad = {
            r.clip_id
            for r in rs.violations(df).select("clip_id").distinct().collect()
        }
        v = jsonschema.Draft6Validator(sch)
        for k, rec in enumerate(recs):
            if v.is_valid(rec) != (f"r{k}" not in bad):
                mismatches.append((si, sch, rec))
    assert not mismatches, mismatches[:3]


# ------------------------------------------- tuple items / name keywords


def test_tuple_items_and_additional_items_match_jsonschema(spark):
    schema = {
        "type": "object",
        "properties": {
            "bbox": {
                "items": [
                    {"type": "number", "minimum": -180, "maximum": 180},
                    {"type": "number", "minimum": -90, "maximum": 90},
                ],
                "additionalItems": False,
            },
            "path": {
                "items": [{"const": "start"}],
                "additionalItems": {"type": "string", "minLength": 1},
            },
        },
    }
    rows = [
        ("ok", [10.0, 20.0], ["start", "a", "b"]),
        ("ok-short", [10.0], ["start"]),
        ("ok-absent", None, None),
        ("bad-lat", [10.0, 99.0], None),
        ("bad-extra", [1.0, 2.0, 3.0], None),
        ("bad-head", None, ["wrong", "a"]),
        ("bad-tail", None, ["start", ""]),
        ("bad-null-pos", [None, 20.0], None),  # null violates type: number
    ]
    ddl = "clip_id string, bbox array<double>, path array<string>"
    got = _spark_invalid(spark, schema, rows, ddl)
    for row in rows:
        rec = {k: v for k, v in zip(["bbox", "path"], row[1:]) if v is not None}
        assert _ref_valid(schema, rec) == (row[0] not in got), (row[0], got)


def test_pattern_properties_match_jsonschema(spark):
    schema = {
        "type": "object",
        "properties": {"avg_speed": {}, "avg_cost": {}, "name": {}},
        "patternProperties": {"^avg_": {"type": "number", "minimum": 0}},
    }
    rows = [
        ("ok", 1.0, 2.0, "x"),
        ("bad-speed", -1.0, 2.0, None),
        ("ok-absent", None, None, "x"),
    ]
    ddl = "clip_id string, avg_speed double, avg_cost double, name string"
    got = _spark_invalid(spark, schema, rows, ddl)
    for row in rows:
        rec = {
            k: v
            for k, v in zip(["avg_speed", "avg_cost", "name"], row[1:])
            if v is not None
        }
        assert _ref_valid(schema, rec) == (row[0] not in got), row[0]
    assert got == {"bad-speed"}


def test_property_names_compile_time(spark):
    schema = {
        "type": "object",
        "properties": {"good_name": {}, "BAD": {}},
        "propertyNames": {"pattern": "^[a-z_]+$"},
    }
    rows = [("ok", "v", None), ("bad", "v", "w")]
    ddl = "clip_id string, good_name string, BAD string"
    got = _spark_invalid(spark, schema, rows, ddl)
    assert got == {"bad"}
    assert _ref_valid(schema, {"good_name": "v"})
    assert not _ref_valid(schema, {"good_name": "v", "BAD": "w"})


def test_min_max_properties_match_jsonschema(spark):
    schema = {
        "type": "object",
        "properties": {"a": {}, "b": {}, "c": {}},
        "minProperties": 1,
        "maxProperties": 2,
    }
    rows = [
        ("ok-1", "x", None, None),
        ("ok-2", "x", "y", None),
        ("bad-0", None, None, None),
        ("bad-3", "x", "y", "z"),
    ]
    ddl = "clip_id string, a string, b string, c string"
    got = _spark_invalid(spark, schema, rows, ddl)
    for row in rows:
        rec = {k: v for k, v in zip(["a", "b", "c"], row[1:]) if v is not None}
        assert _ref_valid(schema, rec) == (row[0] not in got), row[0]
    assert got == {"bad-0", "bad-3"}


def test_unknown_object_keyword_reported_not_dropped():
    rs, unsup = from_json_schema(
        {"type": "object", "properties": {"a": {}}, "minContains": 1},
        key_col="k",
        strict=False,
    )
    assert any("minContains" in u for u in unsup)
    with pytest.raises(ValueError, match="minContains"):
        from_json_schema(
            {"type": "object", "properties": {"a": {}}, "minContains": 1},
            key_col="k",
        )


def test_deeply_nested_ref_free_schema_compiles():
    """Depth guard counts $ref EXPANSIONS only: a mechanically deep but
    ref-free schema (here 80 nesting levels, above max_depth=64) must
    resolve and compile — raising on raw tree depth was a regression."""
    leaf = {"type": "string"}
    node = leaf
    for _ in range(80):
        node = {"type": "object", "properties": {"c": node}}
    out = resolve_refs(node)
    assert out == node  # no refs -> structurally unchanged


def test_ref_chain_depth_guard_still_bounds_expansions():
    defs = {f"d{i}": {"$ref": f"#/definitions/d{i+1}"} for i in range(70)}
    defs["d70"] = {"type": "string"}
    schema = {"type": "object",
              "properties": {"a": {"$ref": "#/definitions/d0"}},
              "definitions": defs}
    with pytest.raises(ValueError, match="depth"):
        resolve_refs(schema)


def test_nested_nullable_struct_type_branch_parity(spark):
    """Object-position type branches on a NULLABLE nested struct: under
    the compiler-wide contract that SQL NULL at a property position is
    an ABSENT property (the jsonschema side drops None keys likewise),
    a null struct must produce NO combinator verdict — parity with
    jsonschema on the absent-mapped instance, for both a type-excluding
    'not' branch and a null-admitting 'anyOf' branch."""
    schema = {
        "type": "object",
        "properties": {
            "clip_id": {"type": "string"},
            "loc": {
                "type": "object",
                "not": {"type": "object"},
                "anyOf": [{"type": "object"}, {"type": "null"}],
                "properties": {"lat": {"type": "number"}},
            },
        },
    }
    rs, unsupported = from_json_schema(schema, key_col="clip_id", strict=False)
    assert unsupported == []
    rows = [("present", (1.0,)), ("absent", None)]
    df = spark.createDataFrame(
        rows, "clip_id string, loc struct<lat: double>"
    ).withColumn("part_id", F.lit(0))
    got = {r.clip_id for r in rs.violations(df).collect()}

    v = jsonschema.Draft6Validator(schema)
    expect = set()
    for cid, loc in rows:
        inst = {"clip_id": cid}
        if loc is not None:
            inst["loc"] = {"lat": loc[0]}
        if not v.is_valid(inst):
            expect.add(cid)
    assert got == expect == {"present"}  # not:{type:object} fires on
    # the present struct exactly like jsonschema; the absent one is
    # silent on BOTH engines (null -> absent contract)


def test_unsupported_labels_name_the_real_keyword():
    # element subschema inside tuple items: label carries items[i], not
    # a phantom .contains. segment
    schema = {
        "type": "object",
        "properties": {
            "clip_id": {"type": "string"},
            "a": {"type": "array",
                  "items": [{"properties": {"x": {}}}]},
        },
    }
    _, unsupported = from_json_schema(schema, key_col="clip_id", strict=False)
    assert any(u.startswith("a.items[0].properties") for u in unsupported), unsupported
    assert not any(".contains." in u for u in unsupported), unsupported

    # maxProperties alone on a property-less object names maxProperties
    schema2 = {"type": "object", "maxProperties": 3,
               "properties": {}}
    _, unsup2 = from_json_schema(schema2, key_col="clip_id", strict=False)
    assert any(u.endswith("maxProperties") for u in unsup2), unsup2
    assert not any("minProperties" in u for u in unsup2), unsup2
