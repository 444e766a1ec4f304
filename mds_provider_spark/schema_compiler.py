"""JSON Schema -> RuleSet compiler: the direct switch-over surface.

The reference validates records by walking a draft-06 MDS JSON Schema
with ``jsonschema.Draft6Validator.iter_errors`` per record
(mds/schemas.py ≈L150–220, Schema/DataValidator). This module consumes
the SAME schema documents and compiles the row-expressible keyword subset
into the engine's RuleSet — one Catalyst projection instead of a Python
walk per record, same rule-id/violation-row contract.

Supported keywords (the ones MDS provider schemas actually use at the
record level): required, type (via nullable cast check on string-typed
reads), enum, minimum/maximum (+ exclusive variants), pattern, format:
uuid, minItems/maxItems, uniqueItems, items.enum (arrays of enums),
minLength (non-empty strings). Unsupported keywords are returned, not
silently dropped — callers decide whether that's an error.

Uniqueness has no JSON-Schema keyword; pass ``unique`` explicitly (the
reference gets it from the Postgres PK instead, mds/db.py).
"""

from __future__ import annotations

from typing import Sequence

from mds_provider_spark import rules as R
from mds_provider_spark import schema as S

_JSON_TO_SPARK_TYPE = {
    "integer": "long",
    "number": "double",
    "boolean": "boolean",
    "string": "string",
}


def from_json_schema(
    schema: dict,
    key_col: str,
    part_col: str = "part_id",
    unique: Sequence[str] | None = None,
    strict: bool = True,
) -> tuple[R.RuleSet, list[str]]:
    """Compile an object schema's ``properties`` into a RuleSet.

    Returns (ruleset, unsupported) where ``unsupported`` lists keyword
    paths that have no row-level Catalyst mapping. ``strict=True`` raises
    on unsupported keywords instead.
    """
    if schema.get("type") not in (None, "object"):
        raise ValueError("top-level schema must be an object schema")
    props: dict = schema.get("properties", {})
    required = set(schema.get("required", []))

    rs = R.RuleSet(key_col=key_col, part_col=part_col)
    unsupported: list[str] = []

    for name in required:
        rs.add(R.not_null(name))

    for name, spec in props.items():
        for kw, val in spec.items():
            if kw == "enum":
                rs.add(R.is_in(name, val))
            elif kw in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum"):
                pass  # handled together below
            elif kw == "pattern":
                rs.add(R.matches(name, val))
            elif kw == "format":
                if val == "uuid":
                    rs.add(R.matches(name, S.UUID_RE))
                else:
                    unsupported.append(f"{name}.format:{val}")
            elif kw == "minLength":
                # faithful draft-06 semantics: raw length, no trimming
                rs.add(R.min_length(name, int(val)))
            elif kw == "maxLength":
                rs.add(R.max_length(name, int(val)))
            elif kw == "const":
                rs.add(R.const_value(name, val))
            elif kw == "multipleOf":
                if isinstance(val, int) and val > 0:
                    rs.add(R.multiple_of(name, val))
                else:
                    unsupported.append(f"{name}.multipleOf:{val}")
            elif kw in ("minItems", "maxItems"):
                pass  # handled together below
            elif kw == "uniqueItems":
                if val:
                    rs.add(R.unique_items(name))
            elif kw == "items":
                if isinstance(val, dict) and set(val) <= {"enum", "type"}:
                    if "enum" in val:
                        rs.add(R.elements_in(name, val["enum"]))
                else:
                    unsupported.append(f"{name}.items")
            elif kw == "type":
                pass  # structural: enforced by the read schema, not a rule
            elif kw in ("description", "title", "default", "examples", "$comment"):
                pass  # annotations
            else:
                unsupported.append(f"{name}.{kw}")

        # minimum and exclusiveMinimum may BOTH appear (legal draft-06);
        # compile the stricter of the two, deriving inclusivity from
        # whichever keyword supplied the winning bound. x<m (inclusive
        # min m) is implied by x<=e (exclusive min e) whenever e >= m.
        lo, lo_inc = None, True
        if "exclusiveMinimum" in spec and (
            "minimum" not in spec or spec["exclusiveMinimum"] >= spec["minimum"]
        ):
            lo, lo_inc = spec["exclusiveMinimum"], False
        elif "minimum" in spec:
            lo, lo_inc = spec["minimum"], True
        hi, hi_inc = None, True
        if "exclusiveMaximum" in spec and (
            "maximum" not in spec or spec["exclusiveMaximum"] <= spec["maximum"]
        ):
            hi, hi_inc = spec["exclusiveMaximum"], False
        elif "maximum" in spec:
            hi, hi_inc = spec["maximum"], True
        if lo is not None or hi is not None:
            rs.add(
                R.in_range(
                    name,
                    lo=lo,
                    hi=hi,
                    lo_inclusive=lo_inc,
                    hi_inclusive=hi_inc,
                )
            )
        if "minItems" in spec or "maxItems" in spec:
            rs.add(
                R.array_size(
                    name,
                    min_items=spec.get("minItems"),
                    max_items=spec.get("maxItems"),
                )
            )

    for cols in unique or []:
        rs.add(R.unique_key(cols))

    if strict and unsupported:
        raise ValueError(f"unsupported JSON-Schema keywords: {unsupported}")
    return rs, unsupported
