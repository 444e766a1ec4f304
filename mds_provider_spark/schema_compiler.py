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
uuid, minItems/maxItems, uniqueItems, contains, items.enum (arrays of
enums), minLength (non-empty strings), and — round 4 — the combinators
``allOf``/``anyOf``/``oneOf``/``not``/``dependencies`` (draft-06) plus
``if``/``then``/``else`` (the draft-07 spelling), at both record and
property level. Combinator branches compile to deferred predicates and
fuse into the SAME single-projection pass as every other rule.

Round 5 completes the draft-06 structural surface: internal
``$ref``/``definitions`` pointers are inlined up front (``resolve_refs``
— raw fetched MDS schema documents compile unmodified), ``type`` inside
combinator branches compiles to a runtime typeof()+nullness predicate
(the nullable-via-oneOf idiom), ``items`` as a LIST (tuple validation)
with ``additionalItems``, ``patternProperties``/``propertyNames``/
``minProperties``/``maxProperties`` against the static declared-name
universe the strict read schema guarantees.

Unsupported keywords are returned, not silently dropped — callers
decide whether that's an error.

Uniqueness has no JSON-Schema keyword; pass ``unique`` explicitly (the
reference gets it from the Postgres PK instead, mds/db.py).
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import functions as F

from mds_provider_spark import rules as R
from mds_provider_spark import schema as S

_JSON_TO_SPARK_TYPE = {
    "integer": "long",
    "number": "double",
    "boolean": "boolean",
    "string": "string",
}

# JSON-Schema ``type`` -> regex over Spark's typeof() name for the value.
# Used ONLY inside combinator branches, where ``type`` is discriminating
# (oneOf:[{type:string},{type:null}] is the canonical nullable idiom) —
# in the main compile path ``type`` stays structural (the strict read
# schema enforces it; rule P2 ``castable`` covers string-typed reads).
# The check is column-typed: a value's JSON type is decided by the
# column's Spark type plus nullness. Divergence from draft-06, documented:
# ``integer`` does not accept float/double columns that happen to hold
# zero-fraction values (jsonschema's 2.0-is-an-integer nicety needs value
# introspection that would break analysis on non-numeric branches).
_TYPE_RE = {
    "string": r"^(string|varchar|char)",
    "integer": r"^(tinyint|smallint|int|bigint)$",
    "number": r"^(tinyint|smallint|int|bigint|float|double)$|^decimal",
    "boolean": r"^boolean$",
    "array": r"^array<",
    "object": r"^(struct|map)<",
}


def _type_sat(types):
    """Deferred x -> Column: True iff the value satisfies JSON-Schema
    ``type`` (string or list form). Null-safe by construction: nullness
    is decided explicitly (SQL NULL plays JSON null), non-null values
    match on ``typeof()`` — constant per column, so Catalyst folds the
    comparison. Callers must pre-validate names against _TYPE_RE."""
    tl = [types] if isinstance(types, str) else list(types)
    pats = [_TYPE_RE[t] for t in tl if t != "null"]

    def sat(x):
        out = F.lit(False)
        if "null" in tl:
            out = out | x.isNull()
        if pats:
            out = out | (x.isNotNull() & F.typeof(x).rlike("|".join(pats)))
        return out

    return sat


def _check_type_names(val, where: str, unsupported: list[str]) -> list | None:
    """Validate a ``type`` keyword value; returns the type list or None
    (with an ``unsupported`` entry) when a name has no typeof mapping."""
    tl = [val] if isinstance(val, str) else list(val)
    bad = [t for t in tl if t != "null" and t not in _TYPE_RE]
    if bad:
        unsupported.append(f"{where}.type:{bad}")
        return None
    return tl


_ANNOTATIONS = ("description", "title", "default", "examples", "$comment", "$schema", "$id")

# Combinator keywords compiled by _compile_combinators (round 4). The MDS
# provider schemas gate event_type_reason / associated_trip on event_type
# through these (mds/schemas.py walks them via jsonschema ≈L30–90).
# if/then/else is the draft-07 spelling of the same conditionals —
# compiled too, so post-0.4 schema documents also work.
_COMBINATOR_KEYS = ("allOf", "anyOf", "oneOf", "not", "dependencies", "if", "then", "else")


def _subrules(
    spec: dict,
    unsupported: list[str],
    prefix: str,
    parent: str | None,
    scalar_path: str | None,
) -> list:
    """Compile a combinator BRANCH into a throwaway RuleSet and return its
    rules — only their deferred predicates are reused; the branch's own
    rule ids/messages never surface (jsonschema likewise reports the
    combinator, not the branch internals). Unsupported keywords inside a
    branch propagate to the caller's list (strict mode still raises).

    ``type`` is compiled HERE (in_branch=True below) because inside a
    branch it discriminates — a type-only branch like {type: "string"}
    must be satisfied exactly by string values, not vacuously by
    everything (the round-4 bug: such branches compiled to zero rules and
    counted as always-satisfied, so oneOf:[string,null] flagged every
    present value and not:{type:...} always fired). At an object-position
    branch ``type`` compiles to a constant (satisfied iff the list admits
    "object") — sound because the instance is provably a non-null struct
    whenever the combinator fires: the record root always exists, and a
    NESTED object's combinators carry an ``F.col(parent).isNotNull()``
    guard (``_compile_combinators``), under the compiler-wide contract
    that SQL NULL at a property position means the property is ABSENT
    (the differential harness drops None keys for jsonschema the same
    way), and draft-06 applies a subschema only to present instances."""
    rs = R.RuleSet(key_col="", part_col="")
    if scalar_path is not None:
        _compile_scalar(rs, unsupported, scalar_path, spec, in_branch=True)
    else:
        _compile_object(
            rs, unsupported, spec, prefix=prefix, parent=parent, in_branch=True
        )
        if "type" in spec:
            tl = _check_type_names(spec["type"], prefix.rstrip(".") or "$", unsupported)
            if tl is not None and "object" not in tl:
                rs.add(
                    R.Rule(
                        S.rule_id(S.BAD_TYPE, prefix.rstrip(".") or "$"),
                        prefix.rstrip(".") or "$",
                        f"instance is an object; branch requires type {tl}",
                        lambda: F.lit(True),
                    )
                )
    return rs.rules


def _combinator_fold(kind: str, viols: list):
    """The one place combinator semantics live: fold branch-VIOLATION
    callables into the combinator's violation. Works for both deferred
    record-level thunks (no args) and per-element predicates (x arg) —
    every caller's branches are null-safe (coalesced), so the folds
    never yield NULL. anyOf: violated iff ALL branches violated; oneOf:
    violated iff #satisfied != 1; allOf: violated iff ANY branch
    violated; not: violated iff the single branch is satisfied."""
    if kind == "anyOf":
        def bad(*a):
            out = F.lit(True)
            for v in viols:
                out = out & v(*a)
            return out
    elif kind == "oneOf":
        def bad(*a):
            n_sat = F.lit(0)
            for v in viols:
                n_sat = n_sat + F.when(v(*a), F.lit(0)).otherwise(F.lit(1))
            return n_sat != 1
    elif kind == "allOf":
        def bad(*a):
            out = F.lit(False)
            for v in viols:
                out = out | v(*a)
            return out
    elif kind == "not":
        def bad(*a):
            return ~viols[0](*a)
    else:  # pragma: no cover - internal misuse
        raise ValueError(kind)
    return bad


def _branch_violation(rules: list):
    """Deferred Column: True iff the row violates ANY of the branch's
    rules (i.e. fails the branch subschema). Null-safe by construction —
    every rule predicate is coalesced, so the OR never yields NULL."""

    def col():
        out = F.lit(False)
        for r in rules:
            out = out | F.coalesce(r.predicate(), F.lit(False))
        return out

    return col


def _compile_combinators(
    rs: "R.RuleSet",
    unsupported: list[str],
    spec: dict,
    prefix: str,
    parent: str | None,
    scalar_path: str | None = None,
) -> None:
    """anyOf/oneOf/allOf/not/dependencies/if-then-else at either the
    object level (``scalar_path is None``: branches are object subschemas
    evaluated against the record at dotted ``prefix``) or the property
    level (branches are scalar specs for the single column
    ``scalar_path``).

    Everything compiles to ONE deferred Catalyst predicate per combinator
    — branch satisfaction is just the negated OR of the branch's compiled
    rule predicates, so the whole construct stays inside the same
    whole-stage-codegen projection as every other rule (no extra pass,
    no Python). Presence guards mirror jsonschema's evaluation scope: a
    property-level combinator only fires when the property is present,
    a nested-object one only when the enclosing object is."""
    where = scalar_path if scalar_path is not None else (prefix.rstrip(".") or "$")

    def guard():
        if scalar_path is not None:
            return F.col(scalar_path).isNotNull()
        if parent is not None:
            return F.col(parent).isNotNull()
        return None

    def wrap(pred):
        def g():
            base = F.coalesce(pred(), F.lit(False))
            gd = guard()
            return base if gd is None else gd & base

        return g

    def branch_viols(branches):
        return [
            _branch_violation(_subrules(b, unsupported, prefix, parent, scalar_path))
            for b in branches
        ]

    for branch in spec.get("allOf", []):
        # conjunction == union of rule sets: compile each branch IN PLACE
        # so per-keyword rule ids and messages survive intact
        if scalar_path is not None:
            _compile_scalar(rs, unsupported, scalar_path, branch)
        else:
            _compile_object(rs, unsupported, branch, prefix=prefix, parent=parent)

    if "anyOf" in spec:
        viols = branch_viols(spec["anyOf"])
        name = f"{where}.anyOf"
        rs.add(
            R.Rule(
                S.rule_id(S.COMBINATOR, name),
                name,
                f"{where} matches none of {len(viols)} anyOf branches",
                wrap(_combinator_fold("anyOf", viols)),
            )
        )

    if "oneOf" in spec:
        viols = branch_viols(spec["oneOf"])
        name = f"{where}.oneOf"
        rs.add(
            R.Rule(
                S.rule_id(S.COMBINATOR, name),
                name,
                f"{where} must match exactly one of {len(viols)} oneOf branches",
                wrap(_combinator_fold("oneOf", viols)),
            )
        )

    if "not" in spec:
        viols = [
            _branch_violation(
                _subrules(spec["not"], unsupported, prefix, parent, scalar_path)
            )
        ]
        name = f"{where}.not"
        rs.add(
            R.Rule(
                S.rule_id(S.COMBINATOR, name),
                name,
                f"{where} matches a forbidden (not) schema",
                wrap(_combinator_fold("not", viols)),
            )
        )

    if "if" in spec and ("then" in spec or "else" in spec):
        if_viol = _branch_violation(
            _subrules(spec["if"], unsupported, prefix, parent, scalar_path)
        )
        then_viol = (
            _branch_violation(
                _subrules(spec["then"], unsupported, prefix, parent, scalar_path)
            )
            if "then" in spec
            else (lambda: F.lit(False))
        )
        else_viol = (
            _branch_violation(
                _subrules(spec["else"], unsupported, prefix, parent, scalar_path)
            )
            if "else" in spec
            else (lambda: F.lit(False))
        )
        name = f"{where}.if"
        rs.add(
            R.Rule(
                S.rule_id(S.COMBINATOR, name),
                name,
                f"{where} fails its if/then/else conditional",
                wrap(lambda: F.when(~if_viol(), then_viol()).otherwise(else_viol())),
            )
        )

    if scalar_path is None:
        for prop, dep in spec.get("dependencies", {}).items():
            ppath = f"{prefix}{prop}"
            if isinstance(dep, (list, tuple)):
                for d in dep:
                    rs.add(R.required_with(f"{prefix}{d}", ppath))
            elif isinstance(dep, dict):
                viol = _branch_violation(
                    _subrules(dep, unsupported, prefix, parent, None)
                )
                name = f"{ppath}.dependencies"
                rs.add(
                    R.Rule(
                        S.rule_id(S.COMBINATOR, name),
                        name,
                        f"record fails the schema required when {ppath} is present",
                        lambda viol=viol, ppath=ppath: F.col(ppath).isNotNull()
                        & F.coalesce(viol(), F.lit(False)),
                    )
                )
            else:
                unsupported.append(f"{ppath}.dependencies:{dep!r}")
    elif "dependencies" in spec:
        unsupported.append(f"{where}.dependencies")


def _bounds(spec: dict) -> tuple:
    """(lo, lo_inclusive, hi, hi_inclusive) from min/max keywords.

    Draft-06 numeric ``exclusiveMinimum``/``exclusiveMaximum`` are bounds
    in their own right; when BOTH forms appear (legal) the stricter wins —
    x<m (inclusive min m) is implied by x<=e (exclusive min e) when e>=m.
    Draft-04 BOOLEAN exclusives are modifiers on minimum/maximum instead:
    ``{minimum: 5, exclusiveMinimum: true}`` means x>5 (bool must be
    checked FIRST — bool is an int subclass, and comparing it numerically
    mis-compiled the bound as inclusive-5 or even lo=True)."""
    lo, lo_inc = None, True
    ex_min = spec.get("exclusiveMinimum")
    if isinstance(ex_min, bool):  # draft-04 form
        if "minimum" in spec:
            lo, lo_inc = spec["minimum"], not ex_min
    elif ex_min is not None and (
        "minimum" not in spec or ex_min >= spec["minimum"]
    ):
        lo, lo_inc = ex_min, False
    elif "minimum" in spec:
        lo, lo_inc = spec["minimum"], True

    hi, hi_inc = None, True
    ex_max = spec.get("exclusiveMaximum")
    if isinstance(ex_max, bool):
        if "maximum" in spec:
            hi, hi_inc = spec["maximum"], not ex_max
    elif ex_max is not None and (
        "maximum" not in spec or ex_max <= spec["maximum"]
    ):
        hi, hi_inc = ex_max, False
    elif "maximum" in spec:
        hi, hi_inc = spec["maximum"], True
    return lo, lo_inc, hi, hi_inc


def _element_satisfies(spec: dict, where: str, unsupported: list[str]):
    """Deferred per-element satisfaction predicate for a scalar subschema
    (used by ``contains``): x -> Column. Conjunction of the keyword
    subset that makes sense per element; unsupported element keywords
    propagate to the caller's list.

    NULL-entry semantics follow jsonschema exactly: type-specific
    keywords (bounds, pattern, length) are VACUOUS on a null entry —
    draft-06 ``minimum`` only constrains numbers, so null satisfies
    ``{minimum: 90}`` — while value-equality keywords (enum, const)
    fail on null unless null is itself an allowed value."""
    from pyspark.sql import Column

    def vac(cond):  # type-specific keyword: vacuously true on null
        return lambda x, c=cond: F.coalesce(c(x), F.lit(True))

    def strict(cond):  # value-equality keyword: null fails
        return lambda x, c=cond: F.coalesce(c(x), F.lit(False))

    makers = []
    lo, lo_inc, hi, hi_inc = _bounds(spec)
    if lo is not None:
        makers.append(vac(lambda x: (x >= lo) if lo_inc else (x > lo)))
    if hi is not None:
        makers.append(vac(lambda x: (x <= hi) if hi_inc else (x < hi)))
    for kw, val in spec.items():
        if kw == "enum":
            vals = list(val)
            if any(v is None for v in vals):
                non_null = [v for v in vals if v is not None]
                makers.append(
                    lambda x, v=non_null: F.coalesce(x.isin(v), F.lit(False))
                    | x.isNull()
                )
            else:
                makers.append(strict(lambda x, v=vals: x.isin(v)))
        elif kw == "const":
            if val is None:
                makers.append(lambda x: x.isNull())
            else:
                makers.append(strict(lambda x, v=val: x == F.lit(v)))
        elif kw == "pattern":
            makers.append(vac(lambda x, v=val: x.rlike(v)))
        elif kw == "minLength":
            makers.append(vac(lambda x, v=int(val): F.length(x) >= v))
        elif kw == "maxLength":
            makers.append(vac(lambda x, v=int(val): F.length(x) <= v))
        elif kw in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum"):
            pass  # _bounds above
        elif kw == "type":
            # real check (draft-06: null VIOLATES e.g. {type: number}) —
            # column-typed via typeof(), see _TYPE_RE
            tl = _check_type_names(val, where, unsupported)
            if tl is not None:
                makers.append(_type_sat(tl))
        elif kw in _ANNOTATIONS:
            pass
        else:
            unsupported.append(f"{where}.{kw}")

    def pred(x: "Column") -> "Column":
        out = F.lit(True)
        for m in makers:
            out = out & m(x)
        return out

    desc = ", ".join(
        f"{k}={spec[k]!r}" for k in sorted(spec) if k not in ("type", *_ANNOTATIONS)
    ) or "any element"
    return pred, desc


def _compile_tuple_items(
    rs: "R.RuleSet",
    unsupported: list[str],
    col: str,
    specs: list,
    additional,
) -> None:
    """Draft-06 tuple validation: ``items`` as a LIST of positional
    subschemas plus ``additionalItems`` (false = length cap; schema =
    constraint on the tail). Compiles to positional ``get()`` checks and
    one ``exists`` over the tail slice — all inside the same projection,
    no explode. A position is only checked when the array is long enough
    (jsonschema: shorter arrays are vacuously valid per position)."""
    sats = []
    for i, s in enumerate(specs):
        if not isinstance(s, dict):
            unsupported.append(f"{col}.items[{i}]")
            sats.append(None)
            continue
        sat, _ = _element_satisfies(s, f"{col}.items[{i}]", unsupported)
        sats.append(sat)
    n = len(specs)

    def pred():
        c = F.col(col)
        out = F.lit(False)
        for i, sat in enumerate(sats):
            if sat is None:
                continue
            # F.get is always null-on-out-of-bounds (ANSI-safe); the size
            # guard decides presence, the sat fragments decide null entries
            out = out | (
                (F.size(c) > i) & ~F.coalesce(sat(F.get(c, i)), F.lit(False))
            )
        return c.isNotNull() & out

    rs.add(
        R.Rule(
            S.rule_id(S.BAD_SHAPE, f"{col}.items"),
            f"{col}.items",
            f"{col} has tuple position(s) violating their item schemas",
            pred,
        )
    )

    if additional is False:
        rs.add(
            R.Rule(
                S.rule_id(S.BAD_SHAPE, f"{col}.additionalItems"),
                f"{col}.additionalItems",
                f"{col} longer than its {n} tuple positions (additionalItems: false)",
                lambda: F.col(col).isNotNull() & (F.size(F.col(col)) > n),
            )
        )
    elif isinstance(additional, dict):
        sat, desc = _element_satisfies(
            additional, f"{col}.additionalItems", unsupported
        )
        rs.add(
            R.Rule(
                S.rule_id(S.BAD_SHAPE, f"{col}.additionalItems"),
                f"{col}.additionalItems",
                f"{col} has tail element(s) beyond position {n} violating: {desc}",
                lambda: F.col(col).isNotNull()
                & F.exists(
                    F.slice(
                        F.col(col),
                        F.lit(n + 1),
                        F.greatest(F.size(F.col(col)) - n, F.lit(0)),
                    ),
                    lambda e: ~F.coalesce(sat(e), F.lit(False)),
                ),
            )
        )
    elif additional not in (None, True):
        unsupported.append(f"{col}.additionalItems:{additional!r}")


def _compile_scalar(
    rs: "R.RuleSet",
    unsupported: list[str],
    path: str,
    spec: dict,
    in_branch: bool = False,
) -> None:
    """Keyword loop for one non-object property at dotted path ``path``.

    ``in_branch=True`` (combinator branch compilation) additionally
    compiles ``type`` into a runtime typeof()+nullness predicate — see
    ``_subrules`` for why branches need it and the main path doesn't."""
    for kw, val in spec.items():
        if kw == "enum":
            rs.add(R.is_in(path, val))
        elif kw in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum"):
            pass  # handled together below (_bounds)
        elif kw == "pattern":
            rs.add(R.matches(path, val))
        elif kw == "format":
            if val == "uuid":
                rs.add(R.matches(path, S.UUID_RE))
            else:
                unsupported.append(f"{path}.format:{val}")
        elif kw == "minLength":
            # faithful draft-06 semantics: raw length, no trimming
            rs.add(R.min_length(path, int(val)))
        elif kw == "maxLength":
            rs.add(R.max_length(path, int(val)))
        elif kw == "const":
            rs.add(R.const_value(path, val))
        elif kw == "multipleOf":
            if isinstance(val, int) and not isinstance(val, bool) and val > 0:
                rs.add(R.multiple_of(path, val))
            else:
                unsupported.append(f"{path}.multipleOf:{val}")
        elif kw in ("minItems", "maxItems"):
            pass  # handled together below
        elif kw == "contains":
            if isinstance(val, dict):
                pred, desc = _element_satisfies(
                    val, f"{path}.contains", unsupported)
                rs.add(R.contains_match(path, pred, desc))
            else:
                unsupported.append(f"{path}.contains:{val!r}")
        elif kw == "uniqueItems":
            if val:
                rs.add(R.unique_items(path))
        elif kw == "items":
            if isinstance(val, list):
                # tuple validation (draft-06 positional items) — compiled
                # together with additionalItems below
                _compile_tuple_items(
                    rs, unsupported, path, val, spec.get("additionalItems")
                )
            elif isinstance(val, dict) and set(val) <= {"enum", "type"}:
                if "enum" in val:
                    rs.add(R.elements_in(path, val["enum"]))
            elif (
                isinstance(val, dict)
                and val.get("type") == "object"
                and (
                    "properties" in val
                    or "required" in val
                    or any(k in val for k in ("allOf", "anyOf", "oneOf", "not"))
                )
            ):
                _compile_items(rs, unsupported, path, val)
            else:
                unsupported.append(f"{path}.items")
        elif kw == "additionalItems":
            # draft-06: only meaningful next to items-as-list (consumed by
            # _compile_tuple_items above); with single-schema or absent
            # ``items`` the keyword is DEFINED to be ignored — this pass
            # is faithful semantics, not a silent drop.
            pass
        elif kw == "type":
            if in_branch:
                tl = _check_type_names(val, path, unsupported)
                if tl is not None:
                    sat = _type_sat(tl)
                    rs.add(
                        R.Rule(
                            S.rule_id(S.BAD_TYPE, path),
                            path,
                            f"{path} is not of JSON type {tl}",
                            lambda sat=sat: ~sat(F.col(path)),
                        )
                    )
            # main path: structural — enforced by the strict read schema
        elif kw in _COMBINATOR_KEYS:
            pass  # handled together below (_compile_combinators)
        elif kw in _ANNOTATIONS:
            pass  # annotations
        else:
            unsupported.append(f"{path}.{kw}")

    lo, lo_inc, hi, hi_inc = _bounds(spec)
    if lo is not None or hi is not None:
        rs.add(R.in_range(path, lo=lo, hi=hi, lo_inclusive=lo_inc, hi_inclusive=hi_inc))
    if "minItems" in spec or "maxItems" in spec:
        rs.add(
            R.array_size(
                path, min_items=spec.get("minItems"), max_items=spec.get("maxItems")
            )
        )
    if any(k in spec for k in _COMBINATOR_KEYS):
        _compile_combinators(rs, unsupported, spec, "", None, scalar_path=path)


# object-level keywords _compile_object consumes (or legitimately treats
# as structural/annotation). Anything else is reported in ``unsupported``
# — never silently dropped.
_OBJECT_KEYS = (
    "type",
    "properties",
    "required",
    "additionalProperties",  # enforced by the strict read schema (P7)
    "definitions",  # inert after resolve_refs() inlining
    "patternProperties",
    "propertyNames",
    "minProperties",
    "maxProperties",
    *_COMBINATOR_KEYS,
    *_ANNOTATIONS,
)


def _name_satisfies(pn: dict, name: str, where: str, unsupported: list[str]) -> bool:
    """Evaluate a ``propertyNames`` subschema against one property NAME at
    COMPILE time — names are static under a strict read schema, so no
    runtime expression is needed; an offending name compiles to a
    presence-is-violation rule."""
    ok = True
    for kw, val in pn.items():
        if kw == "pattern":
            ok = ok and re.search(val, name) is not None
        elif kw == "minLength":
            ok = ok and len(name) >= int(val)
        elif kw == "maxLength":
            ok = ok and len(name) <= int(val)
        elif kw == "enum":
            ok = ok and name in list(val)
        elif kw == "const":
            ok = ok and name == val
        elif kw == "type":
            tl = [val] if isinstance(val, str) else list(val)
            ok = ok and "string" in tl  # property names are always strings
        elif kw in _ANNOTATIONS:
            pass
        else:
            unsupported.append(f"{where}.propertyNames.{kw}")
    return ok


def _compile_object(
    rs: "R.RuleSet",
    unsupported: list[str],
    schema: dict,
    prefix: str,
    parent: str | None,
    in_branch: bool = False,
) -> None:
    """Recurse an object schema: dotted-path rules for nested properties.

    The reference walks the FULL instance per record (mds/schemas.py
    ≈L150-220 via jsonschema) — nested GeoJSON specs included. Catalyst
    struct-field access makes the nested restatement free: a rule on
    ``event_location.geometry.type`` prunes and codegens exactly like a
    top-level column. Nested ``required`` is guarded on the enclosing
    object being present (jsonschema only evaluates subschemas against
    instances that HAVE the property).

    ``patternProperties`` / ``propertyNames`` / ``minProperties`` /
    ``maxProperties`` compile against the DECLARED property-name universe:
    under the engine's strict read schema the struct fields are exactly
    the declared properties, so name-keyed keywords resolve statically
    (patterns evaluated with Python ``re`` at compile time) and only the
    per-row presence (non-null) is decided at runtime."""
    props: dict = schema.get("properties", {})
    required = schema.get("required", [])
    where = prefix.rstrip(".") or "$"

    for kw in schema:
        if kw not in _OBJECT_KEYS:
            unsupported.append(f"{where}.{kw}")

    if any(k in schema for k in _COMBINATOR_KEYS):
        _compile_combinators(rs, unsupported, schema, prefix, parent)

    for name in required:
        path = f"{prefix}{name}"
        rs.add(R.not_null(path) if parent is None else R.nested_required(path, parent))

    # name-keyed keywords against the static declared-name universe
    pat_props = schema.get("patternProperties")
    if isinstance(pat_props, dict):
        if not props:
            unsupported.append(f"{where}.patternProperties")
        else:
            for pat, subspec in pat_props.items():
                if not isinstance(subspec, dict):
                    unsupported.append(f"{where}.patternProperties:{pat}")
                    continue
                for name in props:
                    if re.search(pat, name) is None:
                        continue
                    path = f"{prefix}{name}"
                    # applies IN ADDITION to the properties subschema
                    if subspec.get("type") == "object":
                        _compile_object(
                            rs, unsupported, subspec,
                            prefix=f"{path}.", parent=path, in_branch=in_branch,
                        )
                    else:
                        _compile_scalar(
                            rs, unsupported, path, subspec, in_branch=in_branch
                        )
    elif pat_props is not None:
        unsupported.append(f"{where}.patternProperties")

    pn = schema.get("propertyNames")
    if isinstance(pn, dict):
        if not props:
            unsupported.append(f"{where}.propertyNames")
        for name in props:
            if _name_satisfies(pn, name, where, unsupported):
                continue
            path = f"{prefix}{name}"
            rs.add(
                R.Rule(
                    S.rule_id(S.BAD_FORMAT, path),
                    path,
                    f"property name {name!r} violates propertyNames schema",
                    lambda path=path: F.col(path).isNotNull(),
                )
            )
    elif pn is not None and pn is not True:
        unsupported.append(f"{where}.propertyNames")

    if "minProperties" in schema or "maxProperties" in schema:
        if not props:
            # report exactly the keyword(s) actually present — naming a
            # keyword the schema doesn't contain sends the author hunting
            for kw in ("minProperties", "maxProperties"):
                if kw in schema:
                    unsupported.append(f"{where}.{kw}")
        else:
            lo = schema.get("minProperties")
            hi = schema.get("maxProperties")
            paths = [f"{prefix}{n}" for n in props]

            def n_present():
                out = F.lit(0)
                for p in paths:
                    out = out + F.col(p).isNotNull().cast("int")
                return out

            def pred(lo=lo, hi=hi):
                cond = F.lit(False)
                if lo is not None:
                    cond = cond | (n_present() < int(lo))
                if hi is not None:
                    cond = cond | (n_present() > int(hi))
                if parent is not None:
                    cond = F.col(parent).isNotNull() & cond
                return cond

            rs.add(
                R.Rule(
                    S.rule_id(S.BAD_SHAPE, f"{where}.properties"),
                    f"{where}.properties",
                    f"{where} present-property count outside [{lo},{hi}]",
                    pred,
                )
            )

    for name, spec in props.items():
        path = f"{prefix}{name}"
        if not isinstance(spec, dict):
            unsupported.append(path)
            continue
        if spec.get("type") == "object":
            # recurse — the object-level keyword sweep and every
            # name-keyed keyword are handled inside the recursion
            _compile_object(
                rs, unsupported, spec,
                prefix=f"{path}.", parent=path, in_branch=in_branch,
            )
            continue
        _compile_scalar(rs, unsupported, path, spec, in_branch=in_branch)


def _element_branch_violation(obj_spec: dict, fpath: tuple, where: str,
                              unsupported: list[str]):
    """Per-ELEMENT branch violation for combinators inside an ``items``
    object schema (e.g. GeoJSON's oneOf over geometry types): returns a
    deferred x -> Column that is True iff array element ``x`` violates
    ``obj_spec`` (fields addressed relative to the element via
    ``fpath``). Mirrors jsonschema: a field absent on the element is
    only a violation under ``required``. Nested combinators at the
    branch root (allOf/anyOf/oneOf/not) recurse; any other branch-root
    keyword is reported unsupported — never silently dropped."""
    from mds_provider_spark import rules as RR

    makers = []  # list of deferred (x -> Column) violation fragments

    def field(x, fp):
        return RR._epath(x, fp)

    # nested combinators inside the branch recurse on the SAME element
    for kind in ("allOf", "anyOf", "oneOf", "not"):
        if kind not in obj_spec:
            continue
        branches = [obj_spec["not"]] if kind == "not" else obj_spec[kind]
        subs = [
            _element_branch_violation(s, fpath, f"{where}.{kind}", unsupported)
            for s in branches
        ]
        makers.append(_combinator_fold(kind, subs))
    # branch-root ``type``: discriminating inside combinators (same fix
    # as _subrules) — the instance is the element (or its sub-struct)
    if "type" in obj_spec:
        tl = _check_type_names(obj_spec["type"], where, unsupported)
        if tl is not None:
            root_sat = _type_sat(tl)
            makers.append(
                lambda x, sat=root_sat: ~sat(x if not fpath else field(x, fpath))
            )
    for kw in obj_spec:
        if kw not in (
            "properties", "required", "type", "additionalProperties",
            "allOf", "anyOf", "oneOf", "not", *_ANNOTATIONS,
        ):
            unsupported.append(f"{where}.{kw}")

    for f in obj_spec.get("required", []):
        makers.append(lambda x, fp=fpath + (f,): field(x, fp).isNull())
    for f, fs in obj_spec.get("properties", {}).items():
        fp = fpath + (f,)
        if not isinstance(fs, dict):
            unsupported.append(f"{where}.{f}")
            continue
        if fs.get("type") == "object":
            inner = _element_branch_violation(fs, fp, f"{where}.{f}", unsupported)
            makers.append(lambda x, fp=fp, inner=inner:
                          field(x, fp).isNotNull() & inner(x))
            continue
        for kw, val in fs.items():
            if kw == "enum":
                makers.append(lambda x, fp=fp, v=list(val):
                              field(x, fp).isNotNull()
                              & ~F.array_contains(
                                  F.array(*[F.lit(e) for e in v]), field(x, fp)))
            elif kw == "const":
                makers.append(lambda x, fp=fp, v=val:
                              field(x, fp).isNotNull() & (field(x, fp) != F.lit(v)))
            elif kw == "pattern":
                makers.append(lambda x, fp=fp, v=val:
                              field(x, fp).isNotNull() & ~field(x, fp).rlike(v))
            elif kw == "minLength":
                makers.append(lambda x, fp=fp, v=int(val):
                              field(x, fp).isNotNull()
                              & (F.length(field(x, fp)) < v))
            elif kw in ("minimum", "maximum", "exclusiveMinimum",
                        "exclusiveMaximum"):
                pass  # together below
            elif kw in ("minItems", "maxItems"):
                pass  # together below
            elif kw == "type":
                # field-level type inside a branch: evaluated only when
                # the field is present (matching every other field
                # keyword here — present-null conflation documented)
                tl = _check_type_names(val, f"{where}.{f}", unsupported)
                if tl is not None:
                    makers.append(
                        lambda x, fp=fp, sat=_type_sat(tl):
                        field(x, fp).isNotNull() & ~sat(field(x, fp))
                    )
            elif kw in _ANNOTATIONS:
                pass
            else:
                unsupported.append(f"{where}.{f}.{kw}")
        lo, lo_inc, hi, hi_inc = _bounds(fs)
        if lo is not None:
            makers.append(lambda x, fp=fp, v=lo, inc=lo_inc:
                          field(x, fp).isNotNull()
                          & ((field(x, fp) < v) if inc else (field(x, fp) <= v)))
        if hi is not None:
            makers.append(lambda x, fp=fp, v=hi, inc=hi_inc:
                          field(x, fp).isNotNull()
                          & ((field(x, fp) > v) if inc else (field(x, fp) >= v)))
        if "minItems" in fs:
            makers.append(lambda x, fp=fp, v=int(fs["minItems"]):
                          field(x, fp).isNotNull() & (F.size(field(x, fp)) < v))
        if "maxItems" in fs:
            makers.append(lambda x, fp=fp, v=int(fs["maxItems"]):
                          field(x, fp).isNotNull() & (F.size(field(x, fp)) > v))

    def viol(x):
        out = F.lit(False)
        for m in makers:
            out = out | F.coalesce(m(x), F.lit(False))
        return out

    return viol


def _compile_items(
    rs: "R.RuleSet", unsupported: list[str], col: str, items_spec: dict
) -> None:
    """``items`` with an object schema (array<struct>): compile the
    element-level keyword subset as ONE ``exists``/``forall`` loop per
    rule over the array column — no explode, no shuffle. Field paths may
    nest (e.g. route.features[].geometry.type)."""

    def elem_guard(x, fpath: tuple):
        return R._epath(x, fpath).isNotNull() if fpath else x.isNotNull()

    def add_elem_combinators(obj_spec: dict, fpath: tuple) -> None:
        """Combinators INSIDE the element schema (e.g. GeoJSON's oneOf
        over geometry types): one exists-loop rule per combinator, fused
        into the same projection — a row fires when ANY element violates
        the construct."""
        base = R._edotted(col, fpath) if fpath else f"{col}[]"
        for kw in ("anyOf", "oneOf", "not"):
            if kw not in obj_spec:
                continue
            branches = (
                [obj_spec["not"]] if kw == "not" else obj_spec[kw]
            )
            viols = [
                _element_branch_violation(b, fpath, f"{base}.{kw}", unsupported)
                for b in branches
            ]
            name = f"{base}.{kw}"
            bad = _combinator_fold(kw, viols)
            msg = {
                "anyOf": f"{base} has element(s) matching none of {len(viols)} anyOf branches",
                "oneOf": f"{base} has element(s) not matching exactly one of {len(viols)} oneOf branches",
                "not": f"{base} has element(s) matching a forbidden (not) schema",
            }[kw]

            def pred(bad=bad, fpath=fpath):
                return _nn_items(
                    F.exists(
                        F.col(col), lambda x: elem_guard(x, fpath) & bad(x)
                    )
                )

            rs.add(R.Rule(S.rule_id(S.COMBINATOR, name), name, msg, pred))
        for kw in ("dependencies", "if", "then", "else"):
            if kw in obj_spec:
                unsupported.append(f"{base}.{kw}")

    def _nn_items(c):
        return F.col(col).isNotNull() & F.coalesce(c, F.lit(False))

    def walk(obj_spec: dict, fpath: tuple, parent_fpath: tuple | None) -> None:
        for branch in obj_spec.get("allOf", []):
            walk(branch, fpath, parent_fpath)  # conjunction = rule union
        add_elem_combinators(obj_spec, fpath)
        for f in obj_spec.get("required", []):
            rs.add(R.element_required(col, fpath + (f,), parent_fpath))
        for f, fs in obj_spec.get("properties", {}).items():
            fp = fpath + (f,)
            dotted = f"{col}[].{'.'.join(fp)}"
            if not isinstance(fs, dict):
                unsupported.append(dotted)
                continue
            if fs.get("type") == "object":
                if (
                    "properties" in fs
                    or "required" in fs
                    or any(k in fs for k in ("allOf", "anyOf", "oneOf", "not"))
                ):
                    walk(fs, fp, fp)
                for kw in fs:
                    if kw not in (
                        "type", "properties", "required", "additionalProperties",
                        "allOf", "anyOf", "oneOf", "not",
                        *_ANNOTATIONS,
                    ):
                        unsupported.append(f"{dotted}.{kw}")
                continue
            for kw, val in fs.items():
                if kw == "enum":
                    rs.add(R.element_in(col, fp, val))
                elif kw == "pattern":
                    rs.add(R.element_matches(col, fp, val))
                elif kw == "format":
                    if val == "uuid":
                        rs.add(R.element_matches(col, fp, S.UUID_RE))
                    else:
                        unsupported.append(f"{dotted}.format:{val}")
                elif kw == "const":
                    rs.add(R.element_const(col, fp, val))
                elif kw in (
                    "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
                    "minItems", "maxItems",
                ):
                    pass  # handled together below
                elif kw in ("allOf", "anyOf", "oneOf", "not"):
                    pass  # handled together below (field-level combinators)
                elif kw == "contains":
                    if isinstance(val, dict):
                        sat, desc = _element_satisfies(
                            val, f"{dotted}.contains", unsupported)
                        rs.add(
                            R.Rule(
                                S.rule_id(S.BAD_SHAPE, dotted),
                                dotted,
                                f"{dotted} has element array(s) with no entry matching: {desc}",
                                # exists(outer array, element whose FIELD array
                                # is present but contains no satisfying entry)
                                lambda fp=fp, sat=sat: _nn_items(
                                    F.exists(
                                        F.col(col),
                                        lambda x: R._epath(x, fp).isNotNull()
                                        & ~F.exists(
                                            R._epath(x, fp),
                                            # null entries per jsonschema:
                                            # sat() fragments decide
                                            lambda e: F.coalesce(
                                                sat(e), F.lit(False)
                                            ),
                                        ),
                                    )
                                ),
                            )
                        )
                    else:
                        unsupported.append(f"{dotted}.contains:{val!r}")
                elif kw == "type" or kw in _ANNOTATIONS:
                    pass
                else:
                    unsupported.append(f"{dotted}.{kw}")
            lo, lo_inc, hi, hi_inc = _bounds(fs)
            if lo is not None or hi is not None:
                rs.add(
                    R.element_in_range(
                        col, fp, lo=lo, hi=hi, lo_inclusive=lo_inc, hi_inclusive=hi_inc
                    )
                )
            if "minItems" in fs or "maxItems" in fs:
                rs.add(
                    R.element_array_size(
                        col, fp, min_items=fs.get("minItems"), max_items=fs.get("maxItems")
                    )
                )
            if any(k in fs for k in ("allOf", "anyOf", "oneOf", "not")):
                add_field_combinators(fs, f, fp, dotted)

    def add_field_combinators(fs: dict, fname: str, fp: tuple, dotted: str) -> None:
        """Combinators on a scalar FIELD of an array element (e.g.
        features[].coords with anyOf of range branches). Branches are
        scalar specs for that field; jsonschema evaluates them only when
        the field is present on the element — guarded the same way.
        Reuses _element_branch_violation by wrapping each branch as
        {properties: {field: branch}}."""

        def field_viols(branches):
            return [
                _element_branch_violation(
                    {"properties": {fname: b}}, fp[:-1], dotted, unsupported
                )
                for b in branches
            ]

        for kw in ("anyOf", "oneOf", "not", "allOf"):
            if kw not in fs:
                continue
            branches = [fs["not"]] if kw == "not" else fs[kw]
            viols = field_viols(branches)
            name = f"{dotted}.{kw}"
            bad = _combinator_fold(kw, viols)
            msg = {
                "allOf": f"{dotted} has element field(s) violating an allOf branch",
                "anyOf": f"{dotted} has element field(s) matching none of {len(viols)} anyOf branches",
                "oneOf": f"{dotted} has element field(s) not matching exactly one of {len(viols)} oneOf branches",
                "not": f"{dotted} has element field(s) matching a forbidden (not) schema",
            }[kw]

            def pred(bad=bad, fp=fp):
                return _nn_items(
                    F.exists(
                        F.col(col),
                        lambda x: R._epath(x, fp).isNotNull() & bad(x),
                    )
                )

            rs.add(R.Rule(S.rule_id(S.COMBINATOR, name), name, msg, pred))

    walk(items_spec, (), None)


# dict-valued keywords whose VALUES are name->schema maps (keys are data,
# not schemas — a property literally named "$ref" must not be resolved)
_SCHEMA_MAPS = ("properties", "patternProperties", "definitions")


def resolve_refs(schema: dict, max_depth: int = 64) -> dict:
    """Inline internal JSON-Pointer references (``#/definitions/...`` and
    any other ``#/``-rooted pointer) so the rest of the compiler never
    sees ``$ref``. The raw MDS schema documents the reference fetches
    (mds/schemas.py ≈L30–90 — raw GitHub JSON) carry a ``definitions``
    section addressed this way.

    Draft-06 semantics, matching ``jsonschema.Draft6Validator``: a schema
    object containing ``$ref`` IS the referenced schema — sibling
    keywords are ignored. Cyclic references raise (a recursive schema has
    no bounded row-rule form — better loud than a silently-partial rule
    set), as do external (non-``#``) references and pointers with no
    target. ``enum``/``const``/``default``/``examples`` values are data
    and are copied verbatim, never dereferenced.
    """

    def deref(ptr: str):
        if not ptr.startswith("#"):
            raise ValueError(f"external $ref not resolvable: {ptr}")
        node = schema
        for tok in ptr[1:].split("/"):
            if not tok:
                continue
            tok = tok.replace("~1", "/").replace("~0", "~")
            if isinstance(node, list):
                try:
                    node = node[int(tok)]
                except (ValueError, IndexError):
                    raise ValueError(f"$ref target not found: {ptr}") from None
            elif isinstance(node, dict) and tok in node:
                node = node[tok]
            else:
                raise ValueError(f"$ref target not found: {ptr}")
        return node

    def walk(node, active: frozenset, depth: int, is_schema: bool):
        # ``depth`` counts $ref EXPANSIONS only (never plain tree
        # nesting): a deeply-nested but ref-free schema must not trip
        # the guard — it bounds chained expansions that the cycle set
        # cannot (a->b->c->... of distinct pointers).
        if isinstance(node, dict):
            if is_schema and isinstance(node.get("$ref"), str):
                ptr = node["$ref"]
                if ptr in active:
                    raise ValueError(f"cyclic $ref: {ptr}")
                if depth >= max_depth:
                    raise ValueError(
                        f"$ref expansion exceeds depth {max_depth}: {ptr}")
                return walk(deref(ptr), active | {ptr}, depth + 1, True)
            out = {}
            for k, v in node.items():
                if is_schema and k in _SCHEMA_MAPS and isinstance(v, dict):
                    out[k] = {
                        pk: walk(pv, active, depth, True)
                        for pk, pv in v.items()
                    }
                elif is_schema and k == "dependencies" and isinstance(v, dict):
                    out[k] = {
                        pk: (
                            walk(pv, active, depth, True)
                            if isinstance(pv, dict)
                            else pv
                        )
                        for pk, pv in v.items()
                    }
                elif is_schema and k in ("enum", "const", "default", "examples"):
                    out[k] = v  # data, not schema
                else:
                    out[k] = walk(v, active, depth, is_schema)
            return out
        if isinstance(node, list):
            return [walk(v, active, depth, is_schema) for v in node]
        return node

    return walk(schema, frozenset(), 0, True)


def from_json_schema(
    schema: dict,
    key_col: str,
    part_col: str = "part_id",
    unique: Sequence[str] | None = None,
    strict: bool = True,
) -> tuple[R.RuleSet, list[str]]:
    """Compile an object schema (nested objects and object-arrays
    included) into a RuleSet. Internal ``$ref``s are inlined first
    (``resolve_refs``), so RAW fetched MDS schema documents — which carry
    ``definitions`` + ``#/definitions/...`` pointers — compile unmodified.

    Returns (ruleset, unsupported) where ``unsupported`` lists keyword
    paths that have no row-level Catalyst mapping. ``strict=True`` raises
    on unsupported keywords instead.
    """
    if schema.get("type") not in (None, "object"):
        raise ValueError("top-level schema must be an object schema")

    schema = resolve_refs(schema)
    rs = R.RuleSet(key_col=key_col, part_col=part_col)
    unsupported: list[str] = []
    _compile_object(rs, unsupported, schema, prefix="", parent=None)

    for cols in unique or []:
        rs.add(R.unique_key(cols))

    if strict and unsupported:
        raise ValueError(f"unsupported JSON-Schema keywords: {unsupported}")
    return rs, unsupported
