"""GeoJSON geometry handling — parity with mds/geometry.py (≈L10–100:
``extract_point``, ``to_feature``, ``parse_boundary`` + point-in-boundary
filtering; the reference bridges dict GeoJSON <-> shapely one object at a
time).

Spark-native: GeoJSON stays a typed Struct column (from_json / to_json at
the boundary), and point-in-polygon is a PURE CATALYST ray-casting
expression over an array of polygon vertices — no shapely, no UDF, so the
boundary filter runs inside whole-stage codegen and can gate 10^12 rows.
(Production systems with complex multipolygons would use Sedona/H3; this
covers the reference's single-boundary use case.)
"""

from __future__ import annotations

import json

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

# GeoJSON Feature<Point> with a timestamp property — the shape of MDS
# `event_location` and `route.features[]` entries.
POINT_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "geometry",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("coordinates", T.ArrayType(T.DoubleType())),
                ]
            ),
        ),
        T.StructField(
            "properties",
            T.StructType([T.StructField("timestamp", T.LongType())]),
        ),
    ]
)


def parse_point_feature(col: Column | str) -> Column:
    """GeoJSON Feature JSON string -> typed struct (extract_point analog)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, POINT_FEATURE_SCHEMA)


def point_lon(feature: Column) -> Column:
    return feature["geometry"]["coordinates"][0]


def point_lat(feature: Column) -> Column:
    return feature["geometry"]["coordinates"][1]


def to_feature_json(lon: Column, lat: Column, ts_ms: Column | None = None) -> Column:
    """(lon, lat[, ts]) -> GeoJSON Feature JSON string (to_feature analog)."""
    props = (
        F.struct(ts_ms.alias("timestamp"))
        if ts_ms is not None
        else F.struct(F.lit(None).cast("long").alias("timestamp"))
    )
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Point").alias("type"),
                F.array(lon, lat).alias("coordinates"),
            ).alias("geometry"),
            props.alias("properties"),
        )
    )


def polygon_literal(coords: list[tuple[float, float]]) -> Column:
    """Closed polygon ring -> array<struct<x,y>> literal (parse_boundary
    analog — the reference loads the city boundary once at startup; we
    bind it as a broadcast-free literal in the plan)."""
    return F.array(
        *[
            F.struct(F.lit(float(x)).alias("x"), F.lit(float(y)).alias("y"))
            for x, y in coords
        ]
    )


def rings_literal(rings: list[list[tuple[float, float]]]) -> Column:
    """Multipolygon boundary -> array<array<struct<x,y>>> literal: every
    ring (outer shells AND holes, across all polygons) flattened into
    one ring array — the even-odd rule below needs no shell/hole
    distinction."""
    return F.array(*[polygon_literal(r) for r in rings])


def parse_boundary_geojson(geojson_text: str) -> list[tuple[float, float]]:
    """Boundary file (GeoJSON Polygon / Feature<Polygon>) -> ring coords."""
    obj = json.loads(geojson_text)
    if obj.get("type") == "Feature":
        obj = obj["geometry"]
    if obj.get("type") != "Polygon":
        raise ValueError(f"expected Polygon, got {obj.get('type')!r}")
    return [(float(x), float(y)) for x, y in obj["coordinates"][0]]


def parse_boundary_rings(geojson_text: str) -> list[list[tuple[float, float]]]:
    """Full ``parse_boundary`` parity (mds/geometry.py ≈L40-100 accepts
    FeatureCollection city boundaries): GeoJSON Polygon / MultiPolygon /
    Feature / FeatureCollection -> flat list of rings, holes included.
    Real city boundaries are multipolygons with holes; under the
    even-odd rule a flat ring list is all the filter needs."""
    obj = json.loads(geojson_text)
    rings: list[list[tuple[float, float]]] = []

    def add_geometry(g: dict) -> None:
        t = g.get("type")
        if t == "Polygon":
            for ring in g["coordinates"]:
                rings.append([(float(x), float(y)) for x, y in ring])
        elif t == "MultiPolygon":
            for poly in g["coordinates"]:
                for ring in poly:
                    rings.append([(float(x), float(y)) for x, y in ring])
        else:
            raise ValueError(f"expected (Multi)Polygon geometry, got {t!r}")

    if obj.get("type") == "FeatureCollection":
        for feat in obj["features"]:
            add_geometry(feat["geometry"])
    elif obj.get("type") == "Feature":
        add_geometry(obj["geometry"])
    else:
        add_geometry(obj)
    if not rings:
        raise ValueError("boundary contains no rings")
    return rings


def _ring_crossings(lon: Column, lat: Column, ring: Column) -> Column:
    """Horizontal-ray crossing count for ONE ring (the point-in-polygon
    kernel; operation order fixed so SQL oracles replay bit-exactly)."""
    n = F.size(ring)
    shifted = F.concat(F.slice(ring, F.lit(2), n - 1), F.slice(ring, 1, 1))
    edges = F.zip_with(
        ring, shifted, lambda a, b: F.struct(a.alias("p"), b.alias("q"))
    )

    def crosses(e: Column) -> Column:
        x1, y1 = e["p"]["x"], e["p"]["y"]
        x2, y2 = e["q"]["x"], e["q"]["y"]
        straddles = (y1 > lat) != (y2 > lat)
        x_at_lat = x1 + (lat - y1) / (y2 - y1) * (x2 - x1)
        return straddles & (lon < x_at_lat)

    return F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc + F.when(crosses(e), F.lit(1)).otherwise(F.lit(0)),
    )


def point_in_polygon(lon: Column, lat: Column, polygon: Column) -> Column:
    """Ray-casting point-in-polygon, pure Catalyst.

    Counts edges crossed by a horizontal ray from the point: fold over
    consecutive vertex pairs with ``aggregate``; odd crossings = inside.
    Edges are formed by zipping the ring with itself shifted by one.
    """
    return (_ring_crossings(lon, lat, polygon) % 2) == 1


def point_in_rings(lon: Column, lat: Column, rings: Column) -> Column:
    """Even-odd point-in-multipolygon over ``rings_literal`` rings, pure
    Catalyst (a fold of per-ring folds — still one codegen'd projection,
    no UDF, no shuffle).

    The even-odd rule makes holes and disjoint shells uniform: total
    crossings over ALL rings odd == inside. A point inside a hole
    crosses the shell (odd) and the hole ring (odd again) -> even ->
    outside, with no winding/orientation bookkeeping — which is also
    why SQL oracles can replay it as one flat edge list."""
    total = F.aggregate(
        rings,
        F.lit(0),
        lambda acc, ring: acc + _ring_crossings(lon, lat, ring),
    )
    return (total % 2) == 1


def outside_boundary_violations(
    df, lon_col: str, lat_col: str, boundary,
    key_col: str = "clip_id", part_col: str = "part_id",
):
    """Boundary-filter rule (P9): rows outside the boundary, canonical
    violation shape. ``boundary`` is either a single ring
    (``[(x, y), ...]`` — the round-1 contract, unchanged) or a list of
    rings (``[[(x, y), ...], ...]`` from ``parse_boundary_rings`` —
    multipolygons with holes, even-odd rule)."""
    if boundary and isinstance(boundary[0][0], (tuple, list)):
        inside = point_in_rings(
            F.col(lon_col), F.col(lat_col), rings_literal(boundary)
        )
    else:
        inside = point_in_polygon(
            F.col(lon_col), F.col(lat_col), polygon_literal(boundary)
        )
    return (
        df.where(
            F.col(lon_col).isNotNull()
            & F.col(lat_col).isNotNull()
            & ~inside
        )
        .select(
            F.lit(f"outside_boundary:{lon_col},{lat_col}").alias("rule_id"),
            F.col(key_col).cast("string").alias("clip_id"),
            F.lit(f"{lon_col},{lat_col}").alias("column_name"),
            F.lit("point outside boundary polygon").alias("message"),
            F.col(part_col).alias("part_id"),
        )
    )
