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


def parse_boundary_geojson(geojson_text: str) -> list[tuple[float, float]]:
    """Boundary file (GeoJSON Polygon / Feature<Polygon>) -> ring coords."""
    obj = json.loads(geojson_text)
    if obj.get("type") == "Feature":
        obj = obj["geometry"]
    if obj.get("type") != "Polygon":
        raise ValueError(f"expected Polygon, got {obj.get('type')!r}")
    return [(float(x), float(y)) for x, y in obj["coordinates"][0]]


def point_in_polygon(lon: Column, lat: Column, polygon: Column) -> Column:
    """Ray-casting point-in-polygon, pure Catalyst.

    Counts edges crossed by a horizontal ray from the point: fold over
    consecutive vertex pairs with ``aggregate``; odd crossings = inside.
    Edges are formed by zipping the ring with itself shifted by one.
    """
    n = F.size(polygon)
    shifted = F.concat(F.slice(polygon, F.lit(2), n - 1), F.slice(polygon, 1, 1))
    edges = F.zip_with(
        polygon, shifted, lambda a, b: F.struct(a.alias("p"), b.alias("q"))
    )

    def crosses(e: Column) -> Column:
        x1, y1 = e["p"]["x"], e["p"]["y"]
        x2, y2 = e["q"]["x"], e["q"]["y"]
        straddles = (y1 > lat) != (y2 > lat)
        x_at_lat = x1 + (lat - y1) / (y2 - y1) * (x2 - x1)
        return straddles & (lon < x_at_lat)

    crossings = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc + F.when(crosses(e), F.lit(1)).otherwise(F.lit(0)),
    )
    return (crossings % 2) == 1


def outside_boundary_violations(
    df, lon_col: str, lat_col: str, boundary: list[tuple[float, float]],
    key_col: str = "clip_id", part_col: str = "part_id",
):
    """Boundary-filter rule (P9): rows outside the polygon, canonical shape."""
    poly = polygon_literal(boundary)
    return (
        df.where(
            F.col(lon_col).isNotNull()
            & F.col(lat_col).isNotNull()
            & ~point_in_polygon(F.col(lon_col), F.col(lat_col), poly)
        )
        .select(
            F.lit(f"outside_boundary:{lon_col},{lat_col}").alias("rule_id"),
            F.col(key_col).cast("string").alias("clip_id"),
            F.lit(f"{lon_col},{lat_col}").alias("column_name"),
            F.lit("point outside boundary polygon").alias("message"),
            F.col(part_col).alias("part_id"),
        )
    )
