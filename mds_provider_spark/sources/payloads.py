"""MDS payload JSON source/sink — parity with mds/files.py DataFile
(≈L60–330: load_payloads / load_records / load_dataframe / dump_payloads).

The reference walks JSON payload files shaped
``{"version": "x.y.z", "data": {"<record_type>": [records...]}}``
(optionally a list of such pages) one dict at a time. Spark-native:
``spark.read.json`` with an explicit schema (never schema inference over
100 TB), ``explode`` as the payload->records fan-out (the reference's
UDTF analog, SURVEY.md §2.10), and version gating as a DataFrame filter
that REPORTS unsupported rows instead of raising mid-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

RECORD_TYPES = ["trips", "status_changes", "events", "vehicles"]

# Version support range — parity with mds/versions.py Version.supported.
SUPPORTED_VERSIONS = ("0.2.0", "0.4.99")


def payload_schema(record_schema: T.StructType, record_type: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField("version", T.StringType()),
            T.StructField(
                "data",
                T.StructType(
                    [T.StructField(record_type, T.ArrayType(record_schema))]
                ),
            ),
        ]
    )


def _version_key(v):
    # pad to exactly 3 components so '0.2' keys equal to '0.2.0' —
    # mirrors functions/versions.Version's `int(m.group(3) or 0)`
    parts = F.transform(F.split(v, r"\."), lambda p: F.lpad(p, 5, "0"))
    pad = F.array(F.lit("00000"), F.lit("00000"))
    return F.slice(F.concat(parts, pad), 1, 3)


def load_records(
    spark: SparkSession,
    paths: str | list[str],
    record_type: str,
    record_schema: T.StructType,
    enforce_version: bool = True,
) -> DataFrame:
    """Payload files -> one row per record, with the payload version
    carried on every row (the reference attaches Version to the payload;
    we denormalize it so downstream rules can gate per-row)."""
    raw = spark.read.schema(payload_schema(record_schema, record_type)).json(paths)
    rec = raw.select(
        F.col("version"),
        F.explode(F.col(f"data.{record_type}")).alias("r"),
    ).select("version", "r.*")
    if enforce_version:
        lo, hi = SUPPORTED_VERSIONS
        ok = (_version_key(F.col("version")) >= _version_key(F.lit(lo))) & (
            _version_key(F.col("version")) <= _version_key(F.lit(hi))
        )
        rec = rec.withColumn("_version_supported", ok)
    return rec


def unsupported_version_violations(records: DataFrame, key_col: str) -> DataFrame:
    """UnsupportedVersionError (mds/versions.py ≈L60–100) as violation
    rows rather than an exception."""
    return records.where(~F.col("_version_supported")).select(
        F.lit("unsupported_version:version").alias("rule_id"),
        F.col(key_col).cast("string").alias("clip_id"),
        F.lit("version").alias("column_name"),
        F.concat(F.lit("version "), F.col("version"), F.lit(" outside supported range")).alias("message"),
        F.lit(0).alias("part_id"),
    )


def dump_payloads(
    records: DataFrame, out_path: str, record_type: str, version: str
) -> None:
    """Records -> payload-shaped JSON files (DataFile.dump_payloads
    analog): one payload object per output partition."""
    cols = [c for c in records.columns if not c.startswith("_") and c != "version"]
    (
        records.select(F.struct(*cols).alias("r"))
        .groupBy(F.spark_partition_id().alias("_p"))
        .agg(F.collect_list("r").alias("_records"))
        .select(
            F.lit(version).alias("version"),
            F.struct(F.col("_records").alias(record_type)).alias("data"),
        )
        .write.mode("overwrite")
        .json(out_path)
    )
