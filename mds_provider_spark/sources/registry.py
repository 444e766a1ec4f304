"""Provider registry — parity with mds/providers.py (Registry/Provider,
≈L10–120): a CSV of providers (provider_name, provider_id, urls, auth)
with normalized name/id lookup. Spark-native: spark.read.csv + a
broadcastable lookup; `find` matches the reference's name-or-UUID
semantics (lower/strip name, UUID coerce — mds/providers.py ≈L30–60)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mds_provider_spark.functions.encoding import is_uuid, normalize_name

REGISTRY_COLUMNS = ["provider_name", "provider_id", "url", "mds_api_url", "gbfs_api_url"]


def load_registry(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.option("header", "true").csv(path)
    return df.withColumn("_name_norm", normalize_name("provider_name")).withColumn(
        "_id_norm", F.lower(F.trim(F.col("provider_id")))
    )


def find(registry: DataFrame, name_or_id: str) -> DataFrame:
    """Rows matching a provider name (case/space-insensitive) or UUID."""
    needle = name_or_id.strip().lower()
    return registry.where(
        (F.col("_name_norm") == F.lit(needle))
        | (is_uuid(F.lit(needle)) & (F.col("_id_norm") == F.lit(needle)))
    ).drop("_name_norm", "_id_norm")
