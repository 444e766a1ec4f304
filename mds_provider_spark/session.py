"""SparkSession factory with the engine's scale-oriented defaults.

Defaults are chosen for the 100 TB design point and are safe locally:
  - AQE on (runtime re-plan, skew-join splitting, partition coalescing)
    per BASELINE.json north_star ("AQE skew-join handling for hot codecs").
  - Arrow on for every pandas-UDF surface (PCM decode, t-digest partials).
  - UTC session timezone so timestamp semantics are deterministic and
    engine-independent (oracle comparisons vs DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    # Adaptive execution: runtime shuffle-partition coalescing + skew-join
    # splitting. At 100 TB hot codec values dominate groupBy/join keys;
    # AQE splits oversized post-shuffle partitions without a manual salt
    # on the join path (we still salt explicitly on the agg path, see
    # operators/uniqueness.py).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas UDF / mapInPandas / applyInPandas batch transfer.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    # Deterministic timestamp rendering for oracle cross-checks.
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: 128 MiB splits — at 100 TB this yields ~800k input
    # partitions, each fitting comfortably in executor memory.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Dynamic partition overwrite = the parquet stand-in for Iceberg
    # overwritePartitions(); gives idempotent per-partition re-commits
    # (plans/checkpoint.py).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # ParallelGC instead of the Java-17 default G1: measured on this
    # host, G1's concurrent machinery made warm validation runs 2-4x
    # slower and wildly variable at >=16 task threads (17-54s for a job
    # ParallelGC finishes in a stable ~6s). Throughput-oriented batch
    # jobs with short-lived humongous Arrow buffers are ParallelGC's
    # sweet spot; pause times are irrelevant here.
    "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:ParallelGCThreads=8",
    "spark.executor.extraJavaOptions": "-XX:+UseParallelGC -XX:ParallelGCThreads=8",
}


def get_spark(
    app_name: str = "mds-provider-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``parallelism`` sets ``local[N]``; default reads $SPARK_GRAFT_CPUS
    (driver contract) falling back to all cores. On a real cluster the
    master comes from spark-submit and this arg is ignored by Spark.
    """
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # local heuristic: 2x slots keeps all cores busy post-shuffle
        # without tiny-partition overhead at test scale.
        shuffle_partitions = max(2 * parallelism, 8)

    # Heap must scale with concurrent task slots: each Arrow-producing
    # task holds multi-MB batch buffers (binary audio columns), and an
    # undersized heap turns the Python-transfer stage into a GC storm
    # (measured: binary-column mapInPandas at local[32] was 3x slower on
    # 8g than on 32g). On a real cluster this is executor memory sizing.
    default_mem = f"{min(max(8, parallelism), 64)}g"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{parallelism}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", default_mem))
    )
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
