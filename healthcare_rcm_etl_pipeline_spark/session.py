"""SparkSession factory tuned for the test harness (local[N]) while keeping
cluster-safe defaults (AQE on, sane shuffle partitioning, UTC, Arrow).

On a real cluster only ``master`` and memory sizing change; everything the
engine does is partitioning-aware and never collects large data to the driver.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "healthcare-rcm-etl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    driver_memory = driver_memory or os.environ.get("HRCM_DRIVER_MEM", "12g")
    # keep session scratch (spark-warehouse/, Derby's derby.log) out of the
    # CWD — a library must not side-effect-write into the caller's repo
    scratch = os.path.join(tempfile.gettempdir(), f"hrcm_spark_{os.getuid()}")
    os.makedirs(scratch, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.warehouse.dir", os.path.join(scratch, "warehouse"))
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={scratch} -Dderby.stream.error.file={scratch}/derby.log",
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark
