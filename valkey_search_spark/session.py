"""SparkSession factory tuned for this engine.

Local-mode defaults match the test/bench environment (local[32],
single JVM); on a real cluster the same settings are sane starting
points — AQE handles skew/coalesce at runtime, Arrow speeds up the
few Pandas-UDF operators (stemming, fuzzy match, multimodal decode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "valkey-search-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    # Python workers must be able to import this package regardless of the
    # driver's cwd (UDF closures reference it). Local mode: workers inherit
    # the driver env; cluster mode: executorEnv/--py-files does the same.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pythonpath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pythonpath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + pythonpath if pythonpath else ""))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # FAIR scheduling: concurrent queries (the reference serves 1000
        # clients) share task slots instead of queueing FIFO behind the
        # first job's full stage
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    return builder.getOrCreate()
