"""SparkSession construction for the engine.

Local-mode defaults are tuned for the test container (local[32],
single JVM); the same builder works unchanged on a real cluster where
``master`` comes from spark-submit. Scale-relevant settings:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- shuffle partitions sized to cores locally; on a 1000-executor
  cluster this should be ~2-3x total cores (set via env/submit conf)
- UTC session timezone so event-time window semantics are
  engine-independent (the reference pins windows to epoch alignment;
  see SURVEY.md section 2.4)
- Arrow enabled for the few Pandas-UDF code paths
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


_TMP_WAREHOUSE: str | None = None


def _tmp_warehouse() -> str:
    """One temp warehouse per PROCESS: getOrCreate ignores configs
    after the first session exists, so minting a fresh mkdtemp on
    every get_spark() call would leak one unused directory per call
    in long-lived processes (bench loops, test suites)."""
    global _TMP_WAREHOUSE
    if _TMP_WAREHOUSE is None:
        import atexit
        import shutil

        _TMP_WAREHOUSE = tempfile.mkdtemp(prefix="fuba-warehouse-")
        # best-effort cleanup at interpreter exit (ADVICE r5): the
        # default tmp warehouse would otherwise leak one directory of
        # managed-table data per process
        atexit.register(shutil.rmtree, _TMP_WAREHOUSE,
                        ignore_errors=True)
    return _TMP_WAREHOUSE


def get_spark(
    app: str = "flink-user-behavior-analysis-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession."""
    cpus = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = int(
        shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", str(max(cpus, 8)))
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # per-process warehouse: managed tables (stored BM25/LM
        # artifacts, bucketed-join tables) pair a catalog entry with a
        # directory. The catalog is in-memory per process, so a shared
        # on-disk warehouse leaves ORPHAN directories that make the
        # next process's saveAsTable fail with
        # LOCATION_ALREADY_EXISTS. A fresh tmp dir per process keeps
        # catalog and disk in lockstep; point SPARK_GRAFT_WAREHOUSE at
        # a persistent path (with a persistent metastore) on a real
        # cluster, where artifacts genuinely outlive the session.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE") or _tmp_warehouse(),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone to UTC (idempotent, runtime-settable).

    Every calendar-sensitive operator (daily blacklist reset, window
    alignment, date formatting) calls this so results match the DuckDB
    oracle's naive-UTC timestamps regardless of who built the session.
    """
    # NB: conf.get(key, fallback) validates the fallback in Spark 4 —
    # an empty-string fallback raises INVALID_CONF_VALUE. Use None.
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
