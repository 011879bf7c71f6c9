"""SparkSession factory with scale-appropriate defaults.

Local mode here is a stand-in for a multi-executor cluster; every knob is
chosen so the same code runs unchanged under ``spark-submit --py-files``
on a real cluster (AQE on, Arrow on, UTC timestamps for oracle parity).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

# Scan-partition ceiling for INDEX-BLOCK scans only. Index tables are
# term-range partitioned, so per-FILE work is skewed (the file holding
# 'the' decodes far more postings than its share of bytes suggests).
# Those files are written with 512 KB row groups (LEAF_ROW_GROUP_BYTES)
# precisely so scans can split them finely: 4 MB scan partitions turn
# one straggler file into ~dozens of balanced decode tasks. Applied via
# ``scoped_conf`` around the index-scan actions — NOT session-global:
# every other table (postings, corpus inputs, dedup/pipeline sources)
# is written with default ~128 MB row groups, and 4 MB splits there
# yield ~31 empty tasks per row group of pure scheduler overhead
# (measured: a 2× regression on build and pipeline phases).
INDEX_SCAN_SPLIT_BYTES = 4 * 1024 * 1024


@contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str):
    """Set a runtime SQL conf for the duration of a block, then restore.

    Spark resolves scan-partition geometry from the conf active when an
    ACTION plans, not when the DataFrame was defined (verified on 4.1),
    so wrapping just the materialization is sufficient — and returned
    lazy DataFrames planned later are unaffected."""
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def get_spark(
    master: str | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "antidb_spark",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``); ``shuffle_partitions`` defaults to the core count so
    local shuffles are neither over- nor under-parallelized.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        shuffle_partitions = os.cpu_count() or 8 if n == "*" else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 8-12g is the measured sweet spot here: 1g OOMs 32 concurrent
        # tasks, while a 48g heap is 2.6x SLOWER end-to-end (GC ergonomics)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "10g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Fully stop the active session so a new master can be used (bench)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # Clear the cached builder state so getOrCreate() honors a new master.
    SparkSession._instantiatedSession = None  # noqa: SLF001
    SparkSession._activeSession = None  # noqa: SLF001
